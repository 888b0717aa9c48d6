"""Structure-of-arrays (n-last) kernels for the per-correspondence math.

TPU tiles pad the last two dims of every array to (8, 128), so an
(N, 3, 3) tensor inflates ~113x in HBM and runs elementwise ops at 3/128
lane utilization.  The hot per-iteration math (Mahalanobis build, fused
(err, H, b) reduction) therefore operates on COLUMNS: points as (3, N),
symmetric 3x3 matrices as 6 unique coefficient rows (6, N) in the order
(m00, m01, m02, m11, m12, m22).  Every op below is a closed-form scalar
formula broadcast over N lanes — the TPU-native equivalent of the
reference's fused thrust::transform_reduce (compute_derivatives.cu:19-184)
and OpenMP accumulator loops (fast_gicp_impl.hpp:169-211).

Equivalence with the AoS ops (reduction.py, linalg3.py, se3.py) is pinned
by tests/test_soa.py.
"""

from __future__ import annotations

import jax.numpy as jnp

# Index aliases for the symmetric-6 layout.
S00, S01, S02, S11, S12, S22 = range(6)


def cols_from_points(points):
    """(..., N, 3) -> (..., 3, N)."""
    return jnp.swapaxes(points, -1, -2)


def sym_cols_from_covs(covs):
    """(..., N, 3, 3) symmetric -> (..., 6, N).

    (..., 6, N) column inputs pass through unchanged, so model boundaries
    (gicp_align / vgicp_align covariance arguments) accept either layout —
    cols-native estimators (knn_covariance_cols, rbf_covariance_cols) feed
    the objectives without an AoS round trip.
    """
    if covs.shape[-2:] != (3, 3) and covs.shape[-2] == 6:
        return covs
    return jnp.stack(
        [
            covs[..., 0, 0],
            covs[..., 0, 1],
            covs[..., 0, 2],
            covs[..., 1, 1],
            covs[..., 1, 2],
            covs[..., 2, 2],
        ],
        axis=-2,
    )


def covs_rows9(covs):
    """(..., N, 3, 3) AoS or (..., 6, N) sym columns -> (..., N, 9)
    row-major rows (the voxel-map / fused-kernel packing layout)."""
    if covs.shape[-2:] == (3, 3):
        return covs.reshape(covs.shape[:-2] + (9,))
    return sym_cols_to_rows9(covs)


def sym_cols_from_packed(rows):
    """Gathered voxel rows (..., N, 16) [mean3 cov9 count pad3] ->
    (mean (..., 3, N), cov (..., 6, N), count (..., N))."""
    mean = jnp.swapaxes(rows[..., 0:3], -1, -2)
    cov = jnp.stack(
        [
            rows[..., 3],
            rows[..., 4],
            rows[..., 5],
            rows[..., 7],
            rows[..., 8],
            rows[..., 11],
        ],
        axis=-2,
    )
    return mean, cov, rows[..., 12]


def sym_cols_from_raw(rows):
    """Raw accumulator rows (..., N, 16) [count, sum mu (3), sum cov (9)]
    (DenseRawGridMap layout) -> finalized (mean (..., 3, N),
    cov (..., 6, N), count (..., N)); empty cells (count 0) give zeros."""
    count = rows[..., 0]
    inv_n = jnp.where(count > 0, 1.0 / jnp.maximum(count, 1.0), 0.0)
    mean = jnp.swapaxes(rows[..., 1:4], -1, -2) * inv_n[..., None, :]
    cov = jnp.stack(
        [rows[..., 4], rows[..., 5], rows[..., 6],
         rows[..., 8], rows[..., 9], rows[..., 12]],
        axis=-2,
    ) * inv_n[..., None, :]
    return mean, cov, count


def transform_cols(T, P):
    """Rigid transform of (..., 3, N) columns by a 4x4 matrix."""
    R, t = T[:3, :3], T[:3, 3]
    x, y, z = P[..., 0, :], P[..., 1, :], P[..., 2, :]
    return jnp.stack(
        [
            R[0, 0] * x + R[0, 1] * y + R[0, 2] * z + t[0],
            R[1, 0] * x + R[1, 1] * y + R[1, 2] * z + t[1],
            R[2, 0] * x + R[2, 1] * y + R[2, 2] * z + t[2],
        ],
        axis=-2,
    )


def rotate_sym_cols(R, C):
    """R C R^T for symmetric-6 columns C (..., 6, N), R (3, 3)."""
    c00, c01, c02, c11, c12, c22 = (C[..., i, :] for i in range(6))
    # B = R C (3x3, rows of B as column vectors over N)
    b = []
    for i in range(3):
        r0, r1, r2 = R[i, 0], R[i, 1], R[i, 2]
        b.append(
            (
                r0 * c00 + r1 * c01 + r2 * c02,
                r0 * c01 + r1 * c11 + r2 * c12,
                r0 * c02 + r1 * c12 + r2 * c22,
            )
        )
    # out_ij = B_i . R_j  (upper triangle)
    def dot(bi, j):
        return bi[0] * R[j, 0] + bi[1] * R[j, 1] + bi[2] * R[j, 2]

    return jnp.stack(
        [dot(b[0], 0), dot(b[0], 1), dot(b[0], 2),
         dot(b[1], 1), dot(b[1], 2), dot(b[2], 2)],
        axis=-2,
    )


def inv_sym_cols(C, eps: float = 1e-18):
    """Adjugate inverse of symmetric-6 columns (..., 6, N).

    The determinant is clamped away from zero (like linalg3.inv3's eps):
    a singular column (possible with regularization='none' and collinear
    neighborhoods) would give inv_det=inf and adjugate 0, whose 0*inf=NaN
    survives every downstream `* valid` mask and poisons the whole
    (err, H, b) reduction.  Clamped, the column yields a huge-but-finite
    M that the validity/weight masking can still zero out.
    """
    c00, c01, c02, c11, c12, c22 = (C[..., i, :] for i in range(6))
    a00 = c11 * c22 - c12 * c12
    a01 = c02 * c12 - c01 * c22
    a02 = c01 * c12 - c02 * c11
    a11 = c00 * c22 - c02 * c02
    a12 = c01 * c02 - c00 * c12
    a22 = c00 * c11 - c01 * c01
    det = c00 * a00 + c01 * a01 + c02 * a02
    det = jnp.where(jnp.abs(det) < eps, jnp.where(det < 0, -eps, eps), det)
    inv_det = 1.0 / det
    return jnp.stack([a00, a01, a02, a11, a12, a22], axis=-2) * inv_det[..., None, :]


def sym_cols_to_rows9(C):
    """(..., 6, N) sym-6 columns -> (..., N, 9) row-major 3x3 rows."""
    full = jnp.stack(
        [C[..., 0, :], C[..., 1, :], C[..., 2, :],
         C[..., 1, :], C[..., 3, :], C[..., 4, :],
         C[..., 2, :], C[..., 4, :], C[..., 5, :]],
        axis=-2,
    )  # (..., 9, N)
    return jnp.swapaxes(full, -1, -2)


def eigvals_sym_cols(C):
    """Eigenvalues of sym-6 columns (..., 6, N) -> (small, mid, big) each
    (..., N).  Trigonometric closed form (linalg3.eigvalsh3 on columns)."""
    c00, c01, c02, c11, c12, c22 = (C[..., i, :] for i in range(6))
    q = (c00 + c11 + c22) / 3.0
    p1 = c01 * c01 + c02 * c02 + c12 * c12
    d0, d1, d2 = c00 - q, c11 - q, c22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    iso = p2 <= 1e-30
    p = jnp.sqrt(jnp.where(iso, 1.0, p2) / 6.0)
    inv_p = 1.0 / p
    b00, b11, b22 = d0 * inv_p, d1 * inv_p, d2 * inv_p
    b01, b02, b12 = c01 * inv_p, c02 * inv_p, c12 * inv_p
    det = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(det * 0.5, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_big = q + 2.0 * p * jnp.cos(phi)
    e_small = q + 2.0 * p * jnp.cos(phi + 2.0943951023931953)
    e_mid = 3.0 * q - e_big - e_small
    return (
        jnp.where(iso, q, e_small),
        jnp.where(iso, q, e_mid),
        jnp.where(iso, q, e_big),
    )


def plane_covs_cols(C):
    """PLANE regularization on sym-6 columns: (..., 6, N) -> (..., 6, N).

    cov_reg = I - (1 - 1e-3) v v^T with v the smallest eigenvector
    (the rank-1 identity used by covariance.regularize_covariances), fully
    in column layout — the AoS version's (N, 3, 3) intermediates each pad
    to (N, 8, 128) tiles on TPU (~113x memory inflation per op).

    Smallest eigenvector by Cayley-Hamilton: columns of
    (A - l_big I)(A - l_mid I) = A^2 - (l_big + l_mid) A + l_big l_mid I
    span the smallest eigenspace; take the largest column (linalg3.
    smallest_eigenvector3 on columns, same degenerate fallback to e_z).
    """
    c00, c01, c02, c11, c12, c22 = (C[..., i, :] for i in range(6))
    e_small, e_mid, e_big = eigvals_sym_cols(C)
    t = e_big + e_mid
    d = e_big * e_mid
    # G = A^2 - t A + d I (symmetric, shares eigenvectors with A)
    s00 = c00 * c00 + c01 * c01 + c02 * c02
    s01 = c00 * c01 + c01 * c11 + c02 * c12
    s02 = c00 * c02 + c01 * c12 + c02 * c22
    s11 = c01 * c01 + c11 * c11 + c12 * c12
    s12 = c01 * c02 + c11 * c12 + c12 * c22
    s22 = c02 * c02 + c12 * c12 + c22 * c22
    g00 = s00 - t * c00 + d
    g01 = s01 - t * c01
    g02 = s02 - t * c02
    g11 = s11 - t * c11 + d
    g12 = s12 - t * c12
    g22 = s22 - t * c22 + d
    n0 = g00 * g00 + g01 * g01 + g02 * g02
    n1 = g01 * g01 + g11 * g11 + g12 * g12
    n2 = g02 * g02 + g12 * g12 + g22 * g22
    use0 = (n0 >= n1) & (n0 >= n2)
    use1 = ~use0 & (n1 >= n2)
    v0 = jnp.where(use0, g00, jnp.where(use1, g01, g02))
    v1 = jnp.where(use0, g01, jnp.where(use1, g11, g12))
    v2 = jnp.where(use0, g02, jnp.where(use1, g12, g22))
    nrm_sq = v0 * v0 + v1 * v1 + v2 * v2
    nrm = jnp.sqrt(nrm_sq)
    scale = jnp.maximum(
        jnp.maximum(jnp.abs(e_small), jnp.maximum(jnp.abs(e_mid), jnp.abs(e_big))),
        1e-30,
    )
    ok = nrm > 1e-12 * scale * scale
    inv = jnp.where(ok, 1.0 / jnp.where(ok, nrm, 1.0), 0.0)
    # degenerate fallback: v = e_z
    v0 = jnp.where(ok, v0 * inv, 0.0)
    v1 = jnp.where(ok, v1 * inv, 0.0)
    v2 = jnp.where(ok, v2 * inv, 1.0)
    k = 1.0 - 1e-3
    return jnp.stack(
        [1.0 - k * v0 * v0, -k * v0 * v1, -k * v0 * v2,
         1.0 - k * v1 * v1, -k * v1 * v2, 1.0 - k * v2 * v2],
        axis=-2,
    )


def clamp_eigs_cols(C, eps):
    """MIN_EIG regularization on sym-6 columns: eigenvalues clamped to
    >= eps with eigenvectors preserved (covariance_regularization.cu
    covariance_regularization_mineig), closed form — no jnp.linalg.eigh,
    whose LAPACK-style iteration costs ~13 ms per 18k AoS covariances on
    the v5e where this runs in ~0.2 ms.

    A' = A + sum_i max(0, eps - e_i) P_i with P_i the spectral projectors.
    Stable grouping: with clamp deficits c_s >= c_m >= c_b (eigenvalues
    ascending e_s <= e_m <= e_b),

        A' = A + c_m I - (c_m - c_b) P_big + (c_s - c_m) P_small

    where each projector is a Cayley-Hamilton polynomial in A.  Every
    projector denominator that can degenerate (repeated eigenvalues) is
    multiplied by a coefficient that vanishes in exactly that limit
    (e_b ~ e_m  =>  c_m - c_b ~ 0, etc.), so the guarded division is
    benign.
    """
    c00, c01, c02, c11, c12, c22 = (C[..., i, :] for i in range(6))
    e_s, e_m, e_b = eigvals_sym_cols(C)
    c_s = jnp.maximum(eps - e_s, 0.0)
    c_m = jnp.maximum(eps - e_m, 0.0)
    c_b = jnp.maximum(eps - e_b, 0.0)
    # A^2 (symmetric)
    s00 = c00 * c00 + c01 * c01 + c02 * c02
    s01 = c00 * c01 + c01 * c11 + c02 * c12
    s02 = c00 * c02 + c01 * c12 + c02 * c22
    s11 = c01 * c01 + c11 * c11 + c12 * c12
    s12 = c01 * c02 + c11 * c12 + c12 * c22
    s22 = c02 * c02 + c12 * c12 + c22 * c22

    scale = jnp.maximum(jnp.maximum(jnp.abs(e_b), jnp.abs(e_s)), eps)
    tiny = 1e-12 * scale * scale

    def coeff(num, den):
        safe = den > tiny
        return jnp.where(safe, num / jnp.where(safe, den, 1.0), 0.0)

    # P_big ~ (A - e_s)(A - e_m) / ((e_b - e_s)(e_b - e_m))
    a_b = coeff(c_m - c_b, (e_b - e_s) * (e_b - e_m))
    # P_small ~ (A - e_m)(A - e_b) / ((e_s - e_m)(e_s - e_b))
    a_s = coeff(c_s - c_m, (e_s - e_m) * (e_s - e_b))

    def poly(t, d, a):
        # a * (A^2 - t A + d I), elementwise over columns
        return (
            a * (s00 - t * c00 + d),
            a * (s01 - t * c01),
            a * (s02 - t * c02),
            a * (s11 - t * c11 + d),
            a * (s12 - t * c12),
            a * (s22 - t * c22 + d),
        )

    pb = poly(e_s + e_m, e_s * e_m, -a_b)
    ps = poly(e_m + e_b, e_m * e_b, a_s)
    return jnp.stack(
        [
            c00 + c_m + pb[0] + ps[0],
            c01 + pb[1] + ps[1],
            c02 + pb[2] + ps[2],
            c11 + c_m + pb[3] + ps[3],
            c12 + pb[4] + ps[4],
            c22 + c_m + pb[5] + ps[5],
        ],
        axis=-2,
    )


def _mahalanobis_terms(p, q, M):
    """Shared e / Me columns.  p, q: (..., 3, N); M: (..., 6, N)."""
    e0 = q[..., 0, :] - p[..., 0, :]
    e1 = q[..., 1, :] - p[..., 1, :]
    e2 = q[..., 2, :] - p[..., 2, :]
    m00, m01, m02, m11, m12, m22 = (M[..., i, :] for i in range(6))
    me0 = m00 * e0 + m01 * e1 + m02 * e2
    me1 = m01 * e0 + m11 * e1 + m12 * e2
    me2 = m02 * e0 + m12 * e1 + m22 * e2
    return (e0, e1, e2), (me0, me1, me2)


def error_cols(p, q, M, w, valid):
    """Weighted Mahalanobis error: sum_n w e^T M e over valid columns.

    p, q: (..., 3, N); M: (..., 6, N); w, valid: (..., N).
    SoA equivalent of reduction.error_reduce.
    """
    (e0, e1, e2), (me0, me1, me2) = _mahalanobis_terms(p, q, M)
    wv = jnp.where(valid, w, 0.0)
    return jnp.sum(wv * (e0 * me0 + e1 * me1 + e2 * me2), axis=(-1,))


def linearize_cols(p, q, M, w, valid):
    """Fused weighted (err, H (6,6), b (6,)) over columns.

    Same math as reduction.linearize_reduce with J = [skew(p) | -I]:
    H = sum w J^T M J, b = sum w J^T M e, err = sum w e^T M e; reductions
    run as ONE (29, N) row-sum so XLA emits a single pass.
    """
    p0, p1, p2 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
    m00, m01, m02, m11, m12, m22 = (M[..., i, :] for i in range(6))
    (e0, e1, e2), (me0, me1, me2) = _mahalanobis_terms(p, q, M)

    # G = M skew(p)
    g00 = m01 * p2 - m02 * p1
    g10 = m11 * p2 - m12 * p1
    g20 = m12 * p2 - m22 * p1
    g01 = m02 * p0 - m00 * p2
    g11 = m12 * p0 - m01 * p2
    g21 = m22 * p0 - m02 * p2
    g02 = m00 * p1 - m01 * p0
    g12 = m01 * p1 - m11 * p0
    g22 = m02 * p1 - m12 * p0

    # H11 = skew(p)^T M skew(p) = -(skew(p) G), 6 unique entries
    h11_00 = p2 * g10 - p1 * g20
    h11_01 = p2 * g11 - p1 * g21
    h11_02 = p2 * g12 - p1 * g22
    h11_11 = p0 * g21 - p2 * g01
    h11_12 = p0 * g22 - p2 * g02
    h11_22 = p1 * g02 - p0 * g12

    # H12 = skew(p)^T M (-I) = skew(p) M ... with J = [A | -I]:
    # J^T M J = [[A^T M A, -A^T M], [-M A, M]], A^T = -A => -A^T M = A M
    h12_00 = p1 * m02 - p2 * m01
    h12_01 = p1 * m12 - p2 * m11
    h12_02 = p1 * m22 - p2 * m12
    h12_10 = p2 * m00 - p0 * m02
    h12_11 = p2 * m01 - p0 * m12
    h12_12 = p2 * m02 - p0 * m22
    h12_20 = p0 * m01 - p1 * m00
    h12_21 = p0 * m11 - p1 * m01
    h12_22 = p0 * m12 - p1 * m02

    # b = J^T M e = [A^T M e; -M e] = [-p x Me; -Me]
    b0 = p2 * me1 - p1 * me2
    b1 = p0 * me2 - p2 * me0
    b2 = p1 * me0 - p0 * me1
    err_n = e0 * me0 + e1 * me1 + e2 * me2

    rows = jnp.stack(
        [
            err_n,
            h11_00, h11_01, h11_02, h11_11, h11_12, h11_22,
            h12_00, h12_01, h12_02,
            h12_10, h12_11, h12_12,
            h12_20, h12_21, h12_22,
            m00, m01, m02, m11, m12, m22,
            b0, b1, b2, -me0, -me1, -me2,
        ],
        axis=-2,
    )
    wv = jnp.where(valid, w, 0.0)
    s = jnp.sum(rows * wv[..., None, :], axis=-1)  # (..., 28)

    err = s[..., 0]
    (h00, h01, h02, h11, h12, h22,
     a00, a01, a02, a10, a11, a12, a20, a21, a22,
     t00, t01, t02, t11, t12, t22,
     bb0, bb1, bb2, bb3, bb4, bb5) = (s[..., i] for i in range(1, 28))
    H = jnp.stack(
        [
            jnp.stack([h00, h01, h02, a00, a01, a02], axis=-1),
            jnp.stack([h01, h11, h12, a10, a11, a12], axis=-1),
            jnp.stack([h02, h12, h22, a20, a21, a22], axis=-1),
            jnp.stack([a00, a10, a20, t00, t01, t02], axis=-1),
            jnp.stack([a01, a11, a21, t01, t11, t12], axis=-1),
            jnp.stack([a02, a12, a22, t02, t12, t22], axis=-1),
        ],
        axis=-2,
    )
    b = jnp.stack([bb0, bb1, bb2, bb3, bb4, bb5], axis=-1)
    return err, H, b
