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
    """(..., N, 3, 3) symmetric -> (..., 6, N)."""
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
