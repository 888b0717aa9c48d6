"""Fused Pallas kernels for the per-iteration GICP/VGICP objective math.

The SoA XLA path (ops/soa.py) is algebraically minimal but still lowers to
~10 separate XLA kernels per linearize/error call; at 16k correspondences
each call is launch-bound (~0.2 ms of ~20 us launches, >10x the actual
VPU work).  These kernels fuse everything after the (XLA-side) voxel
lookup + row gather into ONE kernel each:

  * `linearize_pallas` — rigid transform of the source columns, covariance
    rotation R C_A R^T, Mahalanobis inverse, the (err, H, b) 28-row
    reduction, AND the aux pack (M, w, mu, valid) the LM inner trials
    reuse — one pass over the correspondences.  The pose enters as a
    (4, 4) operand and is applied IN-KERNEL, so the only per-iteration
    XLA-side work left is the voxel-row gather itself: the untransformed
    source columns and source covariance columns are loop-invariant
    across the whole LM solve (measured ~90 us/registration of XLA
    transform/rotate/flatten fusions deleted at 18k points).
  * `error_pallas` — trial-pose Mahalanobis error against the frozen aux.

Layouts (lane dim = correspondences, like ops/pallas_kernels.py):
  * source columns / source sym-6 covariance columns arrive as (8, N)
    stacks (rows 0..2 resp. 0..5 used, rest sublane padding).
  * gathered voxel rows arrive TRANSPOSED (16, N): [mu(3), cov9, count, ...]
  * aux pack (16, N): [M(6), w, valid, mu(3), pad...] — written by
    linearize, read by error.
  * scalar outputs accumulate into a (8, 32) block revisited across the
    sequential grid; row 0 holds [err, H(21 sym), b(6)].

Equivalence with soa.linearize_cols / soa.error_cols is pinned by
tests/test_pallas_linearize.py (run on TPU; CPU tests take the SoA path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NT = 2048  # lanes per grid step

# aux pack rows
_AUX_ROWS = 16


def supported(n: int) -> bool:
    import os

    if os.environ.get("FAST_GICP_TPU_NO_FUSED"):  # escape hatch
        return False
    return jax.default_backend() == "tpu" and n % _NT == 0


def _sym_inv(c00, c01, c02, c11, c12, c22):
    # det clamped away from zero like soa.inv_sym_cols: a singular column
    # otherwise yields 0 * inf = NaN that no downstream mask can remove.
    a00 = c11 * c22 - c12 * c12
    a01 = c02 * c12 - c01 * c22
    a02 = c01 * c12 - c02 * c11
    a11 = c00 * c22 - c02 * c02
    a12 = c01 * c02 - c00 * c12
    a22 = c00 * c11 - c01 * c01
    det = c00 * a00 + c01 * a01 + c02 * a02
    eps = 1e-18
    det = jnp.where(jnp.abs(det) < eps, jnp.where(det < 0, -eps, eps), det)
    inv_det = 1.0 / det
    return (a00 * inv_det, a01 * inv_det, a02 * inv_det,
            a11 * inv_det, a12 * inv_det, a22 * inv_det)


def _mahalanobis_core(p0, p1, p2, q0, q1, q2, m):
    m00, m01, m02, m11, m12, m22 = m
    e0, e1, e2 = q0 - p0, q1 - p1, q2 - p2
    me0 = m00 * e0 + m01 * e1 + m02 * e2
    me1 = m01 * e0 + m11 * e1 + m12 * e2
    me2 = m02 * e0 + m12 * e1 + m22 * e2
    err = e0 * me0 + e1 * me1 + e2 * me2
    return (me0, me1, me2), err


def _transform_cols(x, s0, s1, s2):
    """Apply the (4, 4) pose tile to source columns, in-kernel."""
    p0 = x[0, 0] * s0 + x[0, 1] * s1 + x[0, 2] * s2 + x[0, 3]
    p1 = x[1, 0] * s0 + x[1, 1] * s1 + x[1, 2] * s2 + x[1, 3]
    p2 = x[2, 0] * s0 + x[2, 1] * s1 + x[2, 2] * s2 + x[2, 3]
    return p0, p1, p2


def _rotate_sym_cols(x, c00, c01, c02, c11, c12, c22):
    """R C R^T on sym-6 columns with R = x[:3, :3] scalars, in-kernel
    (the kernel-side twin of soa.rotate_sym_cols)."""
    b = []
    for i in range(3):
        ri0, ri1, ri2 = x[i, 0], x[i, 1], x[i, 2]
        b.append((
            ri0 * c00 + ri1 * c01 + ri2 * c02,
            ri0 * c01 + ri1 * c11 + ri2 * c12,
            ri0 * c02 + ri1 * c12 + ri2 * c22,
        ))

    def _rc(i, j):
        return b[i][0] * x[j, 0] + b[i][1] * x[j, 1] + b[i][2] * x[j, 2]

    return (_rc(0, 0), _rc(0, 1), _rc(0, 2), _rc(1, 1), _rc(1, 2), _rc(2, 2))


def _lin_body(ps_ref, ca_ref, x_ref, out_ref, aux_ref, i,
              q0, q1, q2, cb, count, valid):
    """Shared linearize core: in-kernel transform + covariance rotation,
    Mahalanobis inverse, (err, H, b) reduction, aux pack.  `cb` is the
    target sym-6 covariance, `count`/`valid` the weight/validity columns;
    callers differ only in how they unpack the gathered voxel rows."""
    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = x_ref
    s0, s1, s2 = ps_ref[0], ps_ref[1], ps_ref[2]
    p0, p1, p2 = _transform_cols(x, s0, s1, s2)
    cr = _rotate_sym_cols(
        x, ca_ref[0], ca_ref[1], ca_ref[2], ca_ref[3], ca_ref[4], ca_ref[5]
    )

    s = tuple(cb[k] + cr[k] for k in range(6))
    m = tuple(mk * valid for mk in _sym_inv(*s))
    m00, m01, m02, m11, m12, m22 = m
    w = jnp.sqrt(jnp.maximum(count, 0.0)) * valid

    (me0, me1, me2), err_n = _mahalanobis_core(p0, p1, p2, q0, q1, q2, m)

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
    # H11 = -(skew(p) G), 6 unique
    h = [
        err_n,
        p2 * g10 - p1 * g20, p2 * g11 - p1 * g21, p2 * g12 - p1 * g22,
        p0 * g21 - p2 * g01, p0 * g22 - p2 * g02, p1 * g02 - p0 * g12,
        # H12 = skew(p) M (9)
        p1 * m02 - p2 * m01, p1 * m12 - p2 * m11, p1 * m22 - p2 * m12,
        p2 * m00 - p0 * m02, p2 * m01 - p0 * m12, p2 * m02 - p0 * m22,
        p0 * m01 - p1 * m00, p0 * m11 - p1 * m01, p0 * m12 - p1 * m02,
        # H22 = M (6)
        m00, m01, m02, m11, m12, m22,
        # b = [-p x Me; -Me]
        p2 * me1 - p1 * me2, p0 * me2 - p2 * me0, p1 * me0 - p0 * me1,
        -me0, -me1, -me2,
    ]
    acc = jnp.stack([jnp.sum(w * hk) for hk in h])  # (28,)
    acc2d = jnp.concatenate([acc, jnp.zeros(4, acc.dtype)]).reshape(1, 32)
    out_ref[0:1, :] += acc2d  # 2-D store (Mosaic rejects scalar/1-D stores)

    aux_ref[0] = m00
    aux_ref[1] = m01
    aux_ref[2] = m02
    aux_ref[3] = m11
    aux_ref[4] = m12
    aux_ref[5] = m22
    aux_ref[6] = w
    aux_ref[7] = q0
    aux_ref[8] = q1
    aux_ref[9] = q2
    aux_ref[10] = jnp.zeros_like(p0)
    aux_ref[11] = jnp.zeros_like(p0)
    aux_ref[12] = jnp.zeros_like(p0)
    aux_ref[13] = jnp.zeros_like(p0)
    aux_ref[14] = jnp.zeros_like(p0)
    aux_ref[15] = jnp.zeros_like(p0)


def _linearize_kernel(ps_ref, ca_ref, x_ref, rows_ref, valid_ref,
                      out_ref, aux_ref):
    """Packed-rows layout: [mu (3), cov9, count, pad] (finalized stats)."""
    i = pl.program_id(0)
    q0, q1, q2 = rows_ref[0], rows_ref[1], rows_ref[2]
    cb = (rows_ref[3], rows_ref[4], rows_ref[5],
          rows_ref[7], rows_ref[8], rows_ref[11])
    count = rows_ref[12]
    valid = valid_ref[0]
    _lin_body(ps_ref, ca_ref, x_ref, out_ref, aux_ref, i,
              q0, q1, q2, cb, count, valid)


def _linearize_raw_kernel(ps_ref, ca_ref, x_ref, rows_ref, valid_ref,
                          out_ref, aux_ref):
    """Raw-sums layout from DenseRawGridMap: [count, sum mu (3), sum cov
    (9 row-major), pad] — the divide-by-count finalization runs here, so
    the XLA side does ONE row gather and nothing else."""
    i = pl.program_id(0)
    count = rows_ref[0]
    alive = (count > 0.0).astype(count.dtype)
    inv_n = alive / jnp.maximum(count, 1.0)
    q0 = rows_ref[1] * inv_n
    q1 = rows_ref[2] * inv_n
    q2 = rows_ref[3] * inv_n
    cb = (rows_ref[4] * inv_n, rows_ref[5] * inv_n, rows_ref[6] * inv_n,
          rows_ref[8] * inv_n, rows_ref[9] * inv_n, rows_ref[12] * inv_n)
    valid = valid_ref[0] * alive
    _lin_body(ps_ref, ca_ref, x_ref, out_ref, aux_ref, i,
              q0, q1, q2, cb, count, valid)


@partial(jax.jit, static_argnames=("interpret",))
def linearize_pallas(p_src, ca, x, rows_t, valid_f, interpret: bool = False):
    """Fused linearize.

    Args:
      p_src: (8, N) f32 — UNTRANSFORMED source columns (rows 0..2 used);
        loop-invariant across the whole LM solve.
      ca: (8, N) f32 — UNrotated source sym-6 covariance columns
        (rows 0..5 used); loop-invariant.
      x: (4, 4) — the linearization-point pose, applied in-kernel (both
        the rigid transform of p_src and the R C_A R^T rotation).
      rows_t: (16, N) f32 — gathered voxel rows, transposed packed layout.
      valid_f: (8, N) f32 — row 0 is the 0/1 correspondence validity.

    Returns (err (), H (6, 6), b (6,), aux (16, N)).
    """
    return _linearize_call(_linearize_kernel, p_src, ca, x, rows_t, valid_f,
                           interpret)


@partial(jax.jit, static_argnames=("interpret",))
def linearize_raw_pallas(p_src, ca, x, rows_t, valid_f,
                         interpret: bool = False):
    """Fused linearize against RAW accumulator rows (DenseRawGridMap
    layout [count, sum mu, sum cov9]); finalization happens in-kernel."""
    return _linearize_call(_linearize_raw_kernel, p_src, ca, x, rows_t,
                           valid_f, interpret)


def _linearize_call(kernel, p_src, ca, x, rows_t, valid_f, interpret):
    n = p_src.shape[1]
    if n % _NT:
        raise ValueError(f"n={n} not a multiple of {_NT}")
    x_tile = jnp.zeros((8, 128), p_src.dtype).at[:4, :4].set(x)
    grid = (n // _NT,)
    out, aux = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, _NT), lambda i: (0, i)),
            pl.BlockSpec((8, _NT), lambda i: (0, i)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
            pl.BlockSpec((16, _NT), lambda i: (0, i)),
            pl.BlockSpec((8, _NT), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((8, 32), lambda i: (0, 0)),
            pl.BlockSpec((_AUX_ROWS, _NT), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, 32), jnp.float32),
            jax.ShapeDtypeStruct((_AUX_ROWS, n), jnp.float32),
        ],
        interpret=interpret,
    )(p_src, ca, x_tile, rows_t, valid_f)
    return _unpack_out(out) + (aux,)


def _ndt_lin_core(ps_ref, x_ref, out_ref, aux_ref, i,
                  q0, q1, q2, m, valid):
    """Shared NDT linearize tail: Cauchy weight from the CURRENT error
    (ndt_compute_derivatives.cu:15-18,:78,:150 — w tracks the evaluation
    pose while M stays frozen), then the same (err, H, b) 28-row
    reduction as the GICP kernel."""
    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = x_ref
    c_sq = x[4, 0]  # voxel resolution^2, stashed in the pose tile
    s0, s1, s2 = ps_ref[0], ps_ref[1], ps_ref[2]
    p0, p1, p2 = _transform_cols(x, s0, s1, s2)
    m00, m01, m02, m11, m12, m22 = m

    e0, e1, e2 = q0 - p0, q1 - p1, q2 - p2
    w = c_sq / (c_sq + e0 * e0 + e1 * e1 + e2 * e2) * valid

    (me0, me1, me2), err_n = _mahalanobis_core(p0, p1, p2, q0, q1, q2, m)

    g00 = m01 * p2 - m02 * p1
    g10 = m11 * p2 - m12 * p1
    g20 = m12 * p2 - m22 * p1
    g01 = m02 * p0 - m00 * p2
    g11 = m12 * p0 - m01 * p2
    g21 = m22 * p0 - m02 * p2
    g02 = m00 * p1 - m01 * p0
    g12 = m01 * p1 - m11 * p0
    g22 = m02 * p1 - m12 * p0
    h = [
        err_n,
        p2 * g10 - p1 * g20, p2 * g11 - p1 * g21, p2 * g12 - p1 * g22,
        p0 * g21 - p2 * g01, p0 * g22 - p2 * g02, p1 * g02 - p0 * g12,
        p1 * m02 - p2 * m01, p1 * m12 - p2 * m11, p1 * m22 - p2 * m12,
        p2 * m00 - p0 * m02, p2 * m01 - p0 * m12, p2 * m02 - p0 * m22,
        p0 * m01 - p1 * m00, p0 * m11 - p1 * m01, p0 * m12 - p1 * m02,
        m00, m01, m02, m11, m12, m22,
        p2 * me1 - p1 * me2, p0 * me2 - p2 * me0, p1 * me0 - p0 * me1,
        -me0, -me1, -me2,
    ]
    acc = jnp.stack([jnp.sum(w * hk) for hk in h])  # (28,)
    acc2d = jnp.concatenate([acc, jnp.zeros(4, acc.dtype)]).reshape(1, 32)
    out_ref[0:1, :] += acc2d

    aux_ref[0] = m00
    aux_ref[1] = m01
    aux_ref[2] = m02
    aux_ref[3] = m11
    aux_ref[4] = m12
    aux_ref[5] = m22
    aux_ref[6] = valid
    aux_ref[7] = q0
    aux_ref[8] = q1
    aux_ref[9] = q2
    z = jnp.zeros_like(p0)
    for k in range(10, 16):
        aux_ref[k] = z


def _ndt_d2d_lin_kernel(ps_ref, ca_ref, x_ref, pack_ref, out_ref, aux_ref):
    """D2D: pack rows [mu (3), cov_B sym-6 (6), valid (9), pad];
    M = (cov_B + R C_A R^T)^-1 computed in-kernel at the linearization
    pose (compute_derivatives-style R_eval freeze)."""
    i = pl.program_id(0)
    q0, q1, q2 = pack_ref[0], pack_ref[1], pack_ref[2]
    cb = tuple(pack_ref[3 + k] for k in range(6))
    valid = pack_ref[9]
    cr = _rotate_sym_cols(
        x_ref, ca_ref[0], ca_ref[1], ca_ref[2], ca_ref[3], ca_ref[4],
        ca_ref[5],
    )
    s = tuple(cb[k] + cr[k] for k in range(6))
    m = tuple(mk * valid for mk in _sym_inv(*s))
    _ndt_lin_core(ps_ref, x_ref, out_ref, aux_ref, i, q0, q1, q2, m, valid)


def _ndt_p2d_lin_kernel(ps_ref, ca_ref, x_ref, pack_ref, out_ref, aux_ref):
    """P2D: pack rows [mu (3), M = cov_B^-1 sym-6 (6), valid (9)] — the
    Mahalanobis is pose-independent and arrives pre-inverted from the
    freeze (ca_ref is an unused placeholder to share the call shape)."""
    i = pl.program_id(0)
    del ca_ref
    q0, q1, q2 = pack_ref[0], pack_ref[1], pack_ref[2]
    valid = pack_ref[9]
    m = tuple(pack_ref[3 + k] * valid for k in range(6))
    _ndt_lin_core(ps_ref, x_ref, out_ref, aux_ref, i, q0, q1, q2, m, valid)


def _acos_lane(x):
    """arccos for Pallas TPU (Mosaic lowers cos/sqrt but not acos):
    Abramowitz & Stegun 4.4.46 polynomial, |err| <= 2e-8 rad — full f32
    accuracy for the eigenvalue trisection below."""
    ax = jnp.abs(x)
    p = jnp.sqrt(jnp.maximum(1.0 - ax, 0.0)) * (
        1.5707963050 + ax * (
            -0.2145988016 + ax * (
                0.0889789874 + ax * (
                    -0.0501743046 + ax * (
                        0.0308918810 + ax * (
                            -0.0170881256 + ax * (
                                0.0066700901 + ax * -0.0012624911
                            )
                        )
                    )
                )
            )
        )
    )
    return jnp.where(x >= 0, p, 3.14159265358979 - p)


def _eigvals_sym_lane(c00, c01, c02, c11, c12, c22):
    """Closed-form sym-3x3 eigenvalues on lane tuples (the in-kernel twin
    of soa.eigvals_sym_cols — identical math, identical guards; arccos
    via `_acos_lane`)."""
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
    phi = _acos_lane(r) / 3.0
    e_big = q + 2.0 * p * jnp.cos(phi)
    e_small = q + 2.0 * p * jnp.cos(phi + 2.0943951023931953)
    e_mid = 3.0 * q - e_big - e_small
    return (
        jnp.where(iso, q, e_small),
        jnp.where(iso, q, e_mid),
        jnp.where(iso, q, e_big),
    )


def _clamp_eigs_lane(c6, eps):
    """MIN_EIG clamp on lane tuples (in-kernel twin of
    soa.clamp_eigs_cols: guarded Cayley-Hamilton projectors,
    covariance_regularization.cu covariance_regularization_mineig)."""
    c00, c01, c02, c11, c12, c22 = c6
    e_s, e_m, e_b = _eigvals_sym_lane(*c6)
    c_s = jnp.maximum(eps - e_s, 0.0)
    c_m = jnp.maximum(eps - e_m, 0.0)
    c_b = jnp.maximum(eps - e_b, 0.0)
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

    a_b = coeff(c_m - c_b, (e_b - e_s) * (e_b - e_m))
    a_s = coeff(c_s - c_m, (e_s - e_m) * (e_s - e_b))

    def poly(t, d, a):
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
    return (
        c00 + c_m + pb[0] + ps[0],
        c01 + pb[1] + ps[1],
        c02 + pb[2] + ps[2],
        c11 + c_m + pb[3] + ps[3],
        c12 + pb[4] + ps[4],
        c22 + c_m + pb[5] + ps[5],
    )


_NDT_MIN_EIG = 1e-3  # ndt_cuda.cu:120-140 MIN_EIG regularization




def _ndt_raw_finalize(pack_ref):
    """Raw-pack finalize, in-kernel: pack rows [voxel corner o (3), count,
    sum d (3), sum dd sym-6 (6), valid] -> (mu, clamped sym-6 cov, valid).
    Moments are corner-relative (RawNdtGrid), so E[dd] - dmu dmu^T never
    cancels; the MIN_EIG clamp runs here because the kernel is memory-
    bound and the VPU lanes are otherwise idle (vs ~0.07 ms per build-side
    clamp pass at 16k voxels)."""
    o0, o1, o2 = pack_ref[0], pack_ref[1], pack_ref[2]
    cnt = pack_ref[3]
    valid = pack_ref[13]
    alive = (cnt > 0.0).astype(cnt.dtype)
    inv_n = alive / jnp.maximum(cnt, 1.0)
    d0 = pack_ref[4] * inv_n
    d1 = pack_ref[5] * inv_n
    d2 = pack_ref[6] * inv_n
    q0, q1, q2 = o0 + d0, o1 + d1, o2 + d2
    c6 = (
        pack_ref[7] * inv_n - d0 * d0,
        pack_ref[8] * inv_n - d0 * d1,
        pack_ref[9] * inv_n - d0 * d2,
        pack_ref[10] * inv_n - d1 * d1,
        pack_ref[11] * inv_n - d1 * d2,
        pack_ref[12] * inv_n - d2 * d2,
    )
    c6c = _clamp_eigs_lane(c6, _NDT_MIN_EIG)
    return q0, q1, q2, c6c, valid * alive


def _ndt_d2d_raw_lin_kernel(ps_ref, ca_ref, x_ref, pack_ref, out_ref,
                            aux_ref):
    """D2D against RAW target rows: finalize + MIN_EIG clamp in-kernel,
    then M = (cov_B + R C_A R^T)^-1 at the linearization pose."""
    i = pl.program_id(0)
    q0, q1, q2, cb, valid = _ndt_raw_finalize(pack_ref)
    cr = _rotate_sym_cols(
        x_ref, ca_ref[0], ca_ref[1], ca_ref[2], ca_ref[3], ca_ref[4],
        ca_ref[5],
    )
    s = tuple(cb[k] + cr[k] for k in range(6))
    m = tuple(mk * valid for mk in _sym_inv(*s))
    _ndt_lin_core(ps_ref, x_ref, out_ref, aux_ref, i, q0, q1, q2, m, valid)


def _ndt_p2d_raw_lin_kernel(ps_ref, ca_ref, x_ref, pack_ref, out_ref,
                            aux_ref):
    """P2D against RAW target rows: finalize + clamp + invert in-kernel."""
    i = pl.program_id(0)
    del ca_ref
    q0, q1, q2, cb, valid = _ndt_raw_finalize(pack_ref)
    m = tuple(mk * valid for mk in _sym_inv(*cb))
    _ndt_lin_core(ps_ref, x_ref, out_ref, aux_ref, i, q0, q1, q2, m, valid)


@partial(jax.jit, static_argnames=("mode", "interpret"))
def ndt_linearize_pallas(p_src, ca, x, pack, resolution, mode: str,
                         interpret: bool = False):
    """Fused NDT linearize over flattened (offset x voxel) lanes.

    p_src / ca: (8, L) untransformed source columns and sym-6 source
    covariance columns, tiled across the offset axis (loop-invariant; ca
    is ignored for mode='p2d'). pack: (16, L) frozen voxel rows
    [mu(3), cov_B or M (6), valid]. Returns (err, H, b, aux)."""
    L = p_src.shape[1]
    if L % _NT:
        raise ValueError(f"L={L} not a multiple of {_NT}")
    kernel = {
        "d2d": _ndt_d2d_lin_kernel,
        "p2d": _ndt_p2d_lin_kernel,
        "d2d_raw": _ndt_d2d_raw_lin_kernel,
        "p2d_raw": _ndt_p2d_raw_lin_kernel,
    }[mode]
    x_tile = (
        jnp.zeros((8, 128), p_src.dtype)
        .at[:4, :4].set(x)
        .at[4, 0].set(jnp.asarray(resolution, p_src.dtype) ** 2)
    )
    out, aux = pl.pallas_call(
        kernel,
        grid=(L // _NT,),
        in_specs=[
            pl.BlockSpec((8, _NT), lambda i: (0, i)),
            pl.BlockSpec((8, _NT), lambda i: (0, i)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
            pl.BlockSpec((16, _NT), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((8, 32), lambda i: (0, 0)),
            pl.BlockSpec((_AUX_ROWS, _NT), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((8, 32), jnp.float32),
            jax.ShapeDtypeStruct((_AUX_ROWS, L), jnp.float32),
        ],
        interpret=interpret,
    )(p_src, ca, x_tile, pack)
    return _unpack_out(out) + (aux,)


def _unpack_out(out):
    s = out[0]
    err = s[0]
    (h00, h01, h02, h11, h12, h22,
     a00, a01, a02, a10, a11, a12, a20, a21, a22,
     t00, t01, t02, t11, t12, t22) = (s[k] for k in range(1, 22))
    b = s[22:28]
    H = jnp.stack([
        jnp.stack([h00, h01, h02, a00, a01, a02]),
        jnp.stack([h01, h11, h12, a10, a11, a12]),
        jnp.stack([h02, h12, h22, a20, a21, a22]),
        jnp.stack([a00, a10, a20, t00, t01, t02]),
        jnp.stack([a01, a11, a21, t01, t11, t12]),
        jnp.stack([a02, a12, a22, t02, t12, t22]),
    ])
    return err, H, b


def _ndt_error_kernel(p_ref, x_ref, aux_ref, out_ref):
    """Trial-pose NDT error: frozen M from aux, Cauchy weight recomputed
    from the TRIAL error (the reference's fused kernels evaluate w inline
    per call, ndt_compute_derivatives.cu:106-135)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    c_sq = x_ref[4, 0]
    s0, s1, s2 = p_ref[0], p_ref[1], p_ref[2]
    p0, p1, p2 = _transform_cols(x_ref, s0, s1, s2)
    m = tuple(aux_ref[k] for k in range(6))
    valid = aux_ref[6]
    q0, q1, q2 = aux_ref[7], aux_ref[8], aux_ref[9]
    e0, e1, e2 = q0 - p0, q1 - p1, q2 - p2
    w = c_sq / (c_sq + e0 * e0 + e1 * e1 + e2 * e2) * valid
    _, err_n = _mahalanobis_core(p0, p1, p2, q0, q1, q2, m)
    s = jnp.sum(w * err_n)
    lane0 = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 32), 1) == 0
    ).astype(s.dtype)
    out_ref[0:1, :] += s * lane0


@partial(jax.jit, static_argnames=("interpret",))
def ndt_error_pallas(p_src, aux, x, resolution, interpret: bool = False):
    """Fused NDT trial error against the frozen aux pack (one launch per
    LM inner trial)."""
    L = p_src.shape[1]
    if L % _NT:
        raise ValueError(f"L={L} not a multiple of {_NT}")
    x_tile = (
        jnp.zeros((8, 128), p_src.dtype)
        .at[:4, :4].set(x)
        .at[4, 0].set(jnp.asarray(resolution, p_src.dtype) ** 2)
    )
    out = pl.pallas_call(
        _ndt_error_kernel,
        grid=(L // _NT,),
        in_specs=[
            pl.BlockSpec((8, _NT), lambda i: (0, i)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
            pl.BlockSpec((_AUX_ROWS, _NT), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((8, 32), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 32), jnp.float32),
        interpret=interpret,
    )(p_src, x_tile, aux)
    return out[0, 0]


def _error_kernel(p_ref, x_ref, aux_ref, out_ref):
    """Trial-pose error with the rigid transform fused IN-KERNEL: p_ref
    carries the UNtransformed source columns and x_ref an (8, 128) tile
    whose top-left 4x4 is the trial pose — so each LM inner trial is ONE
    kernel launch (the XLA-side transform fusion + flatten concat per
    trial cost ~15 us each at 22k points)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    s0, s1, s2 = p_ref[0], p_ref[1], p_ref[2]
    p0, p1, p2 = _transform_cols(x_ref, s0, s1, s2)
    m = tuple(aux_ref[k] for k in range(6))
    w = aux_ref[6]
    q0, q1, q2 = aux_ref[7], aux_ref[8], aux_ref[9]
    _, err_n = _mahalanobis_core(p0, p1, p2, q0, q1, q2, m)
    s = jnp.sum(w * err_n)
    lane0 = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 32), 1) == 0
    ).astype(s.dtype)
    out_ref[0:1, :] += s * lane0  # 2-D store (no scalar stores in Mosaic)


@partial(jax.jit, static_argnames=("interpret",))
def error_pallas(p_src, aux, x, interpret: bool = False):
    """Fused trial-pose error against the frozen aux pack.

    p_src: (8, N) UNtransformed source columns; x: (4, 4) trial pose —
    the rigid transform runs inside the kernel (one launch per trial)."""
    n = p_src.shape[1]
    if n % _NT:
        raise ValueError(f"n={n} not a multiple of {_NT}")
    x_tile = jnp.zeros((8, 128), p_src.dtype).at[:4, :4].set(x)
    out = pl.pallas_call(
        _error_kernel,
        grid=(n // _NT,),
        in_specs=[
            pl.BlockSpec((8, _NT), lambda i: (0, i)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
            pl.BlockSpec((_AUX_ROWS, _NT), lambda i: (0, i)),
        ],
        out_specs=pl.BlockSpec((8, 32), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 32), jnp.float32),
        interpret=interpret,
    )(p_src, x_tile, aux)
    return out[0, 0]
