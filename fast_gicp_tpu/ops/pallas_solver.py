"""Fused LM trial-step Pallas kernel.

Each LM inner trial in `solver.lsq_solve` does: solve (H + lambda I) d =
-b (unrolled 6x6 Cholesky + one iterative-refinement step), delta =
se3_exp(d), xi = delta @ x, and the rho denominator d . (lambda d - b).
As XLA graph this is ~50-60 scalar-sized fusions — at 2-5 us launch
overhead each, the launch tax dominates every LM iteration of every
objective (device trace on NDT D2D: ~1 ms/align inside the while loops
with near-zero FLOPs).  This kernel runs the whole trial step as ONE
launch on SMEM scalars.

Formulas replicate solver._solve_refined (linalg3.cholesky_solve) and
se3.se3_exp exactly (same Taylor switch at theta^2 < 1e-10, same
quaternion construction); equivalence is pinned by
tests/test_solver.py::test_lm_trial_pallas_matches_xla in interpret mode.

Output layout (one (8, 128) f32 tile):
  rows 0..3, cols 0..3   xi = se3_exp(d) @ x
  rows 0..3, cols 4..7   delta = se3_exp(d)      (convergence test input)
  row 4, col 0           denom = d . (lambda d - b)
  row 5, cols 0..5       d
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SMALL_ANGLE_SQ = 1e-10  # se3._SMALL_ANGLE_SQ


def supported() -> bool:
    if os.environ.get("FAST_GICP_TPU_NO_FUSED"):  # escape hatch
        return False
    return jax.default_backend() == "tpu"


def _chol_solve6(a, rhs):
    """Unrolled 6x6 LL^T solve on python lists of traced scalars — the
    scalar twin of linalg3.cholesky_solve (same clamp guard)."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = a[j][j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        diag = jnp.sqrt(jnp.maximum(s, 1e-30))
        L[j][j] = diag
        inv_diag = 1.0 / diag
        for i in range(j + 1, n):
            s = a[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_diag
    y = [None] * n
    for i in range(n):
        s = rhs[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x


def _se3_exp_scalars(w0, w1, w2, p0, p1, p2):
    """se3.se3_exp on six traced scalars -> (R 3x3 list, t 3 list)."""
    theta_sq = w0 * w0 + w1 * w1 + w2 * w2
    small = theta_sq < _SMALL_ANGLE_SQ
    ts_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(ts_safe)
    theta_quad = theta_sq * theta_sq

    imag = jnp.where(
        small,
        0.5 - theta_sq / 48.0 + theta_quad / 3840.0,
        jnp.sin(0.5 * theta) / theta,
    )
    real = jnp.where(
        small,
        1.0 - theta_sq / 8.0 + theta_quad / 384.0,
        jnp.cos(0.5 * theta),
    )
    qw, qx, qy, qz = real, imag * w0, imag * w1, imag * w2
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    R = [
        [1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)],
        [2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)],
        [2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)],
    ]

    # V = I + a W + b W^2 (exact) or R (small angle), W = skew(omega)
    av = (1.0 - jnp.cos(theta)) / ts_safe
    bv = (theta - jnp.sin(theta)) / (ts_safe * theta)
    W = [[0.0, -w2, w1], [w2, 0.0, -w0], [-w1, w0, 0.0]]
    W2 = [
        [sum(W[i][k] * W[k][j] for k in range(3)) for j in range(3)]
        for i in range(3)
    ]
    V = [
        [
            jnp.where(
                small,
                R[i][j],
                (1.0 if i == j else 0.0) + av * W[i][j] + bv * W2[i][j],
            )
            for j in range(3)
        ]
        for i in range(3)
    ]
    rho = [p0, p1, p2]
    t = [sum(V[i][k] * rho[k] for k in range(3)) for i in range(3)]
    return R, t


def _lm_trial_kernel(H_ref, b_ref, lam_ref, x_ref, out_ref):
    lam = lam_ref[0, 0]
    a = [
        [H_ref[i, j] + (lam if i == j else 0.0) for j in range(6)]
        for i in range(6)
    ]
    b = [b_ref[0, i] for i in range(6)]
    rhs = [-bi for bi in b]
    d0 = _chol_solve6(a, rhs)
    # one iterative-refinement step (solver._solve_refined)
    r = [rhs[i] - sum(a[i][k] * d0[k] for k in range(6)) for i in range(6)]
    dr = _chol_solve6(a, r)
    d = [d0[i] + dr[i] for i in range(6)]

    R, t = _se3_exp_scalars(d[0], d[1], d[2], d[3], d[4], d[5])
    # delta (4x4) and xi = delta @ x
    D = [
        [R[0][0], R[0][1], R[0][2], t[0]],
        [R[1][0], R[1][1], R[1][2], t[1]],
        [R[2][0], R[2][1], R[2][2], t[2]],
        [0.0, 0.0, 0.0, 1.0],
    ]
    xi = [
        [sum(D[i][k] * x_ref[k, j] for k in range(4)) for j in range(4)]
        for i in range(4)
    ]
    denom = sum(d[i] * (lam * d[i] - b[i]) for i in range(6))

    ir = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    ic = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    out = jnp.zeros((8, 128), out_ref.dtype)

    def put(out, i, j, v):
        return jnp.where((ir == i) & (ic == j), v, out)

    for i in range(4):
        for j in range(4):
            out = put(out, i, j, xi[i][j])
            out = put(out, i, 4 + j, D[i][j])
    out = put(out, 4, 0, denom)
    for i in range(6):
        out = put(out, 5, i, d[i])
    out_ref[:] = out


@partial(jax.jit, static_argnames=("interpret",))
def lm_trial_pallas(H, b, lam, x, interpret: bool = False):
    """One fused LM trial step.

    Returns (xi (4,4), delta (4,4), d (6,), denom ()): the trial pose
    delta @ x, the step transform, the twist, and d . (lambda d - b).
    Pass lam = 0.0 for the plain GN step (denom is then just -d . b,
    unused by GN)."""
    f32 = jnp.float32
    H8 = jnp.zeros((8, 8), f32).at[:6, :6].set(H)
    b8 = jnp.zeros((1, 8), f32).at[0, :6].set(b)
    lam1 = jnp.asarray(lam, f32).reshape(1, 1)
    x4 = jnp.asarray(x, f32)
    out = pl.pallas_call(
        _lm_trial_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), f32),
        interpret=interpret,
    )(H8, b8, lam1, x4)
    xi = out[:4, :4]
    delta = out[:4, 4:8]
    d = out[5, :6]
    denom = out[4, 0]
    return xi, delta, d, denom
