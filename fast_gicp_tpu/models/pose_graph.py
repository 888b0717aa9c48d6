"""SE(3) pose-graph optimization — keyframe back-end for the odometry
front-ends.

The reference has no back-end at all (scan-to-scan only; SURVEY.md §5).
This module closes that gap TPU-natively: a fully jitted Gauss-Newton solve
over K poses with relative-pose edges, where each edge's 6x6 information
matrix can be taken directly from a registration's `get_final_hessian()` /
`LsqResult.hessian` — the uncertainty the reference computes but never
consumes downstream (lsq_registration.hpp:55).

Residual (standard right-perturbation pose-graph form):
    r_e(delta) = log( Z_e^-1 · (T_i exp(d_i))^-1 · (T_j exp(d_j)) )
with Z_e the measured relative pose.  Jacobians come from jax.jacfwd at
delta = 0 (exact, no hand-derived adjoints to get wrong), the normal
equations are assembled densely ((6K)^2 — windows of tens of keyframes),
the gauge is fixed by a strong prior on pose 0, and the damped system is
solved with the same unrolled-Cholesky machinery as the registration LM.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import se3
from ..precision import f32_matmuls


class PoseGraphConfig(NamedTuple):
    max_iterations: int = 10
    damping: float = 1e-9
    gauge_weight: float = 1e8  # prior information pinning pose 0
    convergence_delta: float = 1e-6  # max |delta| to declare convergence


class PoseGraphResult(NamedTuple):
    poses: jax.Array  # (K, 4, 4) optimized poses
    error: jax.Array  # () final weighted squared error
    iterations: jax.Array  # () int32
    converged: jax.Array  # () bool


def _edge_residuals(poses, deltas, idx_i, idx_j, z_inv):
    """Stacked (E, 6) residuals at perturbation `deltas` (K, 6)."""
    T = poses @ se3.se3_exp(deltas)  # (K, 4, 4)
    Ti = T[idx_i]
    Tj = T[idx_j]
    rel = se3.invert_transform(Ti) @ Tj
    return se3.se3_log(z_inv @ rel)


@partial(jax.jit, static_argnames=("config",))
@f32_matmuls
def optimize_pose_graph(
    poses,
    edge_i,
    edge_j,
    edge_rel,
    edge_info=None,
    config: PoseGraphConfig = PoseGraphConfig(),
) -> PoseGraphResult:
    """Gauss-Newton pose-graph solve.

    Args:
      poses: (K, 4, 4) initial absolute poses (f32).
      edge_i, edge_j: (E,) int32 endpoint indices.
      edge_rel: (E, 4, 4) measured relative poses Z_e (i -> j).
      edge_info: optional (E, 6, 6) information matrices (e.g. registration
        Hessians); identity if None.
    """
    poses = jnp.asarray(poses, jnp.float32)
    k = poses.shape[0]
    e = edge_i.shape[0]
    if edge_info is None:
        edge_info = jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32), (e, 6, 6))
    z_inv = se3.invert_transform(edge_rel.astype(jnp.float32))

    def gn_step(state):
        it, T, _err, _conv = state

        def res_flat(deltas):
            return _edge_residuals(T, deltas.reshape(k, 6), edge_i, edge_j, z_inv)

        zero = jnp.zeros(k * 6, jnp.float32)
        r = res_flat(zero)  # (E, 6)
        J = jax.jacfwd(res_flat)(zero)  # (E, 6, 6K)

        # J: (E, 6, D); info: (E, 6, 6); H = sum_e J^T W J, b = sum_e J^T W r
        WJ = jnp.einsum("eij,ejd->eid", edge_info, J)  # (E, 6, D)
        H = jnp.einsum("eid,eim->dm", J, WJ)  # (D, D)
        b = jnp.einsum("eid,ei->d", WJ, r)  # (D,)
        err = jnp.einsum("ei,eij,ej->", r, edge_info, r)

        # gauge prior on pose 0 + Levenberg damping
        D = k * 6
        diag = jnp.concatenate(
            [
                jnp.full(6, config.gauge_weight, jnp.float32),
                jnp.full(D - 6, config.damping, jnp.float32),
            ]
        )
        Hd = H + jnp.diag(diag)
        delta = -jnp.linalg.solve(Hd, b)
        T_new = T @ se3.se3_exp(delta.reshape(k, 6))
        conv = jnp.max(jnp.abs(delta)) < config.convergence_delta
        return it + 1, T_new, err, conv

    def cond(state):
        it, _T, _err, conv = state
        return (it < config.max_iterations) & ~conv

    init = (jnp.int32(0), poses, jnp.float32(0.0), jnp.array(False))
    it, T, err, conv = jax.lax.while_loop(cond, gn_step, init)
    # final error at the solution
    r = _edge_residuals(T, jnp.zeros((k, 6), jnp.float32), edge_i, edge_j, z_inv)
    err = jnp.einsum("ei,eij,ej->", r, edge_info, r)
    return PoseGraphResult(poses=T, error=err, iterations=it, converged=conv)


def edges_from_odometry(poses):
    """Helper: sequential odometry edges (i, i+1) with measured relatives
    taken from the given pose chain."""
    import numpy as np

    k = len(poses)
    idx_i = np.arange(k - 1, dtype=np.int32)
    idx_j = idx_i + 1
    rel = np.stack(
        [np.linalg.inv(poses[i]) @ poses[i + 1] for i in range(k - 1)]
    ).astype(np.float32)
    return idx_i, idx_j, rel
