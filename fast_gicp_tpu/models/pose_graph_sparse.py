"""Sparse block pose-graph optimization + sliding-window marginalization.

`optimize_pose_graph` (pose_graph.py) materializes a dense (6K)^2 Hessian
via whole-graph jacfwd — right for windows of tens of keyframes, unusable
at SLAM scale.  This module is the large-scale back-end:

  * per-edge 6x12 Jacobians (vmapped jacfwd over each edge's TWO incident
    poses only — never the (E, 6, 6K) whole-graph Jacobian),
  * block-sparse normal equations held as per-edge 6x6 blocks
    (H_ii, H_ij, H_jj) that are never assembled into a dense matrix,
  * a block-Jacobi-preconditioned conjugate-gradient solve whose matvec
    is two batched (E, 6, 6) @ (E, 6) contractions + two 6-wide row
    scatter-adds — the TPU-native sparse solve (fixed shapes, one jit,
    vmap/shard-ready; edges can be sharded over a mesh with a psum'd
    matvec),
  * `SlidingWindowBA`: a fixed-size keyframe window with Schur-complement
    marginalization — the departing pose's information is folded into a
    unary prior on the window head (H' = H11 - H10 H00^-1 H01), so the
    window solve stays O(W) while retaining the marginalized history.

The reference has no back-end at all (scan-to-scan only, SURVEY.md §5);
edge information matrices come from registration Hessians
(`LsqResult.hessian`), the uncertainty the reference computes but never
consumes (lsq_registration.hpp:55).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import se3
from ..ops import linalg3
from ..precision import f32_matmuls
from .pose_graph import PoseGraphConfig, PoseGraphResult


class SparsePGConfig(NamedTuple):
    max_iterations: int = 20
    # Levenberg damping, ADAPTIVE: starts at `damping`, x10 on a rejected
    # step, /10 on acceptance (large graphs with tens of meters of
    # accumulated drift are strongly nonlinear — a raw GN step overshoots
    # into se3_log's domain boundary and NaNs).
    damping: float = 1e-4
    lm_max_trials: int = 8
    # moderate vs the dense solver's 1e8: the f32 CG iteration sees the
    # gauge block's condition number directly
    gauge_weight: float = 1e6
    convergence_delta: float = 1e-6
    cg_iterations: int = 100
    cg_tolerance: float = 1e-10  # relative to |b|^2


def _edge_res(Ti, Tj, z_inv, d):
    """Residual of one edge at the stacked perturbation d = [d_i | d_j]."""
    rel = se3.invert_transform(Ti @ se3.se3_exp(d[:6])) @ (
        Tj @ se3.se3_exp(d[6:])
    )
    return se3.se3_log(z_inv @ rel)


_edge_res_and_jac = jax.vmap(
    lambda Ti, Tj, z_inv: (
        _edge_res(Ti, Tj, z_inv, jnp.zeros(12, jnp.float32)),
        jax.jacfwd(lambda d: _edge_res(Ti, Tj, z_inv, d))(
            jnp.zeros(12, jnp.float32)
        ),
    )
)

# residual-only view for the LM trial loop's error evaluations (one per
# damping trial): don't lean on DCE to strip the 12-wide jacfwd
_edge_res_only = jax.vmap(
    lambda Ti, Tj, z_inv: _edge_res(Ti, Tj, z_inv, jnp.zeros(12, jnp.float32))
)


def _solve6(A, B):
    """Solve A X = B for 6x6 SPD A; B (6,) or (6, m) (columns)."""
    if B.ndim == 1:
        return linalg3.cholesky_solve(A, B)
    return jax.vmap(lambda col: linalg3.cholesky_solve(A, col),
                    in_axes=1, out_axes=1)(B)


def _tridiag_solve(D, U, b):
    """Block-Thomas solve of the block-tridiagonal system with diagonal
    blocks D (K, 6, 6), super-diagonal blocks U (K, 6, 6) (U[K-1] unused),
    rhs b (K, 6) — the exact Schur elimination along the odometry chain,
    used as the CG preconditioner so loop-closure corrections are the only
    thing CG itself has to resolve (plain block-Jacobi propagates
    information one pose per iteration and stalls on 1000-pose chains).
    """
    k = D.shape[0]
    L = jnp.concatenate(
        [jnp.zeros((1, 6, 6), D.dtype),
         jnp.swapaxes(U[:-1], -1, -2)], axis=0
    )  # L[k] = U[k-1]^T

    def fwd(carry, inp):
        G_prev, y_prev = carry
        Dk, Uk, bk, Lk = inp
        Ck = Dk - Lk @ G_prev
        Gk = _solve6(Ck, Uk)
        yk = _solve6(Ck, bk - Lk @ y_prev)
        return (Gk, yk), (Gk, yk)

    init = (jnp.zeros((6, 6), D.dtype), jnp.zeros(6, D.dtype))
    _, (G, y) = jax.lax.scan(fwd, init, (D, U, b, L))

    def bwd(x_next, inp):
        Gk, yk = inp
        xk = yk - Gk @ x_next
        return xk, xk

    _, x_rev = jax.lax.scan(bwd, jnp.zeros(6, D.dtype), (G, y), reverse=True)
    return x_rev


def _optimize_sparse(
    poses,
    edge_i,
    edge_j,
    z_inv,
    edge_info,
    prior_info,
    prior_pose,
    gauge_w: float,
    config: SparsePGConfig,
    axis_name=None,
) -> PoseGraphResult:
    """Core sparse GN + block-PCG solve.

    With `axis_name`, edge arrays are THIS DEVICE'S shard and every
    edge-indexed reduction (error, b, preconditioner blocks, CG matvec)
    is completed with a psum over the mesh axis — the poses (and the CG
    state over them) stay replicated, so every device walks the identical
    trajectory.  Replicated terms (unary prior, gauge) are added AFTER the
    psum so they count once.
    """
    k = poses.shape[0]

    def _ps(v):
        return v if axis_name is None else jax.lax.psum(v, axis_name)

    gauge = jnp.zeros((k, 6), jnp.float32).at[0].set(gauge_w)

    def _total_err(T):
        r = _edge_res_only(T[edge_i], T[edge_j], z_inv)
        rp = se3.se3_log(se3.invert_transform(prior_pose) @ T[0])
        e = _ps(jnp.einsum("ea,eab,eb->", r, edge_info, r)) \
            + rp @ prior_info @ rp
        # poses pushed out of se3_log's domain read as infinitely bad
        return jnp.where(jnp.isfinite(e), e, jnp.float32(jnp.inf))

    def gn_step(state):
        it, T, lam, _err, _conv = state
        r, J = _edge_res_and_jac(T[edge_i], T[edge_j], z_inv)  # (E,6),(E,6,12)
        Ji, Jj = J[:, :, :6], J[:, :, 6:]
        WJi = jnp.einsum("eab,ebd->ead", edge_info, Ji)
        WJj = jnp.einsum("eab,ebd->ead", edge_info, Jj)
        Hii = jnp.einsum("ead,eam->edm", Ji, WJi)  # (E, 6, 6)
        Hij = jnp.einsum("ead,eam->edm", Ji, WJj)
        Hjj = jnp.einsum("ead,eam->edm", Jj, WJj)
        bi = jnp.einsum("ead,ea->ed", WJi, r)
        bj = jnp.einsum("ead,ea->ed", WJj, r)
        err = _ps(jnp.einsum("ea,eab,eb->", r, edge_info, r))

        # unary prior on pose 0: r_p(d0) = log(prior_pose^-1 T_0 exp(d0))
        rp = se3.se3_log(se3.invert_transform(prior_pose) @ T[0])
        Jp = jax.jacfwd(
            lambda d: se3.se3_log(
                se3.invert_transform(prior_pose) @ (T[0] @ se3.se3_exp(d))
            )
        )(jnp.zeros(6, jnp.float32))
        WJp = prior_info @ Jp
        Hp = Jp.T @ WJp  # (6, 6)
        bp = WJp.T @ rp
        err = err + rp @ prior_info @ rp
        # a non-finite linearization error would reject every LM trial
        # (err_try < NaN is always False) and report converged=True on
        # untouched poses; treat it as infinitely bad so any finite trial
        # is accepted and the solver can recover
        err = jnp.where(jnp.isfinite(err), err, jnp.float32(jnp.inf))

        b = _ps(
            jnp.zeros((k, 6), jnp.float32)
            .at[edge_i].add(bi)
            .at[edge_j].add(bj)
        ).at[0].add(bp)

        # Block-tridiagonal preconditioner: per-pose diagonal blocks plus
        # the odometry chain's off-diagonal blocks, solved exactly by
        # block-Thomas elimination each CG iteration.
        gauge_blk = jax.vmap(jnp.diag)(gauge)  # (K, 6, 6)
        Pblocks = (
            _ps(
                jnp.zeros((k, 6, 6), jnp.float32)
                .at[edge_i].add(Hii)
                .at[edge_j].add(Hjj)
            ).at[0].add(Hp)
            + gauge_blk
        )
        # super-diagonal: H_{k,k+1} from chain edges in either storage order
        is_fwd = edge_j == edge_i + 1
        is_bwd = edge_i == edge_j + 1
        U = _ps(
            jnp.zeros((k + 1, 6, 6), jnp.float32)
            .at[jnp.where(is_fwd, edge_i, k)].add(Hij)
            .at[jnp.where(is_bwd, edge_j, k)].add(
                jnp.swapaxes(Hij, -1, -2)
            )
        )[:k]

        def matvec_make(lam):
            return lambda x: matvec_base(x) + lam * x

        def matvec_base(x):  # x (K, 6), replicated; edge products sharded
            xi, xj = x[edge_i], x[edge_j]
            yi = jnp.einsum("edm,em->ed", Hii, xi) + jnp.einsum(
                "edm,em->ed", Hij, xj
            )
            yj = jnp.einsum("emd,em->ed", Hij, xi) + jnp.einsum(
                "edm,em->ed", Hjj, xj
            )
            y = _ps(
                jnp.zeros((k, 6), jnp.float32)
                .at[edge_i].add(yi)
                .at[edge_j].add(yj)
            )
            y = y.at[0].add(Hp @ x[0])
            return y + gauge * x

        def precond_make(lam):
            damp_blk = lam * jnp.eye(6, dtype=jnp.float32)

            def precond(r):
                return _tridiag_solve(Pblocks + damp_blk[None], U, r)

            return precond

        def pcg(b, lam):
            matvec = matvec_make(lam)
            precond = precond_make(lam)
            b_norm_sq = jnp.sum(b * b)
            x = jnp.zeros_like(b)
            res = b
            z = precond(res)
            p = z
            rz = jnp.sum(res * z)

            def cond(s):
                i, _x, res, _p, _rz = s
                return (i < config.cg_iterations) & (
                    jnp.sum(res * res)
                    > config.cg_tolerance * jnp.maximum(b_norm_sq, 1e-30)
                )

            def body(s):
                i, x, res, p, rz = s
                Ap = matvec(p)
                alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
                x = x + alpha * p
                # periodic residual recomputation guards f32 drift over
                # long CG runs; lax.cond so the refresh matvec runs only
                # on the 1-in-64 iterations that use it (jnp.where would
                # evaluate it every step, doubling the CG cost)
                res = jax.lax.cond(
                    (i + 1) % 64 == 0,
                    lambda x=x: b - matvec(x),
                    lambda res=res, Ap=Ap: res - alpha * Ap,
                )
                z = precond(res)
                rz_new = jnp.sum(res * z)
                beta = rz_new / jnp.maximum(rz, 1e-30)
                return i + 1, x, res, z + beta * p, rz_new

            _, x, _, _, _ = jax.lax.while_loop(
                cond, body, (jnp.int32(0), x, res, p, rz)
            )
            return x

        # Levenberg inner loop: retry the SAME linearization with larger
        # damping until the step reduces the total error.
        def trial_cond(s):
            t, _lam, _T, _delta, accepted = s
            return (t < config.lm_max_trials) & ~accepted

        def trial_body(s):
            t, lam, _T, _delta, _acc = s
            delta = -pcg(b, lam)
            T_try = T @ se3.se3_exp(delta)
            err_try = _total_err(T_try)
            ok = err_try < err
            lam_next = jnp.where(ok, jnp.maximum(lam * 0.1, 1e-7), lam * 10.0)
            return (
                t + 1,
                lam_next,
                jnp.where(ok, T_try, T),
                jnp.where(ok, delta, jnp.zeros_like(delta)),
                ok,
            )

        _, lam, T_new, delta, accepted = jax.lax.while_loop(
            trial_cond, trial_body,
            (jnp.int32(0), lam, T, jnp.zeros((k, 6), jnp.float32),
             jnp.array(False)),
        )
        conv = (jnp.max(jnp.abs(delta)) < config.convergence_delta) | (
            ~accepted
        )
        return it + 1, T_new, lam, err, conv

    def cond(state):
        it, _T, _lam, _err, conv = state
        return (it < config.max_iterations) & ~conv

    init = (jnp.int32(0), poses, jnp.float32(config.damping),
            jnp.float32(0.0), jnp.array(False))
    it, T, _lam, err, conv = jax.lax.while_loop(cond, gn_step, init)
    r = _edge_res_only(T[edge_i], T[edge_j], z_inv)
    err = _ps(jnp.einsum("ea,eab,eb->", r, edge_info, r))
    # never report success on a non-finite objective (e.g. NaN inputs)
    conv = conv & jnp.isfinite(err)
    return PoseGraphResult(poses=T, error=err, iterations=it, converged=conv)


@partial(jax.jit, static_argnames=("config",))
@f32_matmuls
def optimize_pose_graph_sparse(
    poses,
    edge_i,
    edge_j,
    edge_rel,
    edge_info=None,
    prior_info=None,
    prior_pose=None,
    config: SparsePGConfig = SparsePGConfig(),
) -> PoseGraphResult:
    """Gauss-Newton + block-PCG pose-graph solve (scales to 1000s of
    keyframes; matches `optimize_pose_graph` on small graphs).

    Args:
      poses: (K, 4, 4) initial absolute poses.
      edge_i, edge_j: (E,) int32 endpoints.
      edge_rel: (E, 4, 4) measured relative poses Z_e (i -> j).
      edge_info: optional (E, 6, 6) information matrices.
      prior_info / prior_pose: optional unary prior on pose 0 (from
        sliding-window marginalization): residual log(prior_pose^-1 T_0)
        weighted by prior_info.  Pose 0 additionally carries the gauge
        weight.
    """
    poses = jnp.asarray(poses, jnp.float32)
    e = edge_i.shape[0]
    if edge_info is None:
        edge_info = jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32), (e, 6, 6))
    z_inv = se3.invert_transform(edge_rel.astype(jnp.float32))
    have_prior = prior_info is not None
    if not have_prior:
        prior_info = jnp.zeros((6, 6), jnp.float32)
        prior_pose = jnp.eye(4, dtype=jnp.float32)

    # With a marginalization prior, pose 0 is anchored by the prior itself;
    # the hard gauge pin would fight it.
    gauge_w = 0.0 if have_prior else config.gauge_weight
    return _optimize_sparse(
        poses, edge_i, edge_j, z_inv, edge_info, prior_info, prior_pose,
        gauge_w, config,
    )


@partial(jax.jit, static_argnames=("mesh", "config"))
@f32_matmuls
def optimize_pose_graph_sparse_sharded(
    mesh,
    poses,
    edge_i,
    edge_j,
    edge_rel,
    edge_info=None,
    prior_info=None,
    prior_pose=None,
    config: SparsePGConfig = SparsePGConfig(),
) -> PoseGraphResult:
    """Distributed pose-graph solve: EDGES sharded over the device mesh.

    The north-star back-end shape (SURVEY.md §2.4): each device linearizes
    its own edge shard (residuals, 6x12 Jacobians, 6x6 blocks) and the
    normal equations / CG matvecs are completed with `psum` collectives —
    per CG iteration the wire carries one (K, 6) vector per device, so a
    graph with millions of edges scales by edge count while the replicated
    pose state stays tiny.  Exact same trajectory as the single-device
    solver (the psum'd sums are bit-identical up to f32 reduction order).

    Edges are padded to a multiple of the mesh size with zero-information
    self-loops on pose 0, which contribute exactly nothing to any sum.
    """
    axis = mesh.axis_names[0]
    d = mesh.shape[axis]
    poses = jnp.asarray(poses, jnp.float32)
    e = edge_i.shape[0]
    if edge_info is None:
        edge_info = jnp.broadcast_to(jnp.eye(6, dtype=jnp.float32), (e, 6, 6))
    pad = (-e) % d
    if pad:
        edge_i = jnp.concatenate([edge_i, jnp.zeros(pad, edge_i.dtype)])
        edge_j = jnp.concatenate([edge_j, jnp.zeros(pad, edge_j.dtype)])
        edge_rel = jnp.concatenate([
            edge_rel,
            jnp.broadcast_to(jnp.eye(4, dtype=edge_rel.dtype), (pad, 4, 4)),
        ])
        edge_info = jnp.concatenate(
            [edge_info, jnp.zeros((pad, 6, 6), edge_info.dtype)]
        )
    z_inv = se3.invert_transform(edge_rel.astype(jnp.float32))
    have_prior = prior_info is not None
    if not have_prior:
        prior_info = jnp.zeros((6, 6), jnp.float32)
        prior_pose = jnp.eye(4, dtype=jnp.float32)
    gauge_w = 0.0 if have_prior else config.gauge_weight

    try:
        shard_map = jax.shard_map
    except AttributeError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(),
    )
    def run(T0, ei, ej, zi, info, pinfo, ppose):
        return _optimize_sparse(
            T0, ei, ej, zi, info, pinfo, ppose, gauge_w, config,
            axis_name=axis,
        )

    return run(poses, edge_i, edge_j, z_inv, edge_info, prior_info,
               prior_pose)


class SlidingWindowBA:
    """Fixed-size keyframe window with Schur-complement marginalization.

    Keyframes enter with an odometry edge (relative pose + information);
    loop-closure edges between window members can be added at any time.
    When the window exceeds `window`, the OLDEST pose is marginalized: its
    odometry edge and unary prior are linearized at the current estimate
    and Schur-reduced onto its successor,
        H' = H11 - H10 H00^-1 H01,   b' = b1 - H10 H00^-1 b0,
    which becomes the new unary prior anchoring the window head — bounded
    memory, bounded solve cost, history retained as information.

    Loop edges attached to the departing pose are dropped with a warning
    (close loops before they leave the window — standard sliding-window
    practice).
    """

    def __init__(self, window: int = 20,
                 config: SparsePGConfig = SparsePGConfig()):
        import numpy as np

        self.window = int(window)
        self.config = config
        self._np = np
        self.poses = []  # list of (4, 4) float32 world poses
        self.edges = []  # (i, j, rel (4,4), info (6,6)) with GLOBAL indices
        self.base = 0  # global index of window[0]
        self.prior_pose = None  # (4, 4) anchor for window[0]
        self.prior_info = None  # (6, 6)

    def add_keyframe(self, rel, info=None) -> None:
        """Append a keyframe connected to the previous one by `rel`
        (measured relative pose, previous -> new) with information `info`
        (e.g. the registration Hessian)."""
        np = self._np
        rel = np.asarray(rel, np.float32)
        info = np.eye(6, dtype=np.float32) if info is None else np.asarray(
            info, np.float32
        )
        if not self.poses:
            self.poses = [np.eye(4, dtype=np.float32)]
            self.prior_pose = np.eye(4, dtype=np.float32)
            self.prior_info = 1e6 * np.eye(6, dtype=np.float32)
            # the very first keyframe is created by `rel` from the origin
        g = self.base + len(self.poses) - 1
        self.poses.append((self.poses[-1] @ rel).astype(np.float32))
        self.edges.append((g, g + 1, rel, info))
        while len(self.poses) > self.window:
            self._marginalize_oldest()

    def add_loop_edge(self, i: int, j: int, rel, info=None) -> None:
        """Add a loop-closure edge between GLOBAL keyframe indices i, j
        (both must still be inside the window)."""
        np = self._np
        end = self.base + len(self.poses)
        if not (self.base <= i < end and self.base <= j < end):
            raise ValueError(
                f"loop edge endpoints ({i}, {j}) outside the window "
                f"[{self.base}, {end})"
            )
        info = np.eye(6, dtype=np.float32) if info is None else np.asarray(
            info, np.float32
        )
        self.edges.append((i, j, np.asarray(rel, np.float32), info))

    def _marginalize_oldest(self) -> None:
        import warnings

        np = self._np
        old = self.base
        keep, drop = [], []
        for (i, j, rel, info) in self.edges:
            (drop if (i == old or j == old) else keep).append((i, j, rel, info))
        # local system over (d_old, d_next) from the prior + odometry edge;
        # loop edges touching `old` are dropped (warned)
        odo, extra = [], []
        for ed in drop:
            (odo if {ed[0], ed[1]} == {old, old + 1} else extra).append(ed)
        if extra:
            warnings.warn(
                f"dropping {len(extra)} loop edge(s) attached to "
                "marginalized keyframe"
            )
        T0 = jnp.asarray(self.poses[0])
        T1 = jnp.asarray(self.poses[1])
        H = np.zeros((12, 12), np.float32)
        b = np.zeros(12, np.float32)
        # unary prior on the departing pose
        Jp = jax.jacfwd(
            lambda d: se3.se3_log(
                se3.invert_transform(jnp.asarray(self.prior_pose))
                @ (T0 @ se3.se3_exp(d))
            )
        )(jnp.zeros(6, jnp.float32))
        rp = se3.se3_log(
            se3.invert_transform(jnp.asarray(self.prior_pose)) @ T0
        )
        WJp = self.prior_info @ np.asarray(Jp)
        H[:6, :6] += np.asarray(Jp).T @ WJp
        b[:6] += WJp.T @ np.asarray(rp)
        for (_i, _j, rel, info) in odo:
            z_inv = se3.invert_transform(jnp.asarray(rel))
            r = np.asarray(_edge_res(T0, T1, z_inv, jnp.zeros(12, jnp.float32)))
            J = np.asarray(
                jax.jacfwd(lambda d: _edge_res(T0, T1, z_inv, d))(
                    jnp.zeros(12, jnp.float32)
                )
            )
            WJ = info @ J
            H += J.T @ WJ
            b += WJ.T @ r
        # Schur complement: eliminate the departing pose's 6 dof
        H00 = H[:6, :6] + 1e-6 * np.eye(6, dtype=np.float32)
        H01 = H[:6, 6:]
        H11 = H[6:, 6:]
        sol = np.linalg.solve(H00, H01)
        self.prior_info = (H11 - H01.T @ sol).astype(np.float32)
        # prior residual at the current estimate is folded into the prior
        # MEAN: shift T1's anchor so the prior's minimum sits at the
        # Schur-reduced b' (first-order): d1* = -(H')^-1 b'
        bp = b[6:] - sol.T @ b[:6]
        info_reg = self.prior_info + 1e-6 * np.eye(6, dtype=np.float32)
        d1 = -np.linalg.solve(info_reg, bp)
        self.prior_pose = np.asarray(
            T1 @ se3.se3_exp(jnp.asarray(d1, jnp.float32)), np.float32
        )
        self.poses = self.poses[1:]
        self.edges = keep
        self.base += 1

    def optimize(self) -> "PoseGraphResult":
        """Solve the current window (sparse GN + PCG) in place."""
        np = self._np
        k = len(self.poses)
        if k < 2:
            return None
        poses = jnp.asarray(np.stack(self.poses))
        ei = jnp.asarray(
            np.asarray([i - self.base for (i, _, _, _) in self.edges],
                       np.int32))
        ej = jnp.asarray(
            np.asarray([j - self.base for (_, j, _, _) in self.edges],
                       np.int32))
        rel = jnp.asarray(np.stack([r for (_, _, r, _) in self.edges]))
        info = jnp.asarray(np.stack([w for (_, _, _, w) in self.edges]))
        res = optimize_pose_graph_sparse(
            poses, ei, ej, rel, info,
            prior_info=jnp.asarray(self.prior_info),
            prior_pose=jnp.asarray(self.prior_pose),
            config=self.config,
        )
        self.poses = [np.asarray(p, np.float32) for p in res.poses]
        return res
