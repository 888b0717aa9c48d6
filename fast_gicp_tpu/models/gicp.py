"""FastGICP-equivalent: generalized ICP as one jitted LM fixed-point solve.

Covers the reference's `FastGICP` and `FastGICPSingleThread` objective
(include/fast_gicp/gicp/fast_gicp.hpp:20-100, impl/fast_gicp_impl.hpp):
kNN covariances with regularization, per-iteration 1-NN correspondences on
the transformed source, Mahalanobis M = (C_B + T C_A T^T)^-1 frozen at each
linearization, distance-gated correspondences, and the exact LM schedule.
The single-thread variant's anchor-point re-search skip (fast_gicp_st_impl
.hpp:46-54) is a CPU latency hack with no TPU analogue — the full batched
1-NN search is already the fast path here.

Everything from covariance gathering to the final pose runs inside one jit;
the host only ships padded clouds in and a 4x4 out.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import pallas_linearize, soa
from ..ops.neighbors import nn_search
from ..precision import f32_matmuls
from ..solver import LsqConfig, LsqResult, lsq_solve
from .base import (Cloud, Registration, centered_frame_align,
                   centered_frame_evaluate, estimate_covariances)


class GICPConfig(NamedTuple):
    """Defaults match fast_gicp_impl.hpp:16-20 + lsq defaults."""

    k_correspondences: int = 20
    regularization: str = "plane"
    max_correspondence_distance: float = math.inf
    # Two-phase solve like VGICPConfig.refresh_iterations: re-search 1-NN
    # correspondences for the first R LM iterations, then FREEZE the
    # matched target rows and run the rest search-free (the per-iteration
    # 17k x 17k NN search is GICP's dominant cost on TPU; this is the
    # voxel-free analogue of FastGICPSingleThread's anchor-point skip,
    # fast_gicp_st_impl.hpp:46-54).  M is still re-frozen from the current
    # linearization rotation each iteration.
    refresh_iterations: int | None = None
    lsq: LsqConfig = LsqConfig()


def _psum(val, axis_name):
    if axis_name is None:
        return val
    return jax.lax.psum(val, axis_name)


def make_gicp_objective(
    source,
    source_mask,
    source_covs,
    target,
    target_mask,
    target_covs,
    config: GICPConfig,
    axis_name=None,
    with_freeze: bool = False,
):
    """Build (linearize_fn, error_fn) closures for the GICP objective.

    `aux` freezes (correspondence targets, masked Mahalanobis) exactly like
    the reference freezes `correspondences_` / `mahalanobis_` across LM inner
    trials (fast_gicp_impl.hpp:118-155 vs :217-240).

    With ``with_freeze=True`` additionally returns (freeze,
    linearize_frozen): ``freeze(x)`` runs the 1-NN search at pose x and
    captures the matched target rows; ``linearize_frozen(x, frozen)``
    re-linearizes against them search-free (M still re-frozen from the
    current rotation).  Used by `gicp_align` (config.refresh_iterations).

    Per-correspondence math runs in SoA (n-last) layout (ops/soa.py); the
    target's (mean | cov) statistics ride one packed (N, 10) row-gather.
    """
    thr_sq = config.max_correspondence_distance**2
    n = source.shape[0]
    ones = jnp.ones(n, source.dtype)
    P = soa.cols_from_points(source)  # (3, N)
    C_A = soa.sym_cols_from_covs(source_covs)  # (6, N)
    use_fused = pallas_linearize.supported(n)

    if use_fused:
        # 16-wide packed rows in the voxel layout the fused kernel reads:
        # [mean(3) | cov 3x3 row-major (9) | count=1 | pad(3)] — count 1
        # makes the kernel's sqrt(count) weight the GICP unit weight.
        target_pack16 = jnp.concatenate(
            [
                target,
                soa.covs_rows9(target_covs),
                jnp.ones((target.shape[0], 1), target.dtype),
                jnp.zeros((target.shape[0], 3), target.dtype),
            ],
            axis=1,
        )

        def _pad8(a):
            return jnp.concatenate(
                [a, jnp.zeros((8 - a.shape[0], n), a.dtype)]
            )

        P_pad = _pad8(P)
        CA_pad = _pad8(C_A)

        def freeze(x):
            p_t = soa.transform_cols(x, P)
            idx, sq_dist = nn_search(
                jnp.swapaxes(p_t, 0, 1), target, target_mask
            )
            valid = source_mask & (sq_dist < thr_sq)
            rows_t = target_pack16[idx].T  # (16, N)
            return rows_t, _pad8(valid[None, :].astype(p_t.dtype))

        def linearize_frozen(x, frozen):
            rows_t, valid_pad = frozen
            # transform + R C_A R^T run in-kernel against the
            # loop-invariant P_pad/CA_pad operands
            err, H, b, aux = pallas_linearize.linearize_pallas(
                P_pad, CA_pad, x, rows_t, valid_pad,
            )
            return (
                _psum(err, axis_name),
                _psum(H, axis_name),
                _psum(b, axis_name),
                aux,
            )

        def linearize(x):
            return linearize_frozen(x, freeze(x))

        def error(x, aux):
            # untransformed source columns + the trial pose: the rigid
            # transform runs inside the kernel (one launch per LM trial).
            return _psum(
                pallas_linearize.error_pallas(P_pad, aux, x), axis_name
            )

        if with_freeze:
            return linearize, error, freeze, linearize_frozen
        return linearize, error

    # Packed target rows [mean(3) | sym cov(6) | pad] for one-gather stats.
    target_pack = jnp.concatenate(
        [
            target,
            jnp.swapaxes(soa.sym_cols_from_covs(target_covs), 0, 1),
        ],
        axis=1,
    )  # (N_t, 9)

    def freeze(x):
        p_t = soa.transform_cols(x, P)  # (3, N)
        idx, sq_dist = nn_search(
            jnp.swapaxes(p_t, 0, 1), target, target_mask
        )
        valid = source_mask & (sq_dist < thr_sq)
        return target_pack[idx], valid  # (N, 9) matched rows

    def linearize_frozen(x, frozen):
        rows, valid = frozen
        R = x[:3, :3]
        p_t = soa.transform_cols(x, P)
        q = soa.cols_from_points(rows[:, 0:3])  # (3, N)
        cov_B = jnp.swapaxes(rows[:, 3:9], 0, 1)  # (6, N)
        cov_rot = soa.rotate_sym_cols(R, C_A)
        M = soa.inv_sym_cols(cov_B + cov_rot) * valid[None, :]
        err, H, b = soa.linearize_cols(p_t, q, M, ones, valid)
        aux = (q, M, valid)
        return (
            _psum(err, axis_name),
            _psum(H, axis_name),
            _psum(b, axis_name),
            aux,
        )

    def linearize(x):
        return linearize_frozen(x, freeze(x))

    def error(x, aux):
        q, M, valid = aux
        p_t = soa.transform_cols(x, P)
        return _psum(soa.error_cols(p_t, q, M, ones, valid), axis_name)

    if with_freeze:
        return linearize, error, freeze, linearize_frozen
    return linearize, error


@partial(jax.jit, static_argnames=("config",))
@f32_matmuls
def gicp_align(
    source,
    source_mask,
    source_covs,
    target,
    target_mask,
    target_covs,
    guess,
    config: GICPConfig = GICPConfig(),
) -> LsqResult:
    """Single-device GICP align; returns the full LsqResult on device.

    With config.refresh_iterations = R the solve is two-phase like
    `vgicp_align`: R re-searching LM iterations, then the matched target
    rows are frozen at the phase-1 pose and the rest run search-free.

    Runs in the target-centroid frame (see base.centered_frame_align);
    the returned pose and Hessian are world-frame."""

    def run(src_c, tgt_c, g):
        x0 = g.astype(src_c.dtype)
        R = config.refresh_iterations
        if not R or R >= config.lsq.max_iterations:
            linearize, error = make_gicp_objective(
                src_c, source_mask, source_covs, tgt_c, target_mask,
                target_covs, config,
            )
            return lsq_solve(linearize, error, x0, config.lsq)

        linearize, error, freeze, lin_frozen = make_gicp_objective(
            src_c, source_mask, source_covs, tgt_c, target_mask,
            target_covs, config, with_freeze=True,
        )
        p1 = lsq_solve(
            linearize, error, x0, config.lsq._replace(max_iterations=R)
        )
        frozen = freeze(p1.transformation)
        p2 = lsq_solve(
            lambda x: lin_frozen(x, frozen),
            error,
            p1.transformation,
            config.lsq._replace(max_iterations=config.lsq.max_iterations - R),
        )
        return LsqResult(
            transformation=p2.transformation,
            hessian=p2.hessian,
            error=p2.error,
            converged=p2.converged,
            iterations=p1.iterations + p2.iterations,
        )

    return centered_frame_align(run, source, target, target_mask, guess)


@partial(jax.jit, static_argnames=("config",))
@f32_matmuls
def gicp_evaluate(
    source, source_mask, source_covs, target, target_mask, target_covs,
    pose, config: GICPConfig = GICPConfig(),
):
    """(error, H, b) of the GICP objective at an arbitrary pose — the
    functional form of the reference's evaluateCost
    (lsq_registration_impl.hpp:48-50).  Evaluated in the target-centroid
    frame and reported world-frame, consistent with gicp_align's
    Hessian (see base.centered_frame_evaluate)."""

    def run(src_c, tgt_c, p):
        linearize, _ = make_gicp_objective(
            src_c, source_mask, source_covs, tgt_c, target_mask,
            target_covs, config,
        )
        err, H, b, _aux = linearize(p)
        return err, H, b

    return centered_frame_evaluate(run, source, target, target_mask, pose)


@partial(jax.jit, static_argnames=(
    "config", "method", "k", "regularization", "kernel_width",
    "kernel_max_dist",
))
@f32_matmuls
def gicp_register_fresh(
    source,
    source_mask,
    target,
    target_mask,
    guess,
    config: GICPConfig = GICPConfig(),
    method: str = "knn",
    k: int = 20,
    regularization: str = "plane",
    kernel_width: float = 0.5,
    kernel_max_dist: float = 3.0,
):
    """ONE-dispatch fresh class-API registration (see
    vgicp.vgicp_register_fresh): in-graph covariance estimation for both
    clouds + the GICP align; returns (LsqResult, source_cov6,
    target_cov6) so the class caches the device-side covariances."""
    from ..ops.covariance import estimate_covariance_cols

    scovs = estimate_covariance_cols(
        source, source_mask, method, k=k, regularization=regularization,
        kernel_width=kernel_width, kernel_max_dist=kernel_max_dist,
    )
    tcovs = estimate_covariance_cols(
        target, target_mask, method, k=k, regularization=regularization,
        kernel_width=kernel_width, kernel_max_dist=kernel_max_dist,
    )
    res = gicp_align(
        source, source_mask, scovs, target, target_mask, tcovs, guess,
        config,
    )
    return res, scovs, tcovs


@dataclass
class FastGICP(Registration):
    """Class-API GICP, the equivalent of both `FastGICP` (multi-threaded)
    and `FastGICPSingleThread` — thread-count knobs are meaningless on TPU;
    `set_num_threads` is accepted and ignored for API compatibility.

    Covariances are computed lazily per cloud and cached on the Cloud, so
    odometry loops that `swap_source_and_target()` reuse them exactly like
    the reference (fast_gicp_impl.hpp:50-57, :107-112).
    """

    k_correspondences: int = 20
    regularization: str = "plane"
    covariance_estimation: str = "knn"  # "knn"|"rbf"|"kdtree"|"adaptive"
    kernel_width: float = 0.5
    kernel_max_dist: float = 3.0

    def set_num_threads(self, n: int) -> None:  # API parity no-op
        del n

    def set_correspondence_randomness(self, k: int) -> None:
        self.k_correspondences = int(k)

    def set_regularization_method(self, method: str) -> None:
        self.regularization = method

    def set_nearest_neighbor_method(self, method: str) -> None:
        # Superset of the reference: the CUDA covariance selector
        # (fast_vgicp_cuda.hpp:21) offered on plain GICP too — "rbf" makes
        # covariance estimation a fused MXU kernel instead of exact kNN.
        if method not in ("knn", "rbf", "kdtree"):
            raise ValueError(
                "covariance estimation must be 'knn', 'rbf', or 'kdtree'"
            )
        self.covariance_estimation = method

    def set_kernel_params(self, width: float, max_dist: float = None) -> None:
        self.kernel_width = float(width)
        self.kernel_max_dist = (
            float(max_dist) if max_dist is not None else 5.0 * float(width)
        )

    def _ensure_covariances(self, cloud: Cloud) -> None:
        estimate_covariances(
            cloud,
            self.covariance_estimation,
            self.k_correspondences,
            self.regularization,
            kernel_width=self.kernel_width,
            kernel_max_dist=self.kernel_max_dist,
        )

    def _config(self) -> GICPConfig:
        return GICPConfig(
            k_correspondences=self.k_correspondences,
            regularization=self.regularization,
            max_correspondence_distance=self.max_correspondence_distance,
            lsq=self._lsq_config(),
        )

    def _compute(self, source: Cloud, target: Cloud, guess):
        if (
            source.covs is None
            and target.covs is None
            and self.covariance_estimation in ("knn", "rbf", "adaptive")
        ):
            # fresh align = ONE dispatch (see gicp_register_fresh); the
            # returned covariances populate the cache for swap/reuse
            res, scovs, tcovs = gicp_register_fresh(
                source.points, source.mask, target.points, target.mask,
                guess, self._config(),
                method=self.covariance_estimation,
                k=self.k_correspondences,
                regularization=self.regularization,
                kernel_width=self.kernel_width,
                kernel_max_dist=self.kernel_max_dist,
            )
            source.covs, target.covs = scovs, tcovs
            return res
        self._ensure_covariances(source)
        self._ensure_covariances(target)
        return gicp_align(
            source.points,
            source.mask,
            source.covs,
            target.points,
            target.mask,
            target.covs,
            guess,
            self._config(),
        )

    def _evaluate(self, source: Cloud, target: Cloud, pose):
        self._ensure_covariances(source)
        self._ensure_covariances(target)
        return gicp_evaluate(
            source.points,
            source.mask,
            source.covs,
            target.points,
            target.mask,
            target.covs,
            pose,
            self._config(),
        )


class FastGICPSingleThread(FastGICP):
    """Name-parity alias of the reference's `FastGICPSingleThread`
    (fast_gicp_st.hpp:20-65).  Identical objective and results; the
    single-thread variant's anchor-point re-search skip
    (fast_gicp_st_impl.hpp:46-54) is a CPU latency trick with no TPU
    analogue — the batched 1-NN search is already the fast path here."""

