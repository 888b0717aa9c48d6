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

from .. import se3
from ..ops import linalg3
from ..ops.covariance import knn_covariances_jit
from ..ops.neighbors import nn_search
from ..ops.reduction import error_reduce, linearize_reduce
from ..precision import f32_matmuls
from ..solver import LsqConfig, LsqResult, lsq_solve
from .base import Cloud, Registration


class GICPConfig(NamedTuple):
    """Defaults match fast_gicp_impl.hpp:16-20 + lsq defaults."""

    k_correspondences: int = 20
    regularization: str = "plane"
    max_correspondence_distance: float = math.inf
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
):
    """Build (linearize_fn, error_fn) closures for the GICP objective.

    `aux` freezes (correspondence indices, masked Mahalanobis) exactly like
    the reference freezes `correspondences_` / `mahalanobis_` across LM inner
    trials (fast_gicp_impl.hpp:118-155 vs :217-240).
    """
    thr_sq = config.max_correspondence_distance**2
    ones = jnp.ones(source.shape[0], source.dtype)

    def linearize(x):
        R = x[:3, :3]
        p_t = se3.transform_points(x, source)
        idx, sq_dist = nn_search(p_t, target, target_mask)
        valid = source_mask & (sq_dist < thr_sq)
        cov_rot = se3.rotate_covs(R, source_covs)
        RCR = target_covs[idx] + cov_rot
        M = linalg3.inv3(RCR) * valid[:, None, None]
        err, H, b = linearize_reduce(p_t, target[idx], M, ones, valid)
        aux = (idx, M, valid)
        return (
            _psum(err, axis_name),
            _psum(H, axis_name),
            _psum(b, axis_name),
            aux,
        )

    def error(x, aux):
        idx, M, valid = aux
        p_t = se3.transform_points(x, source)
        return _psum(error_reduce(p_t, target[idx], M, ones, valid), axis_name)

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
    """Single-device GICP align; returns the full LsqResult on device."""
    linearize, error = make_gicp_objective(
        source, source_mask, source_covs, target, target_mask, target_covs, config
    )
    return lsq_solve(linearize, error, guess.astype(source.dtype), config.lsq)


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

    def set_num_threads(self, n: int) -> None:  # API parity no-op
        del n

    def set_correspondence_randomness(self, k: int) -> None:
        self.k_correspondences = int(k)

    def set_regularization_method(self, method: str) -> None:
        self.regularization = method

    def _ensure_covariances(self, cloud: Cloud) -> None:
        if cloud.covs is None:
            cloud.covs = knn_covariances_jit(
                cloud.points,
                cloud.mask,
                k=self.k_correspondences,
                method=self.regularization,
            )

    def _config(self) -> GICPConfig:
        return GICPConfig(
            k_correspondences=self.k_correspondences,
            regularization=self.regularization,
            max_correspondence_distance=self.max_correspondence_distance,
            lsq=self._lsq_config(),
        )

    def _compute(self, source: Cloud, target: Cloud, guess):
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

