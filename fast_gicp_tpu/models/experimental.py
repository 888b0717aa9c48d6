"""Experimental: multi-correspondence radius GICP (FastGICPMultiPoints).

Re-design of the reference's experimental `FastGICPMultiPoints`
(experimental/fast_gicp_mp.hpp:16-85, impl :130-219 — NOT compiled by the
reference build, CMakeLists.txt:55-60): instead of the single nearest
neighbor, every target point within `search_radius` of the transformed
source point contributes, weighted by w = max(0, 1 - d/r), and the
correspondence target is the weighted average of those points' means and
covariances (fast_gicp_mp_impl.hpp:146-176).

TPU re-phrasing: the dynamic radius list becomes a fixed-k nearest-neighbor
set (k static, default 32) with the radius acting as a weight cutoff —
neighbors beyond r get w = 0, so for any k >= |radius set| the result is
identical to the reference's semantics.  The optimizer is the shared LM/GN
driver rather than the reference's bespoke stacked-residual Gauss-Newton
(its `loss_ls`), which only differs in step strategy, not in the objective.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import soa
from ..ops.neighbors import knn_search
from ..precision import f32_matmuls
from ..solver import LsqConfig, LsqResult, lsq_solve
from .base import Cloud, Registration, estimate_covariances
from .gicp import _psum


class MultiPointConfig(NamedTuple):
    """Defaults follow fast_gicp_mp.hpp:24-33 (k=20 covariances, radius
    search; the reference leaves the radius to the caller — 1.0 here)."""

    search_radius: float = 1.0
    k_neighbors: int = 32
    k_correspondences: int = 20
    regularization: str = "plane"
    lsq: LsqConfig = LsqConfig()


def make_multipoint_objective(
    source,
    source_mask,
    source_covs,
    target,
    target_mask,
    target_covs,
    config: MultiPointConfig,
    axis_name=None,
):
    """(linearize_fn, error_fn): weighted-average multi-correspondence GICP."""
    n = source.shape[0]
    P = soa.cols_from_points(source)
    C_A = soa.sym_cols_from_covs(source_covs)
    # Packed target rows [mean(3) | sym cov(6)] for one-gather stats.
    target_pack = jnp.concatenate(
        [target, jnp.swapaxes(soa.sym_cols_from_covs(target_covs), 0, 1)],
        axis=1,
    )  # (N_t, 9)
    radius = config.search_radius

    def linearize(x):
        R = x[:3, :3]
        p_t = soa.transform_cols(x, P)  # (3, N)
        idx, sq_d = knn_search(
            jnp.swapaxes(p_t, 0, 1),
            target,
            target_mask,
            k=config.k_neighbors,
            approx=True,
        )
        # w = 1 - d/r, clamped at 0 outside the radius
        # (fast_gicp_mp_impl.hpp:158-161).
        w_nb = jnp.maximum(0.0, 1.0 - jnp.sqrt(sq_d) / radius)  # (N, k)
        sum_w = jnp.sum(w_nb, axis=1)  # (N,)
        valid = source_mask & (sum_w > 1e-6)
        inv_w = 1.0 / jnp.maximum(sum_w, 1e-6)
        rows = target_pack[idx]  # (N, k, 9)
        agg = jnp.einsum("nk,nkj->jn", w_nb, rows) * inv_w[None, :]  # (9, N)
        q = agg[0:3]  # weighted mean columns
        cov_B = agg[3:9]  # weighted symmetric-cov columns
        cov_rot = soa.rotate_sym_cols(R, C_A)
        M = soa.inv_sym_cols(cov_B + cov_rot) * valid[None, :]
        ones = jnp.ones(n, source.dtype)
        err, H, b = soa.linearize_cols(p_t, q, M, ones, valid)
        aux = (q, M, valid)
        return (
            _psum(err, axis_name),
            _psum(H, axis_name),
            _psum(b, axis_name),
            aux,
        )

    def error(x, aux):
        q, M, valid = aux
        p_t = soa.transform_cols(x, P)
        ones = jnp.ones(n, source.dtype)
        return _psum(soa.error_cols(p_t, q, M, ones, valid), axis_name)

    return linearize, error


@partial(jax.jit, static_argnames=("config",))
@f32_matmuls
def multipoint_align(
    source,
    source_mask,
    source_covs,
    target,
    target_mask,
    target_covs,
    guess,
    config: MultiPointConfig = MultiPointConfig(),
) -> LsqResult:
    """Single-device multi-correspondence GICP align."""
    linearize, error = make_multipoint_objective(
        source, source_mask, source_covs, target, target_mask, target_covs, config
    )
    return lsq_solve(linearize, error, guess.astype(source.dtype), config.lsq)


@dataclass
class FastGICPMultiPoints(Registration):
    """Class-API multi-correspondence radius GICP (experimental, as in the
    reference)."""

    search_radius: float = 1.0
    k_neighbors: int = 32
    k_correspondences: int = 20
    regularization: str = "plane"

    def set_search_radius(self, r: float) -> None:
        self.search_radius = float(r)

    def set_correspondence_randomness(self, k: int) -> None:
        self.k_correspondences = int(k)

    def set_regularization_method(self, method: str) -> None:
        self.regularization = method

    def set_num_threads(self, n: int) -> None:  # API parity no-op
        del n

    def _ensure_covariances(self, cloud: Cloud) -> None:
        estimate_covariances(
            cloud, "knn", self.k_correspondences, self.regularization
        )

    def _config(self) -> MultiPointConfig:
        return MultiPointConfig(
            search_radius=self.search_radius,
            k_neighbors=self.k_neighbors,
            k_correspondences=self.k_correspondences,
            regularization=self.regularization,
            lsq=self._lsq_config(),
        )

    def _compute(self, source: Cloud, target: Cloud, guess):
        self._ensure_covariances(source)
        self._ensure_covariances(target)
        return multipoint_align(
            source.points,
            source.mask,
            source.covs,
            target.points,
            target.mask,
            target.covs,
            guess,
            self._config(),
        )
