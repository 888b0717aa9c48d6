"""FastVGICP-equivalent: voxelized GICP as one jitted LM solve.

Covers the reference's `FastVGICP` (fast_vgicp.hpp:24-81, impl) and the
objective of `FastVGICPCuda` (fast_vgicp_cuda.cu, compute_derivatives.cu):
a Gaussian voxel map built from the target cloud (additive / additive
weighted / multiplicative accumulation), correspondences = (source point x
every existing neighbor voxel) over DIRECT1/7/27/RADIUS offsets, per-pair
Mahalanobis (cov_voxel + R C_src R^T)^-1 frozen at each linearization, and
residual weight w = sqrt(voxel.num_points) (fast_vgicp_impl.hpp:149).

The covariance path is selectable like the CUDA variant's
NearestNeighborMethod (fast_vgicp_cuda.hpp:21): "knn" (CPU_PARALLEL_KDTREE /
GPU_BRUTEFORCE equivalents — same brute-force math here) or "rbf"
(GPU_RBF_KERNEL, the reference's fastest config and the most MXU-friendly).

The voxel map is rebuilt from the target on every align, matching the
reference's lazy rebuild semantics (fast_vgicp_impl.hpp:66-70, :120-123);
covariances are cached per cloud and survive swap_source_and_target.
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
from ..ops.covariance import (
    covariances_from_neighbors_jit,
    knn_covariances_jit,
    rbf_covariances_jit,
)
from ..ops.reduction import error_reduce, linearize_reduce
from ..ops.voxelmap import (
    auto_grid_dims,
    build_voxelmap,
    gather_voxel_stats,
    lookup_voxels,
    neighbor_offsets,
    voxel_coord,
)
from ..precision import f32_matmuls
from ..solver import LsqConfig, LsqResult, lsq_solve
from .base import Cloud, Registration
from .gicp import GICPConfig


class VGICPConfig(NamedTuple):
    """Defaults match fast_vgicp_impl.hpp:22-24.

    grid_dims: static (Dx, Dy, Dz) -> dense-grid voxel lookup (single
    gather, fastest); None -> open-addressing hash (unbounded scenes).
    The class API auto-sizes the grid from the target cloud's extent.
    """

    resolution: float = 1.0
    neighbor_search_method: str = "direct1"
    neighbor_search_radius: float = 1.5
    voxel_accumulation: str = "additive"
    k_correspondences: int = 20
    regularization: str = "plane"
    grid_dims: tuple | None = None
    lsq: LsqConfig = LsqConfig()


def make_vgicp_objective(
    source,
    source_mask,
    source_covs,
    vmap,
    offsets,
    config: VGICPConfig,
    axis_name=None,
):
    """(linearize_fn, error_fn) for the voxelized GICP objective.

    aux freezes (voxel ids, validity, Mahalanobis, weights) across LM inner
    trials, matching voxel_correspondences_/voxel_mahalanobis_ reuse
    (fast_vgicp_impl.hpp:101-115 vs :183-204).
    """
    n = source.shape[0]
    k = offsets.shape[0]

    def _psum(v):
        return v if axis_name is None else jax.lax.psum(v, axis_name)

    def correspondences(x):
        p_t = se3.transform_points(x, source)  # (N, 3)
        coords = voxel_coord(p_t, vmap.resolution)  # (N, 3) int32
        qc = coords[:, None, :] + offsets[None, :, :]  # (N, K, 3)
        vids = lookup_voxels(vmap, qc)  # (N, K)
        valid = (vids >= 0) & source_mask[:, None]
        safe = jnp.maximum(vids, 0)
        return p_t, safe, valid

    def linearize(x):
        R = x[:3, :3]
        p_t, vids, valid = correspondences(x)
        mu_B, cov_B, n_B = gather_voxel_stats(vmap, vids)  # one row-gather

        cov_rot = se3.rotate_covs(R, source_covs)  # (N, 3, 3)
        M = linalg3.inv3(cov_B + cov_rot[:, None]) * valid[..., None, None]
        w = jnp.sqrt(n_B)

        flat = lambda a: a.reshape((n * k,) + a.shape[2:])
        p_flat = jnp.broadcast_to(p_t[:, None, :], (n, k, 3))
        err, H, b = linearize_reduce(
            flat(p_flat), flat(mu_B), flat(M), flat(w), flat(valid)
        )
        aux = (vids, valid, M, w, mu_B)
        return _psum(err), _psum(H), _psum(b), aux

    def error(x, aux):
        vids, valid, M, w, mu_B = aux
        p_t = se3.transform_points(x, source)
        flat = lambda a: a.reshape((n * k,) + a.shape[2:])
        p_flat = jnp.broadcast_to(p_t[:, None, :], (n, k, 3))
        return _psum(
            error_reduce(flat(p_flat), flat(mu_B), flat(M), flat(w), flat(valid))
        )

    return linearize, error


@partial(jax.jit, static_argnames=("config",))
@f32_matmuls
def vgicp_align(
    source,
    source_mask,
    source_covs,
    target,
    target_mask,
    target_covs,
    guess,
    config: VGICPConfig = VGICPConfig(),
) -> LsqResult:
    """Single-device voxelized-GICP align (voxel map built in-graph)."""
    vmap = build_voxelmap(
        target,
        target_mask,
        config.resolution,
        covs=target_covs,
        mode=config.voxel_accumulation,
        grid_dims=config.grid_dims,
    )
    offsets = jnp.asarray(
        neighbor_offsets(
            config.neighbor_search_method, config.neighbor_search_radius
        )
    )
    linearize, error = make_vgicp_objective(
        source, source_mask, source_covs, vmap, offsets, config
    )
    return lsq_solve(linearize, error, guess.astype(source.dtype), config.lsq)


@dataclass
class FastVGICP(Registration):
    """Class-API VGICP; also hosts the CUDA variant's covariance selector
    (`set_nearest_neighbor_method("rbf")` == GPU_RBF_KERNEL,
    fast_vgicp_cuda.hpp:21-26) and kernel parameters
    (`set_kernel_params`, fast_vgicp_cuda_impl.hpp:44-50)."""

    resolution: float = 1.0
    neighbor_search_method: str = "direct1"
    neighbor_search_radius: float = 1.5
    voxel_accumulation: str = "additive"
    k_correspondences: int = 20
    regularization: str = "plane"
    covariance_estimation: str = "knn"  # "knn" | "rbf"
    kernel_width: float = 0.5
    kernel_max_dist: float = 3.0
    # "auto": dense grid sized from the target extent (fastest); None: hash
    # map (unbounded scenes); or explicit static (Dx, Dy, Dz).
    grid_dims: object = "auto"

    def set_resolution(self, r: float) -> None:
        self.resolution = float(r)

    def set_neighbor_search_method(self, method: str, radius: float = None) -> None:
        self.neighbor_search_method = method
        if radius is not None:
            self.neighbor_search_radius = float(radius)

    def set_voxel_accumulation_mode(self, mode: str) -> None:
        self.voxel_accumulation = mode

    def set_correspondence_randomness(self, k: int) -> None:
        self.k_correspondences = int(k)

    def set_regularization_method(self, method: str) -> None:
        self.regularization = method

    def set_num_threads(self, n: int) -> None:  # API parity no-op
        del n

    def set_nearest_neighbor_method(self, method: str) -> None:
        # "knn" = GPU_BRUTEFORCE equivalent (on-device brute force),
        # "rbf" = GPU_RBF_KERNEL, "kdtree" = CPU_PARALLEL_KDTREE (native
        # host kd-tree feeding device covariance) — fast_vgicp_cuda.hpp:21.
        if method not in ("knn", "rbf", "kdtree"):
            raise ValueError(
                "covariance estimation must be 'knn', 'rbf', or 'kdtree'"
            )
        self.covariance_estimation = method

    def set_kernel_params(self, width: float, max_dist: float = None) -> None:
        # Default max_dist = 5 * width like fast_vgicp_cuda_impl.hpp:46-50.
        self.kernel_width = float(width)
        self.kernel_max_dist = (
            float(max_dist) if max_dist is not None else 5.0 * float(width)
        )

    def _ensure_covariances(self, cloud: Cloud) -> None:
        if cloud.covs is not None:
            return
        if self.covariance_estimation == "kdtree":
            from .. import native

            # Tree over the real points only (padding sits at the origin and
            # must not pollute neighborhoods); padded queries yield garbage
            # covariances that downstream masks drop.
            idx, _ = native.knn_search(
                cloud.host_points[: cloud.size],
                cloud.host_points,
                self.k_correspondences,
            )
            cloud.covs = covariances_from_neighbors_jit(
                cloud.points, jnp.asarray(idx), method=self.regularization
            )
        elif self.covariance_estimation == "rbf":
            cloud.covs = rbf_covariances_jit(
                cloud.points,
                cloud.mask,
                kernel_width=self.kernel_width,
                max_dist=self.kernel_max_dist,
                method=self.regularization,
            )
        else:
            cloud.covs = knn_covariances_jit(
                cloud.points,
                cloud.mask,
                k=self.k_correspondences,
                method=self.regularization,
            )

    def set_grid_dims(self, dims) -> None:
        self.grid_dims = tuple(dims) if dims not in (None, "auto") else dims

    def _grid_dims(self, target: Cloud):
        if self.grid_dims == "auto":
            return auto_grid_dims(
                target.host_points[: target.size], self.resolution
            )
        return self.grid_dims

    def _config(self, grid_dims=None) -> VGICPConfig:
        return VGICPConfig(
            resolution=self.resolution,
            neighbor_search_method=self.neighbor_search_method,
            neighbor_search_radius=self.neighbor_search_radius,
            voxel_accumulation=self.voxel_accumulation,
            k_correspondences=self.k_correspondences,
            regularization=self.regularization,
            grid_dims=grid_dims,
            lsq=self._lsq_config(),
        )

    def _compute(self, source: Cloud, target: Cloud, guess):
        self._ensure_covariances(source)
        self._ensure_covariances(target)
        return vgicp_align(
            source.points,
            source.mask,
            source.covs,
            target.points,
            target.mask,
            target.covs,
            guess,
            self._config(grid_dims=self._grid_dims(target)),
        )


# Alias mirroring the reference's CUDA class name: same objective, the
# "device" here is the TPU itself.
FastVGICPCuda = FastVGICP
