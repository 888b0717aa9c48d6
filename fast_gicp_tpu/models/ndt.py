"""NDT (P2D / D2D) registration — the NDTCuda-equivalent.

Re-designs the reference's `NDTCuda` (ndt_cuda.hpp:22-71, ndt_cuda.cu:13-181,
ndt_compute_derivatives.cu): voxel maps built from RAW points with NDT
finalization cov = E[x x^T] - mu mu^T plus MIN_EIG regularization; P2D scores
raw source points against target voxel Gaussians (M = cov_B^-1), D2D scores
source voxel Gaussians against target voxels with
M = (cov_B + R_eval C_A R_eval^T)^-1; both use the Cauchy robust weight
w = c^2 / (c^2 + |e|^2) with c = voxel_resolution
(ndt_compute_derivatives.cu:15-18, :78, :150) and skip voxels with <= 6
points (:61-63, :132-134).

Key LM subtlety preserved: M is frozen at the linearization point (R_eval)
but the Cauchy weight depends on the TRIAL error — inner LM trials recompute
w from the trial pose, exactly like the reference's fused kernels which
evaluate w inline per call.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import se3
from ..ops import linalg3
from ..ops.covariance import regularize_covariances
from ..ops.reduction import error_reduce, linearize_reduce
from ..ops.voxelmap import (
    VoxelMap,
    build_voxelmap,
    gather_voxel_stats,
    lookup_voxels,
    neighbor_offsets,
    voxel_coord,
)
from ..precision import f32_matmuls
from ..solver import LsqConfig, LsqResult, lsq_solve
from .base import Cloud, Registration

_MIN_VOXEL_POINTS = 6  # voxels with <= 6 points are skipped


class NDTConfig(NamedTuple):
    """Defaults match ndt_cuda.cu:21-22 (D2D, DIRECT7, resolution 1.0)."""

    resolution: float = 1.0
    distance_mode: str = "d2d"  # "p2d" | "d2d"
    neighbor_search_method: str = "direct7"
    neighbor_search_radius: float = 1.5
    lsq: LsqConfig = LsqConfig()


def _ndt_voxelmap(points, mask, resolution) -> VoxelMap:
    """NDT voxel map: raw-point statistics + MIN_EIG regularization
    (gaussian_voxelmap.cu ndt_finalize_voxels_kernel + ndt_cuda.cu:120-140)."""
    vm = build_voxelmap(points, mask, resolution, mode="raw")
    covs = regularize_covariances(vm.covs, "min_eig")
    # Keep the gather-optimized packed stats in sync with the regularized covs.
    c = covs.shape[0]
    packed = vm.packed.at[:, 3:12].set(covs.reshape(c, 9))
    return vm._replace(covs=covs, packed=packed)


def _cauchy_weight(resolution, e_norm_sq):
    c_sq = resolution * resolution
    return c_sq / (c_sq + e_norm_sq)


def make_ndt_objective(
    src_means,
    src_mask,
    src_covs,  # None for P2D
    vmap: VoxelMap,
    offsets,
    config: NDTConfig,
    axis_name=None,
):
    """(linearize_fn, error_fn) for P2D/D2D NDT."""
    n = src_means.shape[0]
    k = offsets.shape[0]

    def _psum(v):
        return v if axis_name is None else jax.lax.psum(v, axis_name)

    def correspondences(x):
        p_t = se3.transform_points(x, src_means)
        coords = voxel_coord(p_t, vmap.resolution)
        qc = coords[:, None, :] + offsets[None, :, :]
        vids = lookup_voxels(vmap, qc)
        safe = jnp.maximum(vids, 0)
        valid = (
            (vids >= 0)
            & src_mask[:, None]
            & (vmap.counts[safe] > _MIN_VOXEL_POINTS)
        )
        return p_t, safe, valid

    def flat(a):
        return a.reshape((n * k,) + a.shape[2:])

    def weights(p_t, mu_B, valid):
        e_sq = jnp.sum((mu_B - p_t[:, None, :]) ** 2, axis=-1)
        return jnp.where(valid, _cauchy_weight(vmap.resolution, e_sq), 0.0)

    def linearize(x):
        R = x[:3, :3]
        p_t, vids, valid = correspondences(x)
        mu_B, cov_B, _n_B = gather_voxel_stats(vmap, vids)
        if src_covs is None:  # P2D: M = cov_B^-1
            M = linalg3.inv3(cov_B)
        else:  # D2D: M = (cov_B + R C_A R^T)^-1 at the linearization point
            cov_rot = se3.rotate_covs(R, src_covs)
            M = linalg3.inv3(cov_B + cov_rot[:, None])
        M = M * valid[..., None, None]
        w = weights(p_t, mu_B, valid)
        p_flat = jnp.broadcast_to(p_t[:, None, :], (n, k, 3))
        err, H, b = linearize_reduce(
            flat(p_flat), flat(mu_B), flat(M), flat(w), flat(valid)
        )
        aux = (vids, valid, M, mu_B)
        return _psum(err), _psum(H), _psum(b), aux

    def error(x, aux):
        vids, valid, M, mu_B = aux
        p_t = se3.transform_points(x, src_means)
        w = weights(p_t, mu_B, valid)  # trial-pose Cauchy weight
        p_flat = jnp.broadcast_to(p_t[:, None, :], (n, k, 3))
        return _psum(
            error_reduce(flat(p_flat), flat(mu_B), flat(M), flat(w), flat(valid))
        )

    return linearize, error


@partial(jax.jit, static_argnames=("config",))
@f32_matmuls
def ndt_align(
    source,
    source_mask,
    target,
    target_mask,
    guess,
    config: NDTConfig = NDTConfig(),
) -> LsqResult:
    """Single-device NDT align; voxel maps built in-graph from raw points."""
    target_vm = _ndt_voxelmap(target, target_mask, config.resolution)
    offsets = jnp.asarray(
        neighbor_offsets(
            config.neighbor_search_method, config.neighbor_search_radius
        )
    )
    if config.distance_mode == "p2d":
        lin, err = make_ndt_objective(
            source, source_mask, None, target_vm, offsets, config
        )
    elif config.distance_mode == "d2d":
        source_vm = _ndt_voxelmap(source, source_mask, config.resolution)
        src_mask = source_vm.counts > 0
        lin, err = make_ndt_objective(
            source_vm.means, src_mask, source_vm.covs, target_vm, offsets, config
        )
    else:
        raise ValueError(f"unknown NDT distance mode: {config.distance_mode}")
    return lsq_solve(lin, err, guess.astype(source.dtype), config.lsq)


@dataclass
class NDTCuda(Registration):
    """Class-API NDT (name kept for reference parity; runs on TPU)."""

    resolution: float = 1.0
    distance_mode: str = "d2d"
    neighbor_search_method: str = "direct7"
    neighbor_search_radius: float = 1.5

    def set_resolution(self, r: float) -> None:
        self.resolution = float(r)

    def set_distance_mode(self, mode: str) -> None:
        if mode not in ("p2d", "d2d"):
            raise ValueError("distance mode must be 'p2d' or 'd2d'")
        self.distance_mode = mode

    def set_neighbor_search_method(self, method: str, radius: float = None) -> None:
        self.neighbor_search_method = method
        if radius is not None:
            self.neighbor_search_radius = float(radius)

    def _config(self) -> NDTConfig:
        return NDTConfig(
            resolution=self.resolution,
            distance_mode=self.distance_mode,
            neighbor_search_method=self.neighbor_search_method,
            neighbor_search_radius=self.neighbor_search_radius,
            lsq=self._lsq_config(),
        )

    def _compute(self, source: Cloud, target: Cloud, guess):
        return ndt_align(
            source.points,
            source.mask,
            target.points,
            target.mask,
            guess,
            self._config(),
        )


NDT = NDTCuda
