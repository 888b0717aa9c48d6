"""Batched multi-pair alignment: vmap over registrations.

The reference is strictly one-pair-at-a-time (a PCL Registration object).
On TPU, every stage of an align — voxel build, correspondence lookup, the
LM while_loop itself — is fixed-shape dataflow, so whole registrations vmap
cleanly.  A batch of B scan pairs runs as one fused program with B-fold
arithmetic intensity: this is how scan-to-scan odometry (KITTI-style, all
pairs independent) reaches hundreds of frames/sec on one chip.

All clouds in a batch share one padded size (mask the rest).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..precision import f32_matmuls
from .gicp import GICPConfig, make_gicp_objective
from .ndt import NDTConfig, _ndt_voxelmap, make_ndt_objective
from .vgicp import VGICPConfig, make_vgicp_objective
from ..ops.voxelmap import build_voxelmap, neighbor_offsets
from ..solver import lsq_solve


@partial(jax.jit, static_argnames=("config",))
@f32_matmuls
def gicp_align_batch(
    sources, source_masks, source_covs, targets, target_masks, target_covs,
    guesses, config: GICPConfig = GICPConfig(),
):
    """Batched GICP: all args carry a leading batch dim; returns batched
    LsqResult."""

    def one(sp, sm, sc, tp, tm, tc, g):
        lin, err = make_gicp_objective(sp, sm, sc, tp, tm, tc, config)
        return lsq_solve(lin, err, g, config.lsq)

    return jax.vmap(one)(
        sources, source_masks, source_covs, targets, target_masks, target_covs,
        guesses.astype(sources.dtype),
    )


@partial(jax.jit, static_argnames=("config",))
@f32_matmuls
def vgicp_align_batch(
    sources, source_masks, source_covs, targets, target_masks, target_covs,
    guesses, config: VGICPConfig = VGICPConfig(),
):
    """Batched VGICP: B voxel maps built and solved in one fused program."""
    offsets = jnp.asarray(
        neighbor_offsets(config.neighbor_search_method, config.neighbor_search_radius)
    )

    def one(sp, sm, sc, tp, tm, tc, g):
        vmap_ = build_voxelmap(
            tp, tm, config.resolution, covs=tc,
            mode=config.voxel_accumulation, grid_dims=config.grid_dims,
        )
        lin, err = make_vgicp_objective(sp, sm, sc, vmap_, offsets, config)
        return lsq_solve(lin, err, g, config.lsq)

    return jax.vmap(one)(
        sources, source_masks, source_covs, targets, target_masks, target_covs,
        guesses.astype(sources.dtype),
    )


@partial(jax.jit, static_argnames=("config",))
@f32_matmuls
def ndt_align_batch(
    sources, source_masks, targets, target_masks, guesses,
    config: NDTConfig = NDTConfig(),
):
    """Batched NDT (P2D or D2D)."""
    offsets = jnp.asarray(
        neighbor_offsets(config.neighbor_search_method, config.neighbor_search_radius)
    )

    def one(sp, sm, tp, tm, g):
        target_vm = _ndt_voxelmap(
            tp, tm, config.resolution, grid_dims=config.grid_dims
        )
        if config.distance_mode == "p2d":
            lin, err = make_ndt_objective(sp, sm, None, target_vm, offsets, config)
        else:
            from .ndt import _compact_source_voxels

            source_vm = _ndt_voxelmap(
                sp, sm, config.resolution, grid_dims=config.grid_dims
            )
            means, mask, covs = _compact_source_voxels(
                source_vm, config.max_source_voxels
            )
            lin, err = make_ndt_objective(
                means, mask, covs, target_vm, offsets, config,
            )
        return lsq_solve(lin, err, g, config.lsq)

    return jax.vmap(one)(
        sources, source_masks, targets, target_masks,
        guesses.astype(sources.dtype),
    )
