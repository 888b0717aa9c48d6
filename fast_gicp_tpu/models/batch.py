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
from .base import centered_frame_align
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
        def run(sp_c, tp_c, g_c):
            lin, err = make_gicp_objective(
                sp_c, sm, sc, tp_c, tm, tc, config
            )
            return lsq_solve(lin, err, g_c, config.lsq)

        # same target-centroid frame as the single align (per pair)
        return centered_frame_align(run, sp, tp, tm, g)

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
        def run(sp_c, tp_c, g_c):
            vmap_ = build_voxelmap(
                tp_c, tm, config.resolution, covs=tc,
                mode=config.voxel_accumulation, grid_dims=config.grid_dims,
            )
            lin, err = make_vgicp_objective(
                sp_c, sm, sc, vmap_, offsets, config
            )
            return lsq_solve(lin, err, g_c, config.lsq)

        return centered_frame_align(run, sp, tp, tm, g)

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
        def run(sp_c, tp_c, g_c):
            target_vm = _ndt_voxelmap(
                tp_c, tm, config.resolution, grid_dims=config.grid_dims
            )
            if config.distance_mode == "p2d":
                lin, err = make_ndt_objective(
                    sp_c, sm, None, target_vm, offsets, config
                )
            else:
                from .ndt import _compact_source_voxels

                source_vm = _ndt_voxelmap(
                    sp_c, sm, config.resolution, grid_dims=config.grid_dims
                )
                means, mask, covs = _compact_source_voxels(
                    source_vm, config.max_source_voxels
                )
                lin, err = make_ndt_objective(
                    means, mask, covs, target_vm, offsets, config,
                )
            return lsq_solve(lin, err, g_c, config.lsq)

        return centered_frame_align(run, sp, tp, tm, g)

    return jax.vmap(one)(
        sources, source_masks, targets, target_masks,
        guesses.astype(sources.dtype),
    )
