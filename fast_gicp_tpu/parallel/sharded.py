"""Multi-device registration via shard_map: points sharded, pose replicated.

The reference has no distributed execution at all (SURVEY.md §2.4) — its
parallelism is OpenMP threads and single-GPU thrust.  The TPU-native scaling
design: shard source points (and their covariances) across a device mesh,
keep the target/voxel map replicated, and `psum` the per-shard normal
equations (err, H, b) each linearization — 43 floats per device per
iteration, so scaling rides ICI latency, not bandwidth.  The whole LM loop
runs inside shard_map: every device deterministically computes the same pose
trajectory from the psummed quantities.

This mirrors (and replaces) the reference's per-thread H/b accumulators
(fast_gicp_impl.hpp:162-211): thread -> device, serial reduction -> psum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # JAX >= 0.4.35 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..models.base import centered_frame_align
from ..models.gicp import GICPConfig, make_gicp_objective
from ..models.ndt import NDTConfig, _ndt_voxelmap, make_ndt_objective
from ..models.vgicp import VGICPConfig, make_vgicp_objective
from ..ops.voxelmap import build_voxelmap, neighbor_offsets
from ..precision import f32_matmuls
from ..solver import lsq_solve

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def _check_divisible(n: int, mesh: Mesh, axis: str):
    size = mesh.shape[axis]
    if n % size != 0:
        raise ValueError(f"point count {n} not divisible by mesh axis {size}")


@partial(jax.jit, static_argnames=("mesh", "config"))
@f32_matmuls
def gicp_align_sharded(
    mesh,
    source,
    source_mask,
    source_covs,
    target,
    target_mask,
    target_covs,
    guess,
    config: GICPConfig = GICPConfig(),
):
    """GICP align with source points sharded over the mesh's first axis."""
    axis = mesh.axis_names[0]
    _check_divisible(source.shape[0], mesh, axis)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P(), P(), P()),
        out_specs=P(),
    )
    def run(src, smask, scovs, tgt, tmask, tcovs, g):
        lin, err = make_gicp_objective(
            src, smask, scovs, tgt, tmask, tcovs, config, axis_name=axis
        )
        return lsq_solve(lin, err, g, config.lsq)

    def body(src_c, tgt_c, g):
        return run(
            src_c, source_mask, source_covs, tgt_c, target_mask,
            target_covs, g,
        )

    # same target-centroid frame as the single-device align (see
    # base.centered_frame_align) so sharded and single solves agree
    return centered_frame_align(body, source, target, target_mask,
                                guess.astype(source.dtype))


@partial(jax.jit, static_argnames=("mesh", "config"))
@f32_matmuls
def vgicp_align_sharded(
    mesh,
    source,
    source_mask,
    source_covs,
    target,
    target_mask,
    target_covs,
    guess,
    config: VGICPConfig = VGICPConfig(),
):
    """VGICP align: source sharded, target voxel map replicated.

    The voxel map is built once (replicated computation outside shard_map);
    each device looks up its own source shard's correspondences and psums
    (err, H, b).
    """
    axis = mesh.axis_names[0]
    _check_divisible(source.shape[0], mesh, axis)
    offsets = jnp.asarray(
        neighbor_offsets(config.neighbor_search_method, config.neighbor_search_radius)
    )

    def body(src_c, tgt_c, g):
        vmap = build_voxelmap(
            tgt_c,
            target_mask,
            config.resolution,
            covs=target_covs,
            mode=config.voxel_accumulation,
            grid_dims=config.grid_dims,
        )
        vm_specs = jax.tree.map(lambda _: P(), vmap)

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(axis), vm_specs, P(), P()),
            out_specs=P(),
        )
        def run(src, smask, scovs, vm, offs, g_):
            lin, err = make_vgicp_objective(
                src, smask, scovs, vm, offs, config, axis_name=axis
            )
            return lsq_solve(lin, err, g_, config.lsq)

        return run(src_c, source_mask, source_covs, vmap, offsets, g)

    # same target-centroid frame as the single-device align
    return centered_frame_align(body, source, target, target_mask,
                                guess.astype(source.dtype))


@partial(jax.jit, static_argnames=("mesh", "config"))
@f32_matmuls
def ndt_align_sharded(
    mesh,
    source,
    source_mask,
    target,
    target_mask,
    guess,
    config: NDTConfig = NDTConfig(),
):
    """NDT align (P2D: raw source points sharded; D2D: source voxels
    sharded), target voxel map replicated."""
    axis = mesh.axis_names[0]
    offsets = jnp.asarray(
        neighbor_offsets(config.neighbor_search_method, config.neighbor_search_radius)
    )
    p2d = config.distance_mode == "p2d"

    def body(src_c, tgt_c, g):
        target_vm = _ndt_voxelmap(
            tgt_c, target_mask, config.resolution, grid_dims=config.grid_dims
        )
        if p2d:
            src_means, src_mask, src_covs = src_c, source_mask, None
        else:
            from ..models.ndt import _compact_source_voxels

            source_vm = _ndt_voxelmap(
                src_c, source_mask, config.resolution,
                grid_dims=config.grid_dims,
            )
            src_means, src_mask, src_covs = _compact_source_voxels(
                source_vm, config.max_source_voxels
            )
        _check_divisible(src_means.shape[0], mesh, axis)

        vm_specs = jax.tree.map(lambda _: P(), target_vm)
        cov_spec = P() if src_covs is None else P(axis)
        src_covs_in = (
            jnp.zeros((1,), src_means.dtype) if src_covs is None else src_covs
        )

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(axis), P(axis), cov_spec, vm_specs, P(), P()),
            out_specs=P(),
        )
        def run(sm, smask, scovs, vm, offs, g_):
            lin, err = make_ndt_objective(
                sm,
                smask,
                None if src_covs is None else scovs,
                vm,
                offs,
                config,
                axis_name=axis,
            )
            return lsq_solve(lin, err, g_, config.lsq)

        return run(src_means, src_mask, src_covs_in, target_vm, offsets, g)

    # same target-centroid frame as the single-device align
    return centered_frame_align(body, source, target, target_mask,
                                guess.astype(source.dtype))
