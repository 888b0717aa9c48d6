"""Multi-device persistent scan-to-map odometry: the voxel map sharded by
ownership hash across the mesh.

The north-star capability (SURVEY.md §2.4, §5): a world voxel map too large
(or too hot) for one chip, partitioned across devices.  Design:

  * OWNERSHIP: voxel with integer coord c lives on device
    remix(hash(c)) % n_devices, where remix draws on different bits than
    the lut slot index (which uses hash & (T-1)) — otherwise on a
    power-of-two mesh every device's voxels would share slot residues and
    concentrate inserts d-fold.  Deterministic, no directory, balanced.
  * UPDATE: every device receives the (replicated, small) registered scan,
    keeps exactly the points whose voxel it owns, and fuses them into its
    local shard with the same fixed-shape segment/scatter update as the
    single-device map.  Zero inter-device communication.
  * ALIGN: every device looks up the (replicated) transformed source in its
    own shard — a coord misses everywhere except its owner — computes its
    partial (err, H, b), and `psum`s.  Per LM iteration the wire carries
    6x6 + 6 + 1 floats per device; the whole solve stays inside one
    shard_map'd jit, every device deterministically computing the same
    pose.

Wrapped as `ShardedScanToMapOdometry`, the multi-chip mirror of
models.scan_to_map.ScanToMapOdometry.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..models.scan_to_map import (
    MapState,
    ScanToMapConfig,
    ScanToMapOdometry,
    empty_map,
    grow_map,
    map_as_voxelmap,
    update_map,
)
from ..models.vgicp import VGICPConfig, make_vgicp_objective
from ..ops.voxelmap import _hash_coords, neighbor_offsets, voxel_coord
from ..precision import f32_matmuls
from ..solver import lsq_solve
from .sharded import DATA_AXIS, make_mesh, shard_map


class ShardedMapState(NamedTuple):
    """Global view of the device-sharded map: leading rows sharded, one
    num_voxels per device, resolution replicated."""

    sums: jax.Array  # (D * C_local, 13) sharded over devices
    coords: jax.Array  # (D * C_local, 3)
    lut: jax.Array  # (D * T_local, 4)
    num_voxels: jax.Array  # (D,) per-device live-voxel counts
    resolution: jax.Array  # () replicated


def empty_sharded_map(
    mesh, capacity_per_device: int, resolution: float
) -> ShardedMapState:
    d = mesh.shape[mesh.axis_names[0]]
    proto = empty_map(capacity_per_device, resolution)
    return ShardedMapState(
        sums=jnp.tile(proto.sums, (d, 1)),
        coords=jnp.tile(proto.coords, (d, 1)),
        lut=jnp.tile(proto.lut, (d, 1)),
        num_voxels=jnp.zeros((d,), jnp.int32),
        resolution=proto.resolution,
    )


def _local_state(sums, coords, lut, nv, res) -> MapState:
    return MapState(
        sums=sums, coords=coords, lut=lut, num_voxels=nv[0], resolution=res
    )


def _state_specs(axis):
    return ShardedMapState(
        sums=P(axis), coords=P(axis), lut=P(axis), num_voxels=P(axis),
        resolution=P(),
    )


@partial(jax.jit, static_argnames=("mesh",), donate_argnums=(1,))
@f32_matmuls
def update_sharded_map(
    mesh, state: ShardedMapState, points_world, covs_world, mask
) -> ShardedMapState:
    """Fuse a registered (world-frame) scan into the sharded map."""
    axis = mesh.axis_names[0]
    d = mesh.shape[axis]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(_state_specs(axis), P(), P(), P()),
        out_specs=_state_specs(axis),
    )
    def run(st, pts, covs, msk):
        local = _local_state(*st[:4], st.resolution)
        me = jax.lax.axis_index(axis)
        # Ownership must NOT reuse the lut slot bits: slot = hash & (T-1)
        # uses the low bits, so hash %% d on a power-of-two mesh would make
        # every device's home slots satisfy slot == me (mod d), concentrating
        # inserts d-fold. Re-mix and take HIGH bits instead.
        h = _hash_coords(voxel_coord(pts, st.resolution))
        h = (h ^ (h >> 16)) * jnp.uint32(0x9E3779B9)
        own = ((h >> 8) % jnp.uint32(d)).astype(jnp.int32) == me
        new = update_map(local, pts, covs, msk & own)
        return ShardedMapState(
            sums=new.sums,
            coords=new.coords,
            lut=new.lut,
            num_voxels=new.num_voxels[None],
            resolution=st.resolution,
        )

    return run(state, points_world, covs_world, mask)


@partial(jax.jit, static_argnames=("mesh", "new_capacity_per_device"))
def grow_sharded_map(
    mesh, state: ShardedMapState, new_capacity_per_device: int
) -> ShardedMapState:
    """Migrate every shard into a larger local allocation.

    Growth is pure per-device computation (each shard rebuilds its own lut
    at the new table size — the TPU analogue of the reference GPU map's
    grow-on-failure rebuild, gaussian_voxelmap.cu:265-285); no collective
    is needed because voxel ownership (a pure hash) is unchanged.
    """
    axis = mesh.axis_names[0]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(_state_specs(axis),),
        out_specs=_state_specs(axis),
    )
    def run(st):
        local = _local_state(*st[:4], st.resolution)
        new = grow_map(local, new_capacity_per_device)
        return ShardedMapState(
            sums=new.sums,
            coords=new.coords,
            lut=new.lut,
            num_voxels=new.num_voxels[None],
            resolution=st.resolution,
        )

    return run(state)


@partial(jax.jit, static_argnames=("mesh", "config"))
@f32_matmuls
def align_to_sharded_map(
    mesh, state: ShardedMapState, source, source_mask, source_covs, guess,
    config: ScanToMapConfig,
):
    """Register a (replicated) scan against the sharded map; every device
    solves the same LM trajectory from psummed normal equations."""
    axis = mesh.axis_names[0]
    offsets = jnp.asarray(
        neighbor_offsets(
            config.neighbor_search_method, config.neighbor_search_radius
        )
    )
    vcfg = VGICPConfig(
        resolution=config.resolution,
        neighbor_search_method=config.neighbor_search_method,
        neighbor_search_radius=config.neighbor_search_radius,
        lsq=config.lsq,
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(_state_specs(axis), P(), P(), P(), P(), P()),
        out_specs=P(),
    )
    def run(st, src, smask, scovs, offs, g):
        local = _local_state(*st[:4], st.resolution)
        vm = map_as_voxelmap(local)
        lin, err = make_vgicp_objective(
            src, smask, scovs, vm, offs, vcfg, axis_name=axis
        )
        return lsq_solve(lin, err, g, config.lsq)

    return run(
        state, source, source_mask, source_covs, offsets,
        guess.astype(source.dtype),
    )


class ShardedScanToMapOdometry(ScanToMapOdometry):
    """Multi-device mirror of ScanToMapOdometry: persistent hash-sharded
    world map, constant-velocity warm start, scan fusion at the estimate.

    All per-frame logic (gate, delta bookkeeping, fusion masking) is
    inherited from ScanToMapOdometry — only the align/fuse hooks differ."""

    def __init__(
        self,
        config: ScanToMapConfig = ScanToMapConfig(),
        mesh=None,
        covariance: str = "rbf",
    ):
        super().__init__(config, covariance=covariance)
        self.mesh = mesh if mesh is not None else make_mesh()
        d = self.mesh.shape[self.mesh.axis_names[0]]
        cap_local = max(1, config.capacity // d)
        self.state = empty_sharded_map(self.mesh, cap_local, config.resolution)

    def _align(self, pts, mask, covs, guess):
        return align_to_sharded_map(
            self.mesh, self.state, pts, mask, covs, guess, self.config
        )

    def _fuse(self, world_pts, world_covs, fuse_mask):
        self.state = update_sharded_map(
            self.mesh, self.state, world_pts, world_covs, fuse_mask
        )

    def _maybe_grow(self) -> None:
        """Grow every shard 2x when the fullest shard passes 70% (checked
        every grow_check_every frames; the fill read synchronizes, so it is
        amortized).  Growth is per-device-local — see grow_sharded_map."""
        self._frames_since_check += 1
        if self._frames_since_check < self.config.grow_check_every:
            return
        self._frames_since_check = 0
        d = self.mesh.shape[self.mesh.axis_names[0]]
        cap_local = self.state.sums.shape[0] // d
        max_local = max(1, self.config.max_capacity // d)
        nv = int(jax.device_get(jnp.max(self.state.num_voxels)))
        if cap_local >= max_local:
            if nv > 0.95 * cap_local and not getattr(self, "_warned_full", False):
                self._warned_full = True
                import warnings

                warnings.warn(
                    f"sharded map at max capacity ({nv}/{cap_local} voxels "
                    "on the fullest shard); new voxels will be dropped"
                )
            return
        if nv > 0.7 * cap_local:
            self.state = grow_sharded_map(
                self.mesh, self.state, min(cap_local * 2, max_local)
            )
