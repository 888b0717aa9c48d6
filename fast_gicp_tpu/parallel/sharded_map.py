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
from ..ops.voxelmap import (
    _hash_coords,
    lookup_voxels_cols,
    neighbor_offsets,
    voxel_coord,
)
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


def _owner_hash_np(coords, d: int):
    """NumPy mirror of the device ownership hash (update_sharded_map /
    _owner_of): voxel coord -> owning device, bit-exact with the jnp path
    (same uint32 modular arithmetic), usable without any live backend."""
    import numpy as np

    c = np.asarray(coords).astype(np.uint32)
    with np.errstate(over="ignore"):
        h = (
            (c[..., 0] * np.uint32(73856093))
            ^ (c[..., 1] * np.uint32(19349669))
            ^ (c[..., 2] * np.uint32(83492791))
        )
        h = (h ^ (h >> np.uint32(16))) * np.uint32(0x9E3779B9)
    return ((h >> np.uint32(8)) % np.uint32(d)).astype(np.int64)


def merge_sharded_map(state: ShardedMapState, capacity: int = None):
    """Merge the per-device shards into ONE single-device `MapState`
    (host-side cold path): ownership is disjoint, so the merged map is the
    concatenation of every shard's live rows with a rebuilt lut.  Pairs
    with `distribute_map` for checkpoint/resume across meshes of ANY size
    (including down to a single device) — `save_map(path,
    merge_sharded_map(st))` then `distribute_map(mesh, load_map(path))`."""
    import numpy as np

    from ..models.scan_to_map import map_from_voxels

    sums = np.asarray(state.sums)
    coords = np.asarray(state.coords)
    nv = np.asarray(state.num_voxels)
    d = nv.shape[0]
    cap_local = sums.shape[0] // d
    rows_s, rows_c = [], []
    for s in range(d):
        k = int(nv[s])
        rows_s.append(sums[s * cap_local : s * cap_local + k])
        rows_c.append(coords[s * cap_local : s * cap_local + k])
    return map_from_voxels(
        np.concatenate(rows_s), np.concatenate(rows_c),
        float(np.asarray(state.resolution)), capacity,
    )


def distribute_map(mesh, state, capacity_per_device: int = None
                   ) -> ShardedMapState:
    """Partition a single-device `MapState` onto the mesh by the ownership
    hash — resume a `save_map`/`merge_sharded_map` checkpoint on any device
    count.  `capacity_per_device` defaults to 2x the fullest shard's row
    count (growth headroom), rounded to a power of two."""
    import numpy as np

    from ..models.scan_to_map import map_from_voxels
    from ..ops.voxelmap import next_pow2

    d = mesh.shape[mesh.axis_names[0]]
    n = int(np.asarray(state.num_voxels))
    coords = np.asarray(state.coords)[:n]
    sums = np.asarray(state.sums)[:n]
    res = float(np.asarray(state.resolution))
    owner = _owner_hash_np(coords, d)
    counts = np.bincount(owner, minlength=d)
    if capacity_per_device is None:
        capacity_per_device = max(256, next_pow2(2 * max(1, int(counts.max()))))
    if counts.max() > capacity_per_device:
        raise ValueError(
            f"fullest shard needs {int(counts.max())} rows > "
            f"capacity_per_device {capacity_per_device}"
        )
    shards = [
        map_from_voxels(sums[owner == s], coords[owner == s], res,
                        capacity_per_device)
        for s in range(d)
    ]
    return ShardedMapState(
        sums=jnp.concatenate([sh.sums for sh in shards]),
        coords=jnp.concatenate([sh.coords for sh in shards]),
        lut=jnp.concatenate([sh.lut for sh in shards]),
        num_voxels=jnp.stack([sh.num_voxels for sh in shards]),
        resolution=shards[0].resolution,
    )


def save_sharded_map(path: str, state: ShardedMapState) -> None:
    """Checkpoint the sharded map as a mesh-size-independent single map
    (merge + `save_map`); restore with `load_sharded_map` on any mesh."""
    from ..models.scan_to_map import save_map

    save_map(path, merge_sharded_map(state))


def load_sharded_map(mesh, path: str, capacity_per_device: int = None
                     ) -> ShardedMapState:
    """Restore a `save_sharded_map` (or plain `save_map`) checkpoint onto
    `mesh`."""
    from ..models.scan_to_map import load_map

    return distribute_map(mesh, load_map(path), capacity_per_device)


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


@partial(jax.jit, static_argnames=("mesh",))
def update_sharded_map_routed(
    mesh, state: ShardedMapState, points_world, covs_world, mask
) -> ShardedMapState:
    """Fuse a SHARDED registered scan: compute-partitioned update.

    `update_sharded_map` replicates the scan and every device filters the
    full N rows by ownership — the per-frame fusion (segment sort +
    scatters, update_map) stays O(N) per device.  Here each device owns
    N/D rows, routes [point | cov9 | valid] 13-float packets to their
    voxel-owner device with one `lax.all_to_all` (the same argsort bucket
    compaction as the partitioned align), and runs update_map over the
    ~2N/D rows it receives — per-device fusion is O((N/D) log(N/D)).
    Packets beyond the 2x-slack route capacity are dropped for the frame
    (hash placement keeps per-destination counts ~N/D^2), matching the
    map's existing drop-and-retry insert semantics."""
    axis = mesh.axis_names[0]
    d = mesh.shape[axis]
    n = points_world.shape[0]
    n_local = n // d
    cap = _route_capacity(n_local, d)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(_state_specs(axis), P(axis), P(axis), P(axis)),
        out_specs=_state_specs(axis),
    )
    def run(st, pts, covs, msk):
        local = _local_state(*st[:4], st.resolution)
        h = _hash_coords(voxel_coord(pts, st.resolution))
        owner = _owner_of(h, d)
        rows = jnp.concatenate(
            [pts, covs.reshape(n_local, 9),
             msk.astype(jnp.float32)[:, None]],
            axis=1,
        )  # (nl, 13) — plain floats, no bitcast lanes
        owner_key = jnp.where(msk, owner, d)  # invalid rows park at d
        order = jnp.argsort(owner_key)
        sorted_key = owner_key[order]
        starts = jnp.searchsorted(sorted_key, jnp.arange(d))
        rank = (
            jnp.arange(n_local) - starts[jnp.clip(sorted_key, 0, d - 1)]
        )
        ok = (sorted_key < d) & (rank < cap)
        slot = jnp.where(ok, sorted_key * cap + rank, d * cap)
        buf = (
            jnp.zeros((d * cap + 1, 13), jnp.float32)
            .at[slot].set(rows[order])[: d * cap]
            .reshape(d, cap, 13)
        )
        recv = jax.lax.all_to_all(
            buf, axis, split_axis=0, concat_axis=0, tiled=True
        ).reshape(d * cap, 13)
        new = update_map(
            local, recv[:, :3], recv[:, 3:12], recv[:, 12] > 0.0
        )
        return ShardedMapState(
            sums=new.sums,
            coords=new.coords,
            lut=new.lut,
            num_voxels=new.num_voxels[None],
            resolution=st.resolution,
        )

    return run(state, points_world, covs_world, mask)


@partial(jax.jit, static_argnames=("mesh",), donate_argnums=(1,))
def re_anchor_sharded_map(
    mesh, state: ShardedMapState, shift_cells
) -> ShardedMapState:
    """In-mesh map re-anchoring: shift every voxel by -shift_cells and
    redistribute across shards with ONE all_to_all.

    Ownership is hash-of-coords, so the integer frame shift moves voxels
    between devices; the offline workaround (save -> `re_anchor_map` on
    the merged single-device state -> `distribute_map`) pays a full
    host round-trip of the whole map.  Here each shard shifts its live
    rows exactly like `re_anchor_map` (coords - k; mean sums - count * t;
    covariance sums translation-invariant), computes each row's NEW owner,
    routes 16-float packets [sums(13) | coords(3)] with the same argsort
    bucket compaction as `update_sharded_map_routed`, and rebuilds its
    local lut from the rows it receives.  Coords ride as f32 lanes (NEVER
    bitcast int lanes into a float buffer — small-int bit patterns are
    denormals that the routing math would flush); voxel coords are exact
    in f32 up to 2^24 cells.

    Routing capacity per (src, dst) pair is C_local (a source can send at
    most its whole shard to one destination), so no packet is ever
    dropped in the route; rows beyond the DESTINATION capacity (only
    possible if the hash balance were pathologically broken) drop like
    `update_map`'s over-capacity inserts.
    """
    axis = mesh.axis_names[0]
    d = mesh.shape[axis]
    cap_local = state.sums.shape[0] // d
    table_size = state.lut.shape[0] // d
    cap = cap_local

    from ..models.scan_to_map import MAX_PROBE
    from ..ops.voxelmap import _COORD_SENTINEL, _EMPTY, _build_table

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(_state_specs(axis), P()),
        out_specs=_state_specs(axis),
    )
    def run(st, k):
        nv = st.num_voxels[0]
        vid = jnp.arange(cap_local, dtype=jnp.int32)
        live = vid < nv
        t = k.astype(jnp.float32) * st.resolution
        coords = jnp.where(live[:, None], st.coords - k[None], 0)
        sums = jnp.concatenate(
            [
                st.sums[:, 0:1],
                st.sums[:, 1:4] - st.sums[:, 0:1] * t[None],
                st.sums[:, 4:13],
            ],
            axis=1,
        ) * live[:, None]
        h = _hash_coords(coords)
        owner = _owner_of(h, d)
        rows = jnp.concatenate([sums, coords.astype(jnp.float32)], axis=1)

        owner_key = jnp.where(live, owner, d)
        order = jnp.argsort(owner_key)
        sorted_key = owner_key[order]
        starts = jnp.searchsorted(sorted_key, jnp.arange(d))
        rank = vid - starts[jnp.clip(sorted_key, 0, d - 1)]
        ok = (sorted_key < d) & (rank < cap)
        slot = jnp.where(ok, sorted_key * cap + rank, d * cap)
        buf = (
            jnp.zeros((d * cap + 1, 16), jnp.float32)
            .at[slot].set(rows[order])[: d * cap]
            .reshape(d, cap, 16)
        )
        recv = jax.lax.all_to_all(
            buf, axis, split_axis=0, concat_axis=0, tiled=True
        ).reshape(d * cap, 16)

        # live received rows carry count >= 1; front-pack into capacity
        rvalid = recv[:, 0] > 0.0
        order2 = jnp.argsort(~rvalid)  # stable: live rows first
        count = jnp.minimum(
            jnp.sum(rvalid.astype(jnp.int32)), cap_local
        )
        front = vid < count
        recv_f = recv[order2[:cap_local]]
        new_sums = jnp.where(front[:, None], recv_f[:, :13], 0.0)
        new_coords = jnp.where(
            front[:, None],
            jnp.round(recv_f[:, 13:16]).astype(jnp.int32),
            0,
        )
        table = _build_table(
            new_coords, count, cap_local, table_size, MAX_PROBE
        )
        safe_t = jnp.maximum(table, 0) * (table != _EMPTY)
        lut_coords = jnp.where(
            (table != _EMPTY)[:, None], new_coords[safe_t], _COORD_SENTINEL
        )
        lut = jnp.concatenate([table[:, None], lut_coords], axis=1)
        return ShardedMapState(
            sums=new_sums,
            coords=new_coords,
            lut=lut,
            num_voxels=count[None],
            resolution=st.resolution,
        )

    return run(state, jnp.asarray(shift_cells, jnp.int32))


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


@partial(jax.jit, static_argnames=("mesh",), donate_argnums=(1,))
def compact_sharded_map(mesh, state: ShardedMapState, center, radius
                        ) -> ShardedMapState:
    """Evict voxels beyond `radius` of `center` on every shard.

    Like growth, eviction is pure per-device computation (each shard
    argsort-compacts its own rows and rebuilds its own lut; ownership
    hashes are unchanged) — no collective.  See scan_to_map.compact_map.
    """
    axis = mesh.axis_names[0]
    from ..models.scan_to_map import _compact_map_impl

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(_state_specs(axis), P(), P()),
        out_specs=_state_specs(axis),
    )
    def run(st, c, r):
        local = _local_state(*st[:4], st.resolution)
        new = _compact_map_impl(local, c, r)
        return ShardedMapState(
            sums=new.sums,
            coords=new.coords,
            lut=new.lut,
            num_voxels=new.num_voxels[None],
            resolution=st.resolution,
        )

    return run(state, jnp.asarray(center, jnp.float32),
               jnp.asarray(radius, jnp.float32))


@partial(jax.jit, static_argnames=("mesh", "config"))
@f32_matmuls
def align_to_sharded_map(
    mesh, state: ShardedMapState, source, source_mask, source_covs, guess,
    config: ScanToMapConfig,
):
    """Register a (replicated) scan against the sharded map; every device
    solves the same LM trajectory from psummed normal equations.

    `config.objective` selects the per-correspondence model exactly as in
    the single-device `align_to_map`: "vgicp" (sqrt(n)-weighted frozen
    Mahalanobis) or "ndt_d2d"/"ndt_p2d" (Cauchy-robust NDT,
    ndt_compute_derivatives.cu:15-18) — a coord misses on every shard but
    its owner, so each device's partial (err, H, b) psums to the
    single-device objective under either model."""
    axis = mesh.axis_names[0]
    offsets = jnp.asarray(
        neighbor_offsets(
            config.neighbor_search_method, config.neighbor_search_radius
        )
    )
    if config.objective in ("ndt_d2d", "ndt_p2d"):
        from ..models.ndt import NDTConfig, make_ndt_objective

        ncfg = NDTConfig(
            resolution=config.resolution,
            distance_mode=config.objective[4:],
            neighbor_search_method=config.neighbor_search_method,
            neighbor_search_radius=config.neighbor_search_radius,
            lsq=config.lsq,
        )

        def _objective(src, smask, scovs, vm, offs):
            return make_ndt_objective(
                src, smask,
                None if config.objective == "ndt_p2d" else scovs,
                vm, offs, ncfg, axis_name=axis,
            )
    else:
        vcfg = VGICPConfig(
            resolution=config.resolution,
            neighbor_search_method=config.neighbor_search_method,
            neighbor_search_radius=config.neighbor_search_radius,
            lsq=config.lsq,
        )

        def _objective(src, smask, scovs, vm, offs):
            return make_vgicp_objective(
                src, smask, scovs, vm, offs, vcfg, axis_name=axis
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
        lin, err = _objective(src, smask, scovs, vm, offs)
        return lsq_solve(lin, err, g, config.lsq)

    return run(
        state, source, source_mask, source_covs, offsets,
        guess.astype(source.dtype),
    )


@partial(jax.jit, static_argnames=("mesh",))
@f32_matmuls
def sharded_rbf_covariances(mesh, points, mask, kernel_width=0.5,
                            max_dist=3.0):
    """Query-sharded RBF covariance estimation: each device computes the
    kernel-density covariances of its N/D points against the all-gathered
    full cloud — O(N^2/D) per device instead of the O(N^2) a replicated
    estimate costs (the all_gather ships ~N x 16 B once per frame).
    Returns (N, 3, 3) AoS, sharded over the data axis."""
    axis = mesh.axis_names[0]

    @partial(shard_map, mesh=mesh, in_specs=(P(axis), P(axis)),
             out_specs=P(axis))
    def run(p_loc, m_loc):
        from ..ops import soa
        from ..ops.covariance import rbf_covariance_cols_vs

        full_p = jax.lax.all_gather(p_loc, axis, tiled=True)  # (N, 3)
        full_m = jax.lax.all_gather(m_loc, axis, tiled=True)
        mval = full_m.astype(p_loc.dtype)
        center = jnp.sum(full_p * mval[:, None], axis=0) / jnp.maximum(
            jnp.sum(mval), 1.0
        )
        cols6 = rbf_covariance_cols_vs(
            p_loc, m_loc, full_p, full_m, center,
            kernel_width=kernel_width, max_dist=max_dist,
        )
        nl = p_loc.shape[0]
        return soa.sym_cols_to_rows9(cols6).reshape(nl, 3, 3)

    return run(points, mask)


def _owner_of(h, d):
    """Voxel hash -> owning device (re-mixed high bits; see update)."""
    h = (h ^ (h >> 16)) * jnp.uint32(0x9E3779B9)
    return ((h >> 8) % jnp.uint32(d)).astype(jnp.int32)


def _route_capacity(n_queries_per_device: int, d: int) -> int:
    """Static per-(source, destination) packet capacity: mean n/d with 2x
    slack for hash-placement variance, rounded up to the f32 tile width."""
    mean = max(1, n_queries_per_device // d)
    return max(128, -(-2 * mean // 128) * 128)


@partial(jax.jit, static_argnames=("mesh", "config"))
@f32_matmuls
def align_to_sharded_map_partitioned(
    mesh, state: ShardedMapState, source, source_mask, source_covs, guess,
    config: ScanToMapConfig,
):
    """Compute-partitioned align: the SCAN is sharded over devices too.

    `align_to_sharded_map` replicates the scan, so every device does the
    full O(N*K) correspondence/linearize work against its map shard — map
    CAPACITY scales with devices, frames/s does not.  Here each device
    owns N/D source points and, per LM outer iteration:

      1. transforms its shard, derives each query's voxel coords and the
         voxel's OWNER device (the same ownership hash the update uses),
      2. packs [coords | source point | R C_A R^T | valid] into 16-float
         rows, compacts them per destination, and exchanges shards with
         ONE `lax.all_to_all` (~N/D x 64 B per device per iteration),
      3. looks up its local map shard for the queries it owns and reduces
         the fused (err, H, b) over ~N/D correspondences,
      4. `psum`s the 43-float normal equations — every device then steps
         the SAME LM trajectory.

    LM inner trials stay local: the routed packet carries the UNtransformed
    source point, so the owner re-transforms at each trial pose against
    its frozen Mahalanobis aux and only the scalar error is psummed.

    Per-device compute is O(N*K/D) (vs O(N*K) replicated); exactness vs
    the single-device solve is preserved up to summation order.  Packets
    beyond the 2x-slack route capacity are dropped (hash placement keeps
    per-destination counts ~N/D^2; see `sharded_routing_load` for the
    measured balance).

    `config.objective` selects vgicp (default) or ndt_d2d/ndt_p2d: the
    routed packet already carries everything NDT needs (the owner holds
    mu_B/cov_B/count; the packet holds p_t, R C_A R^T, and the raw source
    point for trial-pose re-evaluation), so only the Mahalanobis form,
    the >6-points voxel gate, and the Cauchy trial-pose weight differ
    (ndt_compute_derivatives.cu:15-18, :61-63).
    """
    axis = mesh.axis_names[0]
    is_ndt = config.objective in ("ndt_d2d", "ndt_p2d")
    if is_ndt:
        from ..models.ndt import _MIN_VOXEL_POINTS, _cauchy_weight
    d = mesh.shape[axis]
    n = source.shape[0]
    n_local = n // d
    offsets = jnp.asarray(
        neighbor_offsets(
            config.neighbor_search_method, config.neighbor_search_radius
        )
    )
    k = offsets.shape[0]
    cap = _route_capacity(k * n_local, d)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            _state_specs(axis), P(axis), P(axis), P(axis), P(), P(),
        ),
        out_specs=P(),
    )
    def run(st, src, smask, scovs, offs, g):
        from ..ops import soa

        local = _local_state(*st[:4], st.resolution)
        vm = map_as_voxelmap(local)
        me = jax.lax.axis_index(axis)

        P3 = soa.cols_from_points(src)  # (3, nl)
        C_A = soa.sym_cols_from_covs(scovs)  # (6, nl)
        offs_T = offs.T[:, :, None]  # (3, K, 1)
        nl = n_local

        def route(x):
            """Transform, bucket queries by owner, exchange; returns the
            received queries (d*cap rows) unpacked for local lookup."""
            p_t = soa.transform_cols(x, P3)  # (3, nl)
            cr = soa.rotate_sym_cols(x[:3, :3], C_A)  # (6, nl)
            coords = jnp.floor(p_t / vm.resolution - 0.5).astype(jnp.int32)
            qx = (coords[0][None, :] + offs_T[0]).reshape(-1)  # (K*nl,)
            qy = (coords[1][None, :] + offs_T[1]).reshape(-1)
            qz = (coords[2][None, :] + offs_T[2]).reshape(-1)
            h = (
                (qx.astype(jnp.uint32) * jnp.uint32(73856093))
                ^ (qy.astype(jnp.uint32) * jnp.uint32(19349669))
                ^ (qz.astype(jnp.uint32) * jnp.uint32(83492791))
            )
            owner = _owner_of(h, d)
            validq = jnp.broadcast_to(smask[None, :], (k, nl)).reshape(-1)

            fi = jax.lax.bitcast_convert_type
            rows = jnp.stack(
                [
                    fi(qx, jnp.float32), fi(qy, jnp.float32),
                    fi(qz, jnp.float32),
                    jnp.broadcast_to(p_t[0][None], (k, nl)).reshape(-1),
                    jnp.broadcast_to(p_t[1][None], (k, nl)).reshape(-1),
                    jnp.broadcast_to(p_t[2][None], (k, nl)).reshape(-1),
                    *(jnp.broadcast_to(cr[c][None], (k, nl)).reshape(-1)
                      for c in range(6)),
                    validq.astype(jnp.float32),
                    jnp.broadcast_to(src.T[0][None], (k, nl)).reshape(-1),
                    jnp.broadcast_to(src.T[1][None], (k, nl)).reshape(-1),
                    jnp.broadcast_to(src.T[2][None], (k, nl)).reshape(-1),
                ],
                axis=1,
            )  # (K*nl, 16)

            # Single-pass bucket compaction: ONE argsort by owner, then a
            # rank-within-bucket scatter.  A per-destination nonzero scan
            # (D passes over all K*nl rows) costs O(K*N) flops per device
            # REGARDLESS of D — measured capping the replicated/partitioned
            # per-device flops ratio at ~2.8x on the 8-way mesh; the sort
            # keeps routing O((K*N/D) log) so per-device work actually
            # shrinks with the mesh.  Invalid rows park at key d and
            # overflow (rank >= cap) lands on a trash row sliced off below.
            # NEVER mask packed rows with a float multiply: columns 0..2
            # are BITCAST int32 coords whose small-integer bit patterns are
            # denormal/NaN floats — `* 1.0` flushes/canonicalizes them and
            # silently corrupts the coordinates (row gathers are safe).
            owner_key = jnp.where(validq, owner, d)
            order = jnp.argsort(owner_key)  # stable: iota tie-break
            sorted_key = owner_key[order]
            starts = jnp.searchsorted(sorted_key, jnp.arange(d))
            rank = (
                jnp.arange(k * nl)
                - starts[jnp.clip(sorted_key, 0, d - 1)]
            )
            ok = (sorted_key < d) & (rank < cap)
            slot = jnp.where(ok, sorted_key * cap + rank, d * cap)
            buf = (
                jnp.zeros((d * cap + 1, 16), jnp.float32)
                .at[slot].set(rows[order])[: d * cap]
                .reshape(d, cap, 16)
            )
            recv = jax.lax.all_to_all(
                buf, axis, split_axis=0, concat_axis=0, tiled=True
            )  # (d, cap, 16): block j = queries device j routed to me
            return recv.reshape(d * cap, 16)

        def local_pairs(recv):
            """Lookup + unpack the routed queries on the owner."""
            fi = jax.lax.bitcast_convert_type
            qx = fi(recv[:, 0], jnp.int32)
            qy = fi(recv[:, 1], jnp.int32)
            qz = fi(recv[:, 2], jnp.int32)
            valid_in = recv[:, 12] > 0.0
            vids = lookup_voxels_cols(vm, qx, qy, qz)
            valid = valid_in & (vids >= 0)
            rows = vm.packed[jnp.maximum(vids, 0)]  # (d*cap, 16)
            if is_ndt:  # >6-points voxel gate (ndt_compute_derivatives.cu:61-63)
                valid = valid & (rows[:, 12] > _MIN_VOXEL_POINTS)
            mu_B = rows[:, 0:3].T  # (3, M)
            cov_B = jnp.stack(
                [rows[:, 3], rows[:, 4], rows[:, 5],
                 rows[:, 7], rows[:, 8], rows[:, 11]], axis=0
            )
            n_B = rows[:, 12]
            p_t = recv[:, 3:6].T  # (3, M) at linearization pose
            cr = recv[:, 6:12].T  # (6, M)
            p_src = recv[:, 13:16].T  # (3, M) untransformed
            return p_t, cr, mu_B, cov_B, n_B, valid, p_src

        def _ndt_w(p_t, mu_B, valid):
            e_sq = jnp.sum((mu_B - p_t) ** 2, axis=0)
            return jnp.where(
                valid, _cauchy_weight(config.resolution, e_sq), 0.0
            )

        def linearize(x):
            from ..ops import soa as _soa

            recv = route(x)
            p_t, cr, mu_B, cov_B, n_B, valid, p_src = local_pairs(recv)
            if config.objective == "ndt_p2d":  # M = cov_B^-1
                M = _soa.inv_sym_cols(cov_B) * valid[None, :]
            else:  # vgicp / ndt_d2d: M = (cov_B + R C_A R^T)^-1
                M = _soa.inv_sym_cols(cov_B + cr) * valid[None, :]
            if is_ndt:
                w = _ndt_w(p_t, mu_B, valid)
            else:
                w = jnp.sqrt(jnp.maximum(n_B, 0.0))
            err, H, b = _soa.linearize_cols(p_t, mu_B, M, w, valid)
            aux = (valid, M, w, mu_B, p_src)
            return (
                jax.lax.psum(err, axis),
                jax.lax.psum(H, axis),
                jax.lax.psum(b, axis),
                aux,
            )

        def error(x, aux):
            from ..ops import soa as _soa

            valid, M, w, mu_B, p_src = aux
            p_t = _soa.transform_cols(x, p_src)
            if is_ndt:  # trial-pose Cauchy weight, frozen M
                w = _ndt_w(p_t, mu_B, valid)
            return jax.lax.psum(
                _soa.error_cols(p_t, mu_B, M, w, valid), axis
            )

        return lsq_solve(linearize, error, g, config.lsq)

    return run(
        state, source, source_mask, source_covs,
        jnp.asarray(
            neighbor_offsets(
                config.neighbor_search_method, config.neighbor_search_radius
            )
        ),
        guess.astype(source.dtype),
    )


@partial(jax.jit, static_argnames=("mesh", "config"))
def sharded_routing_load(
    mesh, state: ShardedMapState, source, source_mask, guess,
    config: ScanToMapConfig,
):
    """Diagnostic: per-device routed-query counts at `guess` — the
    work-partition proxy (each count is that device's linearize workload;
    balanced means ~N*K/D each)."""
    axis = mesh.axis_names[0]
    d = mesh.shape[axis]
    n = source.shape[0]
    offsets = jnp.asarray(
        neighbor_offsets(
            config.neighbor_search_method, config.neighbor_search_radius
        )
    )

    @partial(shard_map, mesh=mesh, in_specs=(P(axis), P(axis), P(), P()),
             out_specs=P(axis))
    def run(src, smask, offs, g):
        from ..ops import soa

        P3 = soa.cols_from_points(src)
        p_t = soa.transform_cols(g, P3)
        res = state.resolution
        coords = jnp.floor(p_t / res - 0.5).astype(jnp.int32)
        offs_T = offs.T[:, :, None]
        qx = (coords[0][None, :] + offs_T[0]).reshape(-1)
        qy = (coords[1][None, :] + offs_T[1]).reshape(-1)
        qz = (coords[2][None, :] + offs_T[2]).reshape(-1)
        h = (
            (qx.astype(jnp.uint32) * jnp.uint32(73856093))
            ^ (qy.astype(jnp.uint32) * jnp.uint32(19349669))
            ^ (qz.astype(jnp.uint32) * jnp.uint32(83492791))
        )
        owner = _owner_of(h, d)
        validq = jnp.broadcast_to(
            smask[None, :], (offs.shape[0], smask.shape[0])
        ).reshape(-1)
        counts = jnp.zeros((d,), jnp.int32).at[owner].add(
            validq.astype(jnp.int32)
        )
        # each device's workload = total queries routed TO it
        return jax.lax.psum(counts, axis)[jax.lax.axis_index(axis)][None]

    return run(source, source_mask, offsets, guess.astype(source.dtype))


class ShardedScanToMapOdometry(ScanToMapOdometry):
    """Multi-device mirror of ScanToMapOdometry: persistent hash-sharded
    world map, constant-velocity warm start, scan fusion at the estimate.

    All per-frame logic (gate, delta bookkeeping, fusion masking) is
    inherited from ScanToMapOdometry — only the align/fuse hooks differ."""

    _fused_frames = False  # multi-dispatch path (hooks below)

    def _covs(self, points, mask):
        if self.covariance == "rbf":
            return sharded_rbf_covariances(self.mesh, points, mask)
        return super()._covs(points, mask)

    def _re_anchor_state(self, k) -> None:
        """In-mesh frame shift: ownership is hash-of-coords, so the shift
        reassigns voxels across shards — one all_to_all redistribution
        (`re_anchor_sharded_map`), replacing the round-4 offline detour
        (save -> merged `re_anchor_map` -> `distribute_map`)."""
        self.state = re_anchor_sharded_map(
            self.mesh, self.state, jnp.asarray(k)
        )

    def __init__(
        self,
        config: ScanToMapConfig = ScanToMapConfig(),
        mesh=None,
        covariance: str = "rbf",
        initial_map=None,
        initial_pose=None,
        initial_velocity=None,
    ):
        super().__init__(config, covariance=covariance,
                         initial_pose=initial_pose,
                         initial_velocity=initial_velocity)
        self.mesh = mesh if mesh is not None else make_mesh()
        d = self.mesh.shape[self.mesh.axis_names[0]]
        # initial_map: resume from a checkpoint — either an already-sharded
        # state (same mesh size) or a single-device MapState /
        # `save_map` checkpoint, which is distributed by ownership hash
        # (works across any device count; see load_sharded_map).
        if initial_map is None:
            cap_local = max(1, config.capacity // d)
            self.state = empty_sharded_map(
                self.mesh, cap_local, config.resolution
            )
        elif isinstance(initial_map, ShardedMapState):
            if initial_map.num_voxels.shape[0] != d:
                raise ValueError(
                    f"checkpoint has {initial_map.num_voxels.shape[0]} "
                    f"shards, mesh has {d} — merge and redistribute "
                    "(save_sharded_map/load_sharded_map)"
                )
            self.state = initial_map
        else:
            self.state = distribute_map(self.mesh, initial_map)
        # resumed mapping against a non-empty checkpoint aligns frame 0
        # before fusing (base-class semantics; recomputed here because the
        # base __init__ never saw the sharded initial_map)
        self._align_first_frame = initial_map is not None and (
            int(jax.device_get(jnp.sum(self.state.num_voxels))) > 0
        )

    def save(self, path: str) -> None:
        """Checkpoint the sharded map as a mesh-size-independent single-map
        .npz (save_sharded_map); resume on ANY mesh via
        `ShardedScanToMapOdometry(..., initial_map=load_map(path))` or
        single-device `ScanToMapOdometry(initial_map=load_map(path))`."""
        save_sharded_map(path, self.state)

    def _align(self, pts, mask, covs, guess):
        return align_to_sharded_map_partitioned(
            self.mesh, self.state, pts, mask, covs, guess, self.config
        )

    def _fuse(self, world_pts, world_covs, fuse_mask):
        self.state = update_sharded_map_routed(
            self.mesh, self.state, world_pts, world_covs, fuse_mask
        )

    # --- capacity-policy primitives (per-SHARD numbers; the grow/evict
    # per-frame policy itself lives once in ScanToMapOdometry) ---

    _capacity_scope = " on the fullest shard"

    def _shards(self) -> int:
        return self.mesh.shape[self.mesh.axis_names[0]]

    def _capacity(self) -> int:
        return self.state.sums.shape[0] // self._shards()

    def _max_capacity(self) -> int:
        return max(1, self.config.max_capacity // self._shards())

    def _fill(self) -> int:
        return int(jax.device_get(jnp.max(self.state.num_voxels)))

    def _grow(self, new_capacity: int) -> None:
        """Per-device-local 2x growth — see grow_sharded_map."""
        self.state = grow_sharded_map(self.mesh, self.state, new_capacity)

    def _compact(self, center, radius) -> None:
        """Per-shard eviction (compact_sharded_map); device-local, no
        collective, enqueued without a sync."""
        self.state = compact_sharded_map(self.mesh, self.state, center,
                                         radius)
