"""Scan-to-map odometry: persistent world voxel map, incrementally updated.

The reference is scan-to-scan only — its target voxel map is rebuilt from
the latest scan every align (fast_vgicp_impl.hpp:66-70); drift accumulates
with nothing to anchor to.  This module is the north-star capability the
reference lacks (SURVEY.md §5 "long-context"): a fixed-capacity world-frame
Gaussian voxel map that persists across frames, accumulates additive voxel
statistics from every registered scan, and serves as the registration target
for each new scan.

Everything is fixed-shape and jittable:
  * `MapState` — raw additive sums [n | sum mu | sum C] per voxel (finalized
    lazily at lookup), integer coords, and the open-addressing lut.
  * `update_map` — segment-reduce the new scan to per-voxel contributions,
    scatter-add into existing voxels, claim lut slots for new ones with the
    same vectorized scatter-min insert as the static builder.
  * `align_to_map` — VGICP objective against the live map (weight sqrt(n),
    frozen Mahalanobis per linearization), LM solve on device.

Multi-host design (round 2+): shard `MapState` rows by coord-block hash
across devices, lookup via all_gather of the query block's shard, psum the
normal equations — per-iteration traffic stays (6x6 + 6 + 1) floats.

Numerical envelope: the per-frame align linearizes in the WORLD frame, so
the normal equations carry |p_world|^2-scale rotation blocks.  Bounded
drives (the 512-frame/~500 m benchmark) are comfortably inside f32; past
~5-10 km from the map origin the same lever-arm accumulation that
motivated `base.centered_frame_align` for the pair aligns starts eroding
the rotation/translation cross blocks.  The pair aligns re-center per
call; the persistent map cannot (voxel keys are world-anchored), so the
long-horizon fix is periodic MAP RE-ANCHORING: `re_anchor_map` /
`ScanToMapOdometry.re_anchor()` shifts map + pose chain to the vehicle
by a resolution multiple (exact integer-cell coord shift + lut rebuild)
— call it every few km of drive.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import se3
from ..ops.voxelmap import (
    _COORD_SENTINEL,
    _EMPTY,
    MAX_PROBE,
    VoxelMap,
    _hash_coords,
    lookup_lut,
    neighbor_offsets,
    next_pow2,
    segment_by_voxel,
)
from ..precision import f32_matmuls
from ..solver import LsqConfig, LsqResult, lsq_solve
from ..utils.padding import bucket_size


class MapState(NamedTuple):
    sums: jax.Array  # (C, 13) f32: [count, sum mean (3), sum cov (9)]
    coords: jax.Array  # (C, 3) int32 voxel coords (world frame)
    lut: jax.Array  # (T, 4) int32 [vid, cx, cy, cz]
    num_voxels: jax.Array  # () int32
    resolution: jax.Array  # () f32


# Static per-frame bound on NEW voxels admitted to the map (compaction size
# for the claim/commit scatters). Frames discovering more (e.g. the very
# first scan of a large scene) admit the first _NEW_PER_FRAME_CAP and pick
# the rest up on later frames.
_NEW_PER_FRAME_CAP = 16384


def empty_map(capacity: int, resolution: float, table_factor: int = 8) -> MapState:
    # table_factor 8: MAX_PROBE (ops/voxelmap.py) is sized for a 1/8 load
    # factor; the persistent map reaches full load over time.
    table_size = next_pow2(table_factor * capacity)
    lut = jnp.concatenate(
        [
            jnp.full((table_size, 1), _EMPTY, jnp.int32),
            jnp.full((table_size, 3), _COORD_SENTINEL, jnp.int32),
        ],
        axis=1,
    )
    return MapState(
        sums=jnp.zeros((capacity, 13), jnp.float32),
        coords=jnp.zeros((capacity, 3), jnp.int32),
        lut=lut,
        num_voxels=jnp.int32(0),
        resolution=jnp.asarray(resolution, jnp.float32),
    )


def save_map(path: str, state: MapState) -> None:
    """Checkpoint the persistent map to an .npz (the reference has no
    checkpoint/resume at all, SURVEY.md §5; this enables map-then-localize
    workflows and crash recovery)."""
    import numpy as np

    np.savez_compressed(
        path,
        sums=np.asarray(state.sums),
        coords=np.asarray(state.coords),
        lut=np.asarray(state.lut),
        num_voxels=np.asarray(state.num_voxels),
        resolution=np.asarray(state.resolution),
    )


def load_map(path: str) -> MapState:
    """Restore a map checkpoint written by `save_map`."""
    import numpy as np

    z = np.load(path)
    return MapState(
        sums=jnp.asarray(z["sums"]),
        coords=jnp.asarray(z["coords"]),
        lut=jnp.asarray(z["lut"]),
        num_voxels=jnp.asarray(z["num_voxels"]),
        resolution=jnp.asarray(z["resolution"]),
    )


def map_from_voxels(sums, coords, resolution: float,
                    capacity: int = None) -> MapState:
    """Build a MapState from bare live-voxel rows (host or device arrays):
    `sums` (n, 13), `coords` (n, 3).  Used by the sharded-map merge/
    distribute checkpoint path; `capacity` defaults to 2x the row count
    (growth headroom), rounded to a power of two."""
    from ..ops.voxelmap import _build_table

    sums = jnp.asarray(sums, jnp.float32)
    coords = jnp.asarray(coords, jnp.int32)
    n = sums.shape[0]
    if capacity is None:
        capacity = max(256, next_pow2(2 * max(1, n)))
    if n > capacity:
        raise ValueError(f"{n} voxels exceed capacity {capacity}")
    table_size = next_pow2(8 * capacity)
    sums_full = jnp.zeros((capacity, 13), jnp.float32).at[:n].set(sums)
    coords_full = jnp.zeros((capacity, 3), jnp.int32).at[:n].set(coords)
    table = _build_table(
        coords_full, jnp.int32(n), capacity, table_size, MAX_PROBE
    )
    safe_t = jnp.maximum(table, 0) * (table != _EMPTY)
    lut_coords = jnp.where(
        (table != _EMPTY)[:, None], coords_full[safe_t], _COORD_SENTINEL
    )
    lut = jnp.concatenate([table[:, None], lut_coords], axis=1)
    return MapState(
        sums=sums_full,
        coords=coords_full,
        lut=lut,
        num_voxels=jnp.int32(n),
        resolution=jnp.asarray(resolution, jnp.float32),
    )


def merge_maps(a: MapState, b: MapState, transform_b=None,
               capacity: int = None) -> MapState:
    """Merge two persistent maps into one — multi-session map stitching.

    Both maps must share a resolution.  `transform_b` (4x4, b's frame ->
    a's frame) first moves map b rigidly: the additive accumulators
    [count, sum p, sum C] transform in closed form (count unchanged,
    sum p -> R sum p + count*t, sum C -> R sum C R^T) and each voxel
    re-bins at its transformed MEAN — the standard whole-voxel
    re-voxelization approximation (exact when the transform is a lattice
    translation; otherwise boundary points may land one cell off).  Rows
    landing in the same cell sum their accumulators, exactly as if both
    sessions' scans had been fused into one map.

    Host-side numpy: merging is an offline operation (two checkpoints in,
    one out), not a per-frame path.  No reference analogue — the
    reference's target map lives for a single align (SURVEY.md §5).
    """
    import numpy as np

    res_a = float(np.asarray(a.resolution))
    res_b = float(np.asarray(b.resolution))
    if abs(res_a - res_b) > 1e-6 * max(res_a, res_b):
        raise ValueError(
            f"cannot merge maps with different resolutions "
            f"({res_a} vs {res_b})"
        )
    na = int(np.asarray(a.num_voxels))
    nb = int(np.asarray(b.num_voxels))
    rows_a = np.asarray(a.sums)[:na]
    coords_a = np.asarray(a.coords)[:na]
    rows_b = np.asarray(b.sums)[:nb].astype(np.float64)
    coords_b = np.asarray(b.coords)[:nb]
    if transform_b is not None and nb:
        T = np.asarray(transform_b, np.float64)
        R, t = T[:3, :3], T[:3, 3]
        cnt = rows_b[:, :1]
        sp = rows_b[:, 1:4] @ R.T + cnt * t
        sc = np.einsum(
            "ij,njk,lk->nil", R, rows_b[:, 4:13].reshape(-1, 3, 3), R
        ).reshape(-1, 9)
        rows_b = np.concatenate([cnt, sp, sc], axis=1)
        mean = sp / np.maximum(cnt, 1e-9)
        coords_b = np.floor(mean / res_a - 0.5).astype(np.int32)
    coords = np.concatenate([coords_a, coords_b.astype(np.int32)])
    rows = np.concatenate([rows_a.astype(np.float64), rows_b])
    uniq, inv = np.unique(coords, axis=0, return_inverse=True)
    inv = np.asarray(inv).reshape(-1)
    merged = np.zeros((len(uniq), 13), np.float64)
    np.add.at(merged, inv, rows)
    return map_from_voxels(
        merged.astype(np.float32), uniq.astype(np.int32), res_a,
        capacity=capacity,
    )


def grow_map(state: MapState, new_capacity: int) -> MapState:
    """Migrate the map into a larger allocation (one-time O(new_capacity)).

    TPU scatters cost ~45 ns per OPERAND row regardless of update count, so
    per-frame update cost is O(capacity): a map sized for the worst case up
    front taxes every frame. Start small and grow (2x) as voxels accumulate
    — `ScanToMapOdometry` does this automatically.
    """
    from ..ops.voxelmap import _build_table

    old_capacity = state.sums.shape[0]
    if new_capacity <= old_capacity:
        return state
    table_size = next_pow2(8 * new_capacity)
    sums = jnp.zeros((new_capacity, 13), jnp.float32).at[:old_capacity].set(
        state.sums
    )
    coords = jnp.zeros((new_capacity, 3), jnp.int32).at[:old_capacity].set(
        state.coords
    )
    table = _build_table(
        coords, state.num_voxels, new_capacity, table_size, MAX_PROBE
    )
    safe_t = jnp.maximum(table, 0) * (table != _EMPTY)
    lut_coords = jnp.where(
        (table != _EMPTY)[:, None], coords[safe_t], _COORD_SENTINEL
    )
    lut = jnp.concatenate([table[:, None], lut_coords], axis=1)
    return MapState(
        sums=sums,
        coords=coords,
        lut=lut,
        num_voxels=state.num_voxels,
        resolution=state.resolution,
    )


def _compact_map_impl(state: MapState, center, radius) -> MapState:
    """Evict voxels farther than `radius` from `center` (bounded memory).

    The eviction policy the fixed-capacity ring deferred (see `update_map`):
    long drives only ever register against geometry near the sensor, so
    voxels that fall outside a world-frame sphere around the current pose
    are dropped and their rows recycled.  Everything is one fixed-shape
    dispatch: argsort the keep mask (stable — survivors keep their relative
    order, so repeated compactions are deterministic), slide survivors to
    the front, rebuild the open-addressing lut with the same scatter-min
    claiming rounds as the static builder.  Capacity is unchanged; only
    `num_voxels` shrinks.  `center`/`radius` are device values — callers
    decide WHEN to compact (e.g. every N frames) without a sync.

    The reference has no analogue (its GPU map lives for one align,
    gaussian_voxelmap.cu); this is for the persistent scan-to-map mode.
    """
    from ..ops.voxelmap import _build_table

    capacity = state.sums.shape[0]
    table_size = state.lut.shape[0]
    vid = jnp.arange(capacity, dtype=jnp.int32)
    live = vid < state.num_voxels
    # voxel coord c spans x/res in [c+0.5, c+1.5) -> center (c+1)*res
    centers = (state.coords.astype(jnp.float32) + 1.0) * state.resolution
    d2 = jnp.sum((centers - jnp.asarray(center, jnp.float32)[None]) ** 2, 1)
    keep = live & (d2 <= jnp.asarray(radius, jnp.float32) ** 2)
    order = jnp.argsort(~keep)  # stable: keep-rows first, order preserved
    count = jnp.sum(keep).astype(jnp.int32)
    front = vid < count
    sums = jnp.where(front[:, None], state.sums[order], 0.0)
    coords = jnp.where(front[:, None], state.coords[order], 0)
    table = _build_table(coords, count, capacity, table_size, MAX_PROBE)
    safe_t = jnp.maximum(table, 0) * (table != _EMPTY)
    lut_coords = jnp.where(
        (table != _EMPTY)[:, None], coords[safe_t], _COORD_SENTINEL
    )
    lut = jnp.concatenate([table[:, None], lut_coords], axis=1)
    return MapState(
        sums=sums,
        coords=coords,
        lut=lut,
        num_voxels=count,
        resolution=state.resolution,
    )


@partial(jax.jit, donate_argnums=(0,))
@f32_matmuls
def compact_map(state: MapState, center, radius) -> MapState:
    """Jitted, state-donating view of `_compact_map_impl` (the sharded map
    calls the impl inside its own shard_map instead)."""
    return _compact_map_impl(state, center, radius)


@partial(jax.jit, donate_argnums=(0,))
@f32_matmuls
def re_anchor_map(state: MapState, shift_cells) -> MapState:
    """Shift the map's frame by -shift_cells * resolution (long-drive
    re-anchoring).

    The per-frame align linearizes about the map frame's origin, so the
    normal equations carry |p|^2-scale rotation blocks; kilometres from
    the origin that f32 accumulation erodes the small-signal translation
    terms (the failure `base.centered_frame_align` fixes for pair
    aligns).  Re-anchoring moves the origin to the vehicle: voxel coords
    shift by the integer cell count (exact — `floor(x/res - 0.5)`
    commutes with integer-cell translations), the mean sums shift by
    -count * t, covariance sums are translation-invariant, and the lut
    rebuilds (coord hashes changed) with the same claiming rounds as the
    static builder.  One fixed-shape dispatch; `shift_cells` is a (3,)
    int32 device value."""
    from ..ops.voxelmap import _build_table

    capacity = state.sums.shape[0]
    table_size = state.lut.shape[0]
    vid = jnp.arange(capacity, dtype=jnp.int32)
    live = vid < state.num_voxels
    k = jnp.asarray(shift_cells, jnp.int32)
    t = k.astype(jnp.float32) * state.resolution
    coords = jnp.where(live[:, None], state.coords - k[None], state.coords)
    shifted = jnp.concatenate(
        [
            state.sums[:, 0:1],
            state.sums[:, 1:4] - state.sums[:, 0:1] * t[None],
            state.sums[:, 4:13],
        ],
        axis=1,
    )
    sums = jnp.where(live[:, None], shifted, state.sums)
    table = _build_table(
        coords, state.num_voxels, capacity, table_size, MAX_PROBE
    )
    safe_t = jnp.maximum(table, 0) * (table != _EMPTY)
    lut_coords = jnp.where(
        (table != _EMPTY)[:, None], coords[safe_t], _COORD_SENTINEL
    )
    lut = jnp.concatenate([table[:, None], lut_coords], axis=1)
    return MapState(
        sums=sums,
        coords=coords,
        lut=lut,
        num_voxels=state.num_voxels,
        resolution=state.resolution,
    )


@partial(jax.jit, donate_argnums=(0,), static_argnames=("new_cap",))
@f32_matmuls
def update_map(state: MapState, points_world, covs_world, mask,
               new_cap: int = _NEW_PER_FRAME_CAP) -> MapState:
    """Fuse a registered scan (world frame) into the map.

    Additive accumulation like AdditiveGaussianVoxel (fast_vgicp_voxel.hpp:
    105-122), but persistent: existing voxels keep their history.  New
    voxels beyond capacity are dropped (the map is a ring of capacity C;
    eviction policies can replace this in later rounds).

    Insertion is CLAIM-FIRST: a new voxel's capacity row and num_voxels
    slot are committed only after its lut slot claim succeeds, so a voxel
    whose probe window is full is dropped for this frame (and retried next
    frame) instead of permanently leaking an unreachable row.
    """
    capacity = state.sums.shape[0]
    table_size = state.lut.shape[0]
    n = points_world.shape[0]

    # Segment the scan by voxel (shared with the static builder).
    seg, new_seg, seg_sorted, sorted_coords, n_segs = segment_by_voxel(
        points_world, mask, state.resolution, n
    )

    contrib = jnp.concatenate(
        [
            jnp.ones((n, 1), jnp.float32),
            points_world,
            covs_world.reshape(n, 9),
        ],
        axis=1,
    ) * mask[:, None]
    seg_sums = jnp.zeros((n + 1, 13), jnp.float32).at[seg].add(contrib)[:n]
    seg_coords = (
        jnp.full((n + 1, 3), _COORD_SENTINEL, jnp.int32)
        .at[jnp.where(new_seg, seg_sorted, n)]
        .set(sorted_coords)
    )[:n]
    seg_valid = jnp.arange(n) < n_segs

    # Match scan voxels against the existing map.
    vids = lookup_lut(state.lut, seg_coords)
    exists = seg_valid & (vids >= 0)
    is_new = seg_valid & (vids < 0)

    # --- Phase 1: COMPACT the new-voxel candidates. TPU scatters cost ~1 us
    # per update row regardless of hit pattern, and after the first few
    # frames only a few hundred voxels per scan are new — running the claim
    # loop and lut writes over all N rows costs ~10x the whole update.
    new_cap = min(new_cap, n)
    (cand,) = jnp.nonzero(is_new, size=new_cap, fill_value=n - 1)
    n_new = jnp.sum(is_new.astype(jnp.int32))
    cand_valid = jnp.arange(new_cap, dtype=jnp.int32) < jnp.minimum(
        n_new, new_cap
    )  # overflow beyond new_cap is dropped this frame (retried next)
    # Pre-filter to guaranteed capacity BEFORE claiming: a candidate that
    # wins a slot but then fails the capacity check would leave a hole in
    # its probe chain that orphans same-frame committed voxels under the
    # stop-at-empty lookup. The pre-claim rank is an upper bound on the
    # post-claim rank, so every claim winner is admissible by construction.
    pre_rank = jnp.cumsum(cand_valid.astype(jnp.int32)) - 1
    cand_valid = cand_valid & (state.num_voxels + pre_rank < capacity)
    cand_coords = seg_coords[cand]

    # --- Phase 2: claim lut slots with per-candidate TICKETS, on a temporary
    # table where occupied slots are blocked (-1).
    mask_t = jnp.uint32(table_size - 1)
    slot = (_hash_coords(cand_coords) & mask_t).astype(jnp.int32)
    blocked = jnp.where(state.lut[:, 0] != _EMPTY, jnp.int32(-1), _EMPTY)
    tickets = jnp.arange(new_cap, dtype=jnp.int32)

    def claim_body(_, s):
        table, slot, pending = s
        attempt = pending & (table[slot] == _EMPTY)
        try_slot = jnp.where(attempt, slot, table_size)
        table_ext = jnp.concatenate([table, jnp.full(1, _EMPTY, jnp.int32)])
        table_ext = table_ext.at[try_slot].min(tickets)
        table = table_ext[:table_size]
        won = attempt & (table[slot] == tickets)
        pending = pending & ~won
        slot = jnp.where(pending, (slot + 1) & jnp.int32(table_size - 1), slot)
        return table, slot, pending

    claim_table, final_slot, pending = jax.lax.fori_loop(
        0, MAX_PROBE, claim_body, (blocked, slot, cand_valid)
    )
    # A candidate's claim succeeded iff its ticket sits in some probed slot;
    # final_slot stopped advancing at the winning slot.
    claimed = cand_valid & ~pending & (claim_table[final_slot] == tickets)

    # --- Phase 3: compact vid assignment over CLAIMED candidates only.
    new_rank = jnp.cumsum(claimed.astype(jnp.int32)) - 1
    new_vid = state.num_voxels + new_rank
    in_cap = claimed & (new_vid < capacity)

    # Scatter each admitted candidate's vid back to its segment row, so the
    # full-N stats scatter below can route contributions.
    assigned = (
        jnp.full(n + 1, -1, jnp.int32)
        .at[jnp.where(in_cap, cand, n)]
        .set(new_vid)
    )[:n]

    # --- Phase 4: commit. ONE full-N scatter for the stats; the per-new
    # coords and lut rows ride compacted new_cap-sized scatters (the lut row
    # is written as a single (4,) row — a column-sliced scatter into the
    # 1M-row table measured 5x slower than a whole-row scatter).
    target_vid = jnp.where(
        exists, vids, jnp.where(assigned >= 0, assigned, capacity)
    )
    sums = (
        jnp.concatenate([state.sums, jnp.zeros((1, 13), jnp.float32)])
        .at[target_vid]
        .add(seg_sums * (exists | (assigned >= 0))[:, None])
    )[:capacity]
    coords_out = (
        jnp.concatenate([state.coords, jnp.zeros((1, 3), jnp.int32)])
        .at[jnp.where(in_cap, new_vid, capacity)]
        .set(cand_coords)
    )[:capacity]
    num_voxels = jnp.minimum(
        state.num_voxels + jnp.sum(in_cap.astype(jnp.int32)), capacity
    )
    commit_slot = jnp.where(in_cap, final_slot, table_size)
    lut_rows = jnp.concatenate([new_vid[:, None], cand_coords], axis=1)
    lut = (
        jnp.concatenate(
            [state.lut, jnp.full((1, 4), _EMPTY, jnp.int32)], axis=0
        )
        .at[commit_slot]
        .set(lut_rows)
    )[:table_size]

    return MapState(
        sums=sums,
        coords=coords_out,
        lut=lut,
        num_voxels=num_voxels,
        resolution=state.resolution,
    )


def map_as_voxelmap(state: MapState, max_weight_points: float = 25.0) -> VoxelMap:
    """Finalize the additive sums into a VoxelMap view for registration.

    Residual weights downstream are sqrt(count) (fast_vgicp_impl.hpp:149) —
    designed for single-scan maps where counts are bounded by scan density.
    In a persistent map counts grow with every fused frame, which skews the
    objective toward long-observed (typically ground) voxels and away from
    the sparse structure that constrains x/y/yaw; clamp the count exposed to
    the objective to a per-scan-like scale.
    """
    capacity = state.sums.shape[0]
    counts_f = state.sums[:, 0]
    n_f = jnp.maximum(counts_f, 1.0)[:, None]
    means = state.sums[:, 1:4] / n_f
    covs = state.sums[:, 4:13] / n_f
    w_counts = jnp.minimum(counts_f, max_weight_points)
    packed = jnp.concatenate(
        [means, covs, w_counts[:, None], jnp.zeros((capacity, 3), jnp.float32)],
        axis=1,
    )
    return VoxelMap(
        means=means,
        covs=covs.reshape(capacity, 3, 3),
        counts=counts_f.astype(jnp.int32),
        coords=state.coords,
        table=state.lut[:, 0],
        num_voxels=state.num_voxels,
        resolution=state.resolution,
        packed=packed,
        lut=state.lut,
    )


class ScanToMapConfig(NamedTuple):
    resolution: float = 1.0
    # INITIAL map allocation; the odometry driver grows it 2x whenever the
    # map passes 70% full (update cost is O(capacity) per frame — TPU
    # scatters pay ~45 ns per operand row — so right-sizing matters).
    capacity: int = 1 << 15
    max_capacity: int = 1 << 21
    grow_check_every: int = 32  # frames between (synchronizing) fill checks
    # Static bound on NEW voxels admitted per frame (compaction size for the
    # claim/commit scatters; scatter cost scales with update count). Frames
    # discovering more admit the first N and retry the rest on later frames
    # (the first scans of a sequence take 2-3 frames to be fully admitted;
    # steady-state frames discover only a few hundred new voxels).
    new_per_frame_capacity: int = 4096
    # direct1 (the reference's own VGICP default): measured 2.5x faster AND
    # 2.4x more accurate than direct7 against the persistent map (the
    # 7-offset objective reject-storms the LM; see tools/odometry_bench).
    neighbor_search_method: str = "direct1"
    neighbor_search_radius: float = 1.5
    # Tracking gate (failure detection the reference lacks, SURVEY.md §5):
    # an align whose delta deviates from the constant-velocity prediction by
    # more than this is rejected — the prediction is used instead and the
    # scan is NOT fused, so one bad registration cannot poison the map and
    # snowball. Evaluated on device (no sync). None disables a gate.
    gate_translation: float = 1.0  # meters vs predicted pose
    gate_rotation: float = 0.5  # radians vs predicted pose
    # After this many consecutive rejections, accept a live align anyway
    # (the prediction is then the likelier culprit; without this a track
    # that drifts outside the gates can never re-anchor to the map).
    gate_relock_after: int = 5
    # Bounded-memory eviction: every `evict_every` frames, drop voxels
    # farther than `eviction_radius` (meters) from the current pose
    # (compact_map). None keeps the full history (mapping mode); set a
    # radius for unbounded drives (odometry mode). The compaction is
    # enqueued device-side — no sync.
    eviction_radius: float = None
    evict_every: int = 64
    # LOCALIZATION mode: False freezes the map (no fusion, no growth, no
    # eviction) and aligns every frame — including the first — against the
    # preloaded map (pass `initial_map=` from a checkpoint).  The
    # map-then-localize half of the checkpoint workflow.
    fuse_scans: bool = True
    # Registration objective against the map: "vgicp" (sqrt(n)-weighted
    # frozen-Mahalanobis GICP, the default), or "ndt_d2d"/"ndt_p2d" —
    # Cauchy-robust NDT weights (ndt_compute_derivatives.cu:15-18), which
    # resist outliers/dynamic objects when localizing against a frozen map.
    objective: str = "vgicp"
    lsq: LsqConfig = LsqConfig()


@partial(jax.jit, static_argnames=("config",))
@f32_matmuls
def align_to_map(
    state: MapState, source, source_mask, source_covs, guess,
    config: ScanToMapConfig,
) -> LsqResult:
    """Register a scan (sensor frame) against the persistent map.

    Same objective as VGICP (sqrt(n) weights, Mahalanobis frozen per
    linearization) with the map as the target Gaussian field.
    """
    vmap_ = map_as_voxelmap(state)
    offsets = jnp.asarray(
        neighbor_offsets(config.neighbor_search_method, config.neighbor_search_radius)
    )
    if config.objective in ("ndt_d2d", "ndt_p2d"):
        # Cauchy-robust NDT objective against the persistent Gaussian map
        # (D2D consumes the scan covariances, P2D treats scan points as
        # deltas); resists outliers/dynamic objects in localization mode.
        from .ndt import NDTConfig, make_ndt_objective

        ncfg = NDTConfig(
            resolution=config.resolution,
            distance_mode=config.objective[4:],
            neighbor_search_method=config.neighbor_search_method,
            neighbor_search_radius=config.neighbor_search_radius,
            lsq=config.lsq,
        )
        lin, err = make_ndt_objective(
            source, source_mask,
            None if config.objective == "ndt_p2d" else source_covs,
            vmap_, offsets, ncfg,
        )
        return lsq_solve(lin, err, guess.astype(source.dtype), config.lsq)
    from .vgicp import VGICPConfig, make_vgicp_objective

    vcfg = VGICPConfig(
        resolution=config.resolution,
        neighbor_search_method=config.neighbor_search_method,
        neighbor_search_radius=config.neighbor_search_radius,
        lsq=config.lsq,
    )
    lin, err = make_vgicp_objective(
        source, source_mask, source_covs, vmap_, offsets, vcfg
    )
    return lsq_solve(lin, err, guess.astype(source.dtype), config.lsq)


@jax.jit
@f32_matmuls
def _to_world(pose, points, covs):
    """Transform a scan + covariances into the world frame at full f32
    matmul precision — eager dispatch would run the (points @ R^T) and
    R C R^T contractions in bf16 passes and bake ~0.4% coordinate error
    permanently into the map."""
    return (
        se3.transform_points(pose, points),
        se3.rotate_covs(pose[:3, :3], covs),
    )


@jax.jit
@f32_matmuls
def _compose(a, b):
    return se3.orthonormalize(a @ b)


@partial(jax.jit, static_argnames=("gate_t", "gate_r", "relock_after"))
@f32_matmuls
def _gate_pose(aligned, guess, converged, error, hessian, gate_t, gate_r,
               streak=None, relock_after=None):
    """Tracking gate: accept the aligned pose only if it converged with a
    live objective and sits within (gate_t, gate_r) of the constant-velocity
    prediction; otherwise fall back to the prediction and signal the caller
    to skip fusion.

    The Hessian-trace check catches TOTAL track loss: with zero valid
    correspondences the normal equations are all-zero, the LM step is
    exactly identity, and the solve returns the guess "converged" —
    indistinguishable from success by pose deviation alone.  trace(H) > 0
    iff at least one valid correspondence contributed (H22 sums PSD
    Mahalanobis matrices), unlike `error > 0` which also misfires on a
    legitimate align that converges to exactly zero residual (identical
    overlapping geometry).
    """
    d = se3.invert_transform(guess) @ aligned
    t_dev = jnp.linalg.norm(d[:3, 3])
    r_dev = se3.rotation_angle(d[:3, :3])
    # Accept-form logic: a NaN deviation (lost track, degenerate Hessian)
    # compares False and therefore REJECTS — `bad | (dev > gate)` would
    # accept NaN poses.
    alive = jnp.trace(hessian) > 0.0
    live = converged & alive & jnp.isfinite(error)
    good = live
    if gate_t is not None:
        good = good & (t_dev <= gate_t)
    if gate_r is not None:
        good = good & (r_dev <= gate_r)
    if streak is None:
        return jnp.where(good, aligned, guess), ~good
    # RE-LOCK: after `relock_after` consecutive rejections the constant-
    # velocity prediction is the thing most likely to be wrong — accept a
    # LIVE align unconditionally so a lost track can re-anchor to the map
    # instead of extrapolating forever (the deviation gates alone have no
    # recovery path once the prediction departs).
    relock = live & (streak >= relock_after)
    accept = good | relock
    new_streak = jnp.where(accept, jnp.int32(0), streak + 1)
    return jnp.where(accept, aligned, guess), ~accept, new_streak


@jax.jit
@f32_matmuls
def _relative(prev, pose):
    # orthonormalized: see se3.orthonormalize — the inv/compose feedback
    # loop otherwise doubles rotation defects every frame
    return se3.orthonormalize(se3.invert_transform(prev) @ pose)


def _fused_frame_body(
    state: MapState, prev_pose, last_delta, reject_streak, pts, mask,
    config: ScanToMapConfig, covariance: str, gate_t, gate_r,
):
    """One odometry frame's graph: covariance estimation ->
    constant-velocity align -> tracking gate -> world transform -> map
    fusion.  Jitted per frame by `_fused_frame_step` and rolled over
    whole chunks by `_fused_chunk_step`."""
    from ..ops import soa
    from ..ops.covariance import knn_covariance_cols, rbf_covariance_cols

    if covariance == "rbf":
        covs6 = rbf_covariance_cols(pts, mask)  # (6, N) SoA columns
    else:
        covs6 = knn_covariance_cols(pts, mask)

    guess = se3.orthonormalize(prev_pose @ last_delta)
    result = align_to_map(state, pts, mask, covs6, guess, config)
    pose, rejected, streak = _gate_pose(
        result.transformation, guess, result.converged, result.error,
        result.hessian, gate_t, gate_r,
        streak=reject_streak, relock_after=config.gate_relock_after,
    )
    new_delta = jnp.where(
        rejected,
        last_delta,
        se3.orthonormalize(se3.invert_transform(prev_pose) @ pose),
    )
    if config.fuse_scans:
        world_pts = se3.transform_points(pose, pts)
        world_cov9 = soa.sym_cols_to_rows9(
            soa.rotate_sym_cols(pose[:3, :3], covs6)
        )
        fuse_mask = mask & ~rejected
        state = update_map(
            state, world_pts, world_cov9, fuse_mask,
            new_cap=config.new_per_frame_capacity,
        )
    return state, pose, new_delta, streak


@partial(
    jax.jit,
    static_argnames=("config", "covariance", "gate_t", "gate_r"),
    donate_argnums=(0,),
)
@f32_matmuls
def _fused_frame_step(
    state: MapState, prev_pose, last_delta, reject_streak, pts, mask,
    config: ScanToMapConfig, covariance: str, gate_t, gate_r,
):
    """One odometry frame as ONE device program.  The multi-dispatch
    driver paid ~5 jit dispatches per frame (~1-3 ms each of host/tunnel
    overhead — the wall-clock bottleneck at ~30 ms/frame on this host);
    this is a single dispatch, and the map state is donated so fusion
    updates in place."""
    return _fused_frame_body(
        state, prev_pose, last_delta, reject_streak, pts, mask,
        config, covariance, gate_t, gate_r,
    )


@partial(
    jax.jit,
    static_argnames=("config", "covariance", "gate_t", "gate_r"),
    donate_argnums=(0,),
)
@f32_matmuls
def _fused_chunk_step(
    state: MapState, prev_pose, last_delta, reject_streak, pts, mask,
    config: ScanToMapConfig, covariance: str, gate_t, gate_r,
):
    """A CHUNK of frames as one device program: `lax.scan` of the fused
    frame body with the map state in the carry.  Cuts the host cost from
    ~2 dispatches per FRAME (which caps any host-driven loop at ~230 fps
    on a 1-core host) to ~2 per CHUNK; growth/eviction checks run between
    chunks (`ScanToMapOdometry.process_chunk`).

    pts (C, N, 3) / mask (C, N); returns (state, poses (C, 4, 4),
    last_delta, reject_streak)."""

    def step(carry, frame):
        st, prev, delta, streak = carry
        p, m = frame
        st, pose, delta, streak = _fused_frame_body(
            st, prev, delta, streak, p, m, config, covariance, gate_t, gate_r
        )
        return (st, pose, delta, streak), pose

    (state, _, last_delta, reject_streak), poses = jax.lax.scan(
        step, (state, prev_pose, last_delta, reject_streak), (pts, mask)
    )
    return state, poses, last_delta, reject_streak


@partial(jax.jit, static_argnames=("config", "covariance"), donate_argnums=(0,))
@f32_matmuls
def _fused_first_frame(state: MapState, pts, mask, pose,
                       config: ScanToMapConfig, covariance: str):
    from ..ops import soa
    from ..ops.covariance import knn_covariance_cols, rbf_covariance_cols

    if covariance == "rbf":
        covs6 = rbf_covariance_cols(pts, mask)
    else:
        covs6 = knn_covariance_cols(pts, mask)
    # anchor the first scan at `pose` (identity for a fresh run; the resume
    # pose when continuing a mapping session from a checkpoint)
    world_pts = se3.transform_points(pose, pts)
    cov9 = soa.sym_cols_to_rows9(
        soa.rotate_sym_cols(pose[:3, :3], covs6)
    )
    state = update_map(
        state, world_pts, cov9, mask, new_cap=config.new_per_frame_capacity
    )
    return state


class ScanToMapOdometry:
    """Host-side odometry driver over the persistent map.

    Per frame: constant-velocity guess -> align_to_map -> fuse the scan into
    the map at the estimated pose.  The first frame initializes the map.

    Fully device-chained AND single-dispatch: the entire frame (covariance
    estimation, align, gate, fusion) runs as one donated-state jit, so the
    host's per-frame cost is one enqueue — read `poses` (or the `process`
    return value, an np.ndarray) to synchronize.
    """

    def __init__(self, config: ScanToMapConfig = ScanToMapConfig(),
                 covariance: str = "rbf", initial_map: MapState = None,
                 bucket: int = None, initial_pose=None,
                 initial_velocity=None):
        self.config = config
        self.covariance = covariance
        # initial_map: resume from a `save_map` checkpoint (map-then-localize
        # workflows); its resolution overrides config.resolution.
        self.state = (
            initial_map
            if initial_map is not None
            else empty_map(config.capacity, config.resolution)
        )
        # initial_pose: where the sensor starts in the map frame — the
        # alignment guess for frame 0 when resuming against a non-empty
        # checkpoint, or where the first scan is anchored on a fresh map.
        self._anchor = (
            jnp.eye(4, dtype=jnp.float32) if initial_pose is None
            else jnp.asarray(initial_pose, jnp.float32)
        )
        # Resuming MAPPING against a non-empty checkpoint must align frame 0
        # before fusing it (stamping it in unaligned corrupts the map);
        # only a genuinely empty map anchors frame 0 at `initial_pose`.
        self._align_first_frame = (
            initial_map is not None and int(initial_map.num_voxels) > 0
        )
        # device-side pose chain: (4, 4) entries from per-frame processing,
        # (C, 4, 4) entries from process_chunk — flattened by `poses`
        self._poses_dev = []
        self._last_pose = None  # device (4, 4) of the latest frame
        self._n_frames = 0
        # initial_velocity: the previous session's last frame-to-frame
        # delta, so a resumed track starts with a constant-velocity guess
        # (and active deviation gates) instead of a standstill prediction.
        self._last_delta = (
            jnp.eye(4, dtype=jnp.float32) if initial_velocity is None
            else jnp.asarray(initial_velocity, jnp.float32)
        )
        self._resumed_velocity = initial_velocity is not None
        self._reject_streak = jnp.int32(0)
        self._frames_since_check = 0
        self._frames_since_evict = 0
        # Sticky padding bucket (avoids recompile storms); pass `bucket`
        # (max expected scan size) to pin it up front — a mid-sequence
        # bucket growth recompiles the fused frame graph (~minutes on the
        # remote-TPU tunnel).
        self._bucket = None if bucket is None else bucket_size(bucket)

    def _maybe_grow(self) -> None:
        """Grow the map 2x when >70% full (checked every grow_check_every
        frames; the fill read synchronizes, so it is amortized).

        One copy of the per-frame policy for both the single-device and
        sharded drivers — the sharded subclass overrides only the
        `_capacity/_max_capacity/_fill/_grow/_compact` primitives."""
        if not self.config.fuse_scans:
            return  # frozen map (localization mode): no growth, no eviction
        self._maybe_evict()
        self._frames_since_check += 1
        if self._frames_since_check < self.config.grow_check_every:
            return
        self._frames_since_check = 0
        capacity = self._capacity()
        max_capacity = self._max_capacity()
        fill = self._fill()
        if capacity >= max_capacity:
            if (fill > 0.95 * capacity
                    and not getattr(self, "_warned_full", False)):
                self._warned_full = True
                import warnings

                warnings.warn(
                    f"map at max capacity ({fill}/{capacity} voxels"
                    f"{self._capacity_scope}); new voxels will be dropped"
                )
            return
        if fill > 0.7 * capacity:
            self._grow(min(capacity * 2, max_capacity))

    def _maybe_evict(self) -> None:
        """Every evict_every frames, drop voxels beyond eviction_radius of
        the current pose (enqueued device-side; no sync)."""
        if self.config.eviction_radius is None or self._last_pose is None:
            return
        self._frames_since_evict += 1
        if self._frames_since_evict < self.config.evict_every:
            return
        self._frames_since_evict = 0
        center = self._last_pose[:3, 3]
        self._compact(center, jnp.float32(self.config.eviction_radius))

    # --- capacity-policy primitives (overridden by the sharded driver) ---

    _capacity_scope = ""  # sharded driver: " on the fullest shard"

    def _capacity(self) -> int:
        return self.state.sums.shape[0]

    def _max_capacity(self) -> int:
        return self.config.max_capacity

    def _fill(self) -> int:
        """Current voxel count (fullest shard's, in the sharded driver);
        synchronizes."""
        return int(jax.device_get(self.state.num_voxels))

    def _grow(self, new_capacity: int) -> None:
        self.state = grow_map(self.state, new_capacity)

    def _compact(self, center, radius) -> None:
        self.state = compact_map(self.state, center, radius)

    def re_anchor(self):
        """Move the map frame to the current pose (long-drive numerics).

        Kilometres from the map origin, the per-frame align's f32 normal
        equations erode (see `re_anchor_map`); calling this every few km
        keeps lever arms bounded by the local scene.  The map, the
        stored pose chain, and the current pose all shift together, so
        the trajectory stays self-consistent in the NEW frame; the
        applied world shift (float64 (3,), a resolution multiple) is
        returned for callers that accumulate a global offset.  One map
        dispatch plus one small op per stored pose; synchronizes once to
        read the current pose."""
        import numpy as np

        if self._last_pose is None:
            return np.zeros(3)
        res = float(jax.device_get(self.state.resolution))
        # _last_pose is always the flat (4, 4) latest pose, even when the
        # stored chain holds (chunk, 4, 4) blocks from process_chunk.
        t = np.asarray(jax.device_get(self._last_pose))[:3, 3]
        k = np.round(t / res).astype(np.int32)
        if not k.any():
            return np.zeros(3)
        shift = k.astype(np.float64) * res
        self._re_anchor_state(k)
        sh = jnp.asarray(shift, jnp.float32)
        # `...` handles both (4, 4) poses and (chunk, 4, 4) blocks.
        self._poses_dev = [
            p.at[..., :3, 3].add(-sh) for p in self._poses_dev
        ]
        self._last_pose = self._last_pose.at[:3, 3].add(-sh)
        return shift

    def _re_anchor_state(self, k) -> None:
        """Shift the map state by -k cells (hook: the sharded subclass
        re-routes voxels across shards instead, ownership being a
        hash of coords)."""
        self.state = re_anchor_map(self.state, jnp.asarray(k))

    def _covs(self, points, mask):
        from ..ops.covariance import knn_covariances_jit, rbf_covariances_jit

        if self.covariance == "rbf":
            return rbf_covariances_jit(points, mask)
        return knn_covariances_jit(points, mask)

    @property
    def poses(self):
        """Synchronize and return the pose chain as float64 ndarrays."""
        import numpy as np

        out = []
        for p in jax.device_get(self._poses_dev):
            a = np.asarray(p, dtype=np.float64)
            if a.ndim == 3:  # a process_chunk block
                out.extend(a)
            else:
                out.append(a)
        return out

    @property
    def velocity(self):
        """The latest frame-to-frame delta (4x4 ndarray) — together with
        `poses[-1]` and `save()`, the complete resume state: pass them as
        `initial_velocity=`/`initial_pose=`/`initial_map=` to continue a
        mapping session in a new process."""
        import numpy as np

        return np.asarray(jax.device_get(self._last_delta), dtype=np.float64)

    # Hooks overridden by the sharded driver (parallel/sharded_map.py) —
    # the sharded driver sets _fused_frames = False and takes the
    # multi-dispatch path below.
    _fused_frames = True

    def _align(self, pts, mask, covs, guess):
        return align_to_map(self.state, pts, mask, covs, guess, self.config)

    def _fuse(self, world_pts, world_covs, fuse_mask):
        self.state = update_map(
            self.state, world_pts, world_covs, fuse_mask,
            new_cap=self.config.new_per_frame_capacity,
        )

    def process_async(self, scan):
        """Feed one (N, 3) scan; returns the pose as a DEVICE array without
        synchronizing (pipelines across frames)."""
        import numpy as np

        from ..utils.padding import bucket_size, pad_points

        scan = np.asarray(scan)
        if self._fused_frames:
            return self._process_fused(scan)
        # Sticky padding bucket with 10% headroom: scan sizes wander frame
        # to frame, and every new padded size costs a full recompile of the
        # covariance/align/update graphs (~5-10 s each on a TPU runtime);
        # oversizing instead taxes the N^2 covariance stage every frame.
        if self._bucket is None or len(scan) > self._bucket:
            self._bucket = bucket_size(int(len(scan) * 1.1))
        padded, mask_np = pad_points(scan, self._bucket)
        pts = jnp.asarray(padded)
        mask = jnp.asarray(mask_np)
        covs = self._covs(pts, mask)

        if (self._n_frames == 0 and self.config.fuse_scans
                and not self._align_first_frame):
            pose = self._anchor
            fuse_mask = mask
        else:
            # localization mode (fuse_scans=False) and checkpoint-resumed
            # mapping align from frame 0 against the preloaded map;
            # fresh-map mode from frame 1
            prev = (self._last_pose if self._last_pose is not None
                    else self._anchor)
            guess = _compose(prev, self._last_delta)
            result = self._align(pts, mask, covs, guess)
            # Until a velocity estimate exists (frame 2), the prediction is
            # identity and any real motion would trip the deviation gates —
            # but the liveness checks (converged, finite, error > 0) apply
            # from the first align.
            have_velocity = self._n_frames >= 2 or self._resumed_velocity
            pose, rejected, self._reject_streak = _gate_pose(
                result.transformation, guess, result.converged, result.error,
                result.hessian,
                self.config.gate_translation if have_velocity else None,
                self.config.gate_rotation if have_velocity else None,
                streak=self._reject_streak,
                relock_after=self.config.gate_relock_after,
            )
            fuse_mask = mask & ~rejected  # rejected scans don't fuse
            # On reject, keep the old delta VERBATIM: recomputing it as
            # inv(prev) @ (prev @ delta) amplifies any non-orthonormality
            # of prev exponentially across consecutive rejections.
            self._last_delta = jnp.where(
                rejected, self._last_delta, _relative(prev, pose)
            )

        if self.config.fuse_scans:
            world_pts, world_covs = _to_world(pose, pts, covs)
            self._fuse(world_pts, world_covs, fuse_mask)
        self._poses_dev.append(pose)
        self._last_pose = pose
        self._n_frames += 1
        self._maybe_grow()
        return pose

    def _process_fused(self, scan):
        """Single-dispatch per-frame path (see `_fused_frame_step`)."""
        from ..utils.padding import bucket_size, pad_points

        if self._bucket is None or len(scan) > self._bucket:
            self._bucket = bucket_size(int(len(scan) * 1.1))
        padded, mask_np = pad_points(scan, self._bucket)
        pts = jnp.asarray(padded)
        mask = jnp.asarray(mask_np)

        if (not self._poses_dev and self.config.fuse_scans
                and not self._align_first_frame):
            pose = self._anchor
            self.state = _fused_first_frame(
                self.state, pts, mask, pose, self.config, self.covariance
            )
        else:
            # localization mode and checkpoint-resumed mapping align from
            # frame 0 (guess = the resume pose / anchor)
            prev = (self._poses_dev[-1] if self._poses_dev
                    else self._anchor)
            have_velocity = (len(self._poses_dev) >= 2
                             or self._resumed_velocity)
            self.state, pose, self._last_delta, self._reject_streak = (
                _fused_frame_step(
                    self.state, prev, self._last_delta,
                    self._reject_streak, pts, mask,
                    self.config, self.covariance,
                    self.config.gate_translation if have_velocity else None,
                    self.config.gate_rotation if have_velocity else None,
                )
            )
        self._poses_dev.append(pose)
        self._last_pose = pose
        self._n_frames += 1
        self._maybe_grow()
        return pose

    def process(self, scan) -> "np.ndarray":
        """Feed one (N, 3) scan; returns the estimated world pose (4x4)
        as a synchronized float64 ndarray."""
        import numpy as np

        return np.asarray(self.process_async(scan), dtype=np.float64)

    def process_chunk(self, scans) -> None:
        """Feed a LIST of (N, 3) scans as ONE device program (lax.scan of
        the fused frame step with the map state in the carry).

        `process_async` still pays ~2 host dispatches + one ~200 KB upload
        per FRAME — on a 1-core host behind the ~35 ms-latency tunnel that
        caps the wall rate at ~75 fps regardless of device speed.  Chunking
        pays that cost once per chunk.  Semantics match frame-by-frame
        processing exactly (same body, same gate/fusion dataflow — pinned
        by test); the only behavioral differences are cadence: growth
        headroom is checked before each chunk instead of every
        `grow_check_every` frames, and eviction runs between chunks.
        Choose chunk length <= grow_check_every so capacity policy keeps
        its per-policy granularity; 16-64 frames is a good range.

        Warm-up frames (the map-anchoring first frame, and frames until a
        velocity estimate activates the deviation gates) take the
        per-frame path automatically, so `process_chunk` can be the only
        API a caller uses."""
        import numpy as np

        from ..utils.padding import bucket_size, pad_points

        scans = [np.asarray(s) for s in scans]
        # warm-up: per-frame until the gate params are stable for a whole
        # chunk (gate_t/gate_r are jit-static in _fused_chunk_step)
        need = 1 if self._resumed_velocity else 2
        while scans and self._n_frames < need:
            self.process_async(scans.pop(0))
        if not scans:
            return
        if not self._fused_frames:
            # sharded driver: multi-dispatch per frame (its shard_map
            # graphs are not chunk-rolled); keep the API uniform
            for s in scans:
                self.process_async(s)
            return
        if self.config.fuse_scans and self._n_frames:
            # give the whole chunk growth headroom now — the next fill
            # check can only happen after the chunk
            self._frames_since_check = self.config.grow_check_every
            self._maybe_grow()
        biggest = max(len(s) for s in scans)
        if self._bucket is None or biggest > self._bucket:
            self._bucket = bucket_size(int(biggest * 1.1))
        padded = [pad_points(s, self._bucket) for s in scans]
        pts = jnp.asarray(np.stack([p for p, _ in padded]))
        msk = jnp.asarray(np.stack([m for _, m in padded]))
        prev = (self._last_pose if self._last_pose is not None
                else self._anchor)
        self.state, poses, self._last_delta, self._reject_streak = (
            _fused_chunk_step(
                self.state, prev, self._last_delta, self._reject_streak,
                pts, msk, self.config, self.covariance,
                self.config.gate_translation, self.config.gate_rotation,
            )
        )
        self._poses_dev.append(poses)
        self._last_pose = poses[-1]
        self._n_frames += len(scans)
        # count the chunk's frames toward the growth/eviction cadences
        self._frames_since_evict += len(scans) - 1
        self._frames_since_check += len(scans) - 1
        self._maybe_grow()

    def save(self, path: str) -> None:
        """Checkpoint the map (poses are host state — persist them with
        utils.kitti.save_poses_kitti if needed)."""
        save_map(path, self.state)
