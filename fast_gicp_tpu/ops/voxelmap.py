"""Gaussian voxel map with fixed shapes: sort/segment build + open-addressing
hash lookup.

TPU-native redesign of the reference's two voxel maps:
  * CPU `GaussianVoxelMap` — std::unordered_map with serial insertion
    (fast_vgicp_voxel.hpp:124-182)
  * GPU hash map — atomicCAS bucket claiming + atomic scatter accumulation
    (gaussian_voxelmap.cu:9-292)

Neither pointer-chasing maps nor atomics fit XLA, so the build is phrased as
dataflow: lexicographic sort of integer voxel coords (`lax.sort`, 3 keys),
boundary detection -> dense voxel ids, segment-sum accumulation of
(count, mean, cov) statistics, then a vectorized open-addressing insert: a
few rounds of scatter-min "claiming" replace the reference's atomicCAS probe
loop (gaussian_voxelmap.cu:21-58).  Lookup probes the same table with pure
gathers, verifying coordinates exactly — hash collisions cannot alias.

All shapes are static: `capacity` voxels (<= N points) and a power-of-two
`table_size`.  Everything jits and vmaps.

Voxel coordinate convention matches the reference exactly:
coord = floor(x / resolution - 0.5) (fast_vgicp_voxel.hpp:158-160).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import linalg3

# Sentinel coordinate for masked points: sorts after all real coords.
# numpy scalars, NOT jnp: a module-level jnp constant initializes the XLA
# backend at import time, which breaks multi-host bootstrap
# (jax.distributed.initialize must run before any backend init).
_COORD_SENTINEL = np.int32(2**30)
_EMPTY = np.int32(2**30)  # empty hash slot marker (scatter-min identity)

# Linear-probe bound shared by insert and lookup.  At 1/8 load factor the
# expected displacement is <1 slot, but with tens of thousands of voxels the
# tail matters: a window of 4 occasionally fills (observed ~1 dropped voxel
# per ~1e4 at load 1/8), silently losing that voxel's correspondences.  At 8
# the failure probability is negligible; each extra probe round costs one
# gather pass, and the dense-grid map (the default fast path) does not probe
# at all.  Insert displacement can never exceed lookup's probe depth since
# both use this constant.
MAX_PROBE = 8

ACCUMULATION_MODES = ("additive", "additive_weighted", "multiplicative", "raw")

# Spatial hash: three large primes, classic Teschner-style mixing. The
# reference GPU map uses a boost-style hash_combine (vector3_hash.cuh:8-38);
# any well-mixing function works because lookups verify coordinates.
_HP1, _HP2, _HP3 = np.uint32(73856093), np.uint32(19349669), np.uint32(83492791)


def voxel_coord(points, resolution):
    """floor(p / resolution - 0.5) as int32 (fast_vgicp_voxel.hpp:158-160)."""
    return jnp.floor(points / resolution - 0.5).astype(jnp.int32)


def _hash_coords(coords):
    """(N, 3) int32 -> uint32 hash."""
    c = coords.astype(jnp.uint32)
    return (c[..., 0] * _HP1) ^ (c[..., 1] * _HP2) ^ (c[..., 2] * _HP3)


class VoxelMap(NamedTuple):
    """Fixed-capacity Gaussian voxel map (device arrays).

    `packed` and `lut` are gather-optimized duplicates: TPU gathers dominate
    the correspondence path, so voxel stats ride in ONE row-gather of 16
    floats (instead of 3 gathers) and the hash table stores its own
    verification coords (one 4-int gather per probe instead of two).
    """

    means: jax.Array  # (C, 3) finalized voxel means
    covs: jax.Array  # (C, 3, 3) finalized voxel covariances
    counts: jax.Array  # (C,) int32 points per voxel
    coords: jax.Array  # (C, 3) int32 voxel integer coords
    table: jax.Array  # (T,) int32 open-addressing table -> voxel index
    num_voxels: jax.Array  # () int32
    resolution: jax.Array  # () f32
    packed: jax.Array  # (C, 16) f32 [mean(3), cov(9), count, pad(3)]
    lut: jax.Array  # (T, 4) int32 [voxel index, cx, cy, cz]


class DenseRawGridMap(NamedTuple):
    """Raw accumulator map with a gather-friendly dense index grid -- the
    fastest registration map (built fresh every align in odometry).

    TPU memory facts that shape the design (measured on v5e at 22k points,
    524k cells):
      * scatters into VMEM-sized tables run fast; scatters into a dense
        (524k, 16) f32 HBM table are latency-bound at ~70 ns per update
        row (~1.5 ms per build) -- so the per-voxel stats stay in a
        COMPACT (N + 1, 16) table (1.4 MB, VMEM-resident) keyed by
        representative point index, like GridVoxelMap's sparse vids.
      * a 1-D int32 gather lowers to a scalar-core kernel at ~7 elements/
        us (160 us per LM iteration) -- so the dense claim grid is
        RESHAPED to (ncells/8 + 1, 8) rows: lookup = one int32 ROW gather
        + an 8-lane one-hot pick, never a 1-D gather.
      * stats rows are UNFINALIZED additive sums [count, sum mean (3),
        sum cov (9), pad (3)] -- consumers divide after gathering (in the
        fused Pallas kernel), which deletes the build's finalize and pack
        passes entirely.

    Row N of `rows` is an all-zero sentinel: misses (empty cell, out of
    grid, masked point) resolve there and read back count = 0.  Additive
    accumulation semantics identical to AdditiveGaussianVoxel
    (fast_vgicp_voxel.hpp:105-122).
    """

    rows: jax.Array  # (N + 1, 16) f32 raw sums; row N zeros
    grid8: jax.Array  # (ncells/8 + 1, 8) int32 -> rep point index or N
    origin: jax.Array  # (3,) int32 voxel coord of cell 0
    resolution: jax.Array  # () f32


def _pick8(grid8, flat):
    """grid8 row-gather + one-hot lane pick: flat cell ids (...,) -> the
    stored rep index.  The last row (all-sentinel) serves parked queries."""
    r8 = grid8[flat >> 3]  # (..., 8) int32 row gather
    lane = (flat & 7)[..., None]
    iota = jnp.arange(8, dtype=flat.dtype)
    return jnp.sum(jnp.where(iota == lane, r8, 0), axis=-1)


def build_raw_grid(points, mask, resolution, covs, grid_dims):
    """Build a `DenseRawGridMap` from (N, 3) points + per-point covariances.

    covs may be (N, 3, 3) AoS, (N, 9) row-major rows, or (6, N) sym-6
    columns (the SoA covariance pipeline's native format).
    """
    from . import soa

    n = points.shape[0]
    dtype = points.dtype
    gx, gy, gz = grid_dims
    ncells = gx * gy * gz
    if ncells % 8:
        raise ValueError(f"grid cell count {ncells} must be a multiple of 8")

    coords = voxel_coord(points, resolution)
    origin = jnp.min(
        jnp.where(mask[:, None], coords, _COORD_SENTINEL), axis=0
    )
    rel = coords - origin
    dims = jnp.asarray([gx, gy, gz], jnp.int32)
    inside = mask & jnp.all((rel >= 0) & (rel < dims), axis=-1)
    flat = (rel[:, 0] * gy + rel[:, 1]) * gz + rel[:, 2]
    flat = jnp.where(inside, flat, ncells)  # parked on the sentinel tail

    # Claim: lowest member point index per cell (the dataflow analogue of
    # the reference's atomicCAS claim, gaussian_voxelmap.cu:41-43) -- a
    # 1-D int32 scatter-min into the 2 MB grid.  Unclaimed cells keep `n`
    # (-> the zero stats row).  The trailing 8 slots form the sentinel row.
    point_idx = jnp.arange(n, dtype=jnp.int32)
    claim = jnp.full(ncells + 8, n, jnp.int32).at[flat].min(point_idx)
    grid8 = claim.reshape(ncells // 8 + 1, 8)
    rep = _pick8(grid8, flat)

    if covs.ndim == 3:
        cov9 = covs.reshape(n, 9)
    elif covs.shape == (6, n):
        cov9 = soa.sym_cols_to_rows9(covs)
    else:
        cov9 = covs
    contrib = jnp.concatenate(
        [
            jnp.ones((n, 1), dtype),
            points,
            cov9,
            jnp.zeros((n, 3), dtype),
        ],
        axis=1,
    ) * inside.astype(dtype)[:, None]
    # Parked points carry rep == n and zeroed contribs -> row n stays zero.
    vid = jnp.where(inside, rep, n)
    rows = jnp.zeros((n + 1, 16), dtype).at[vid].add(contrib)
    return DenseRawGridMap(
        rows=rows,
        grid8=grid8,
        origin=origin,
        resolution=jnp.asarray(resolution, dtype),
    )


class NdtGridMap(NamedTuple):
    """Compact-finalized NDT voxel map (round-5 fast build).

    Same consumer contract as a finalized GridVoxelMap (gatherable
    (n + 1, 16) packed rows [mu(3) cov9 count pad3]) but the build never
    finalizes the full table: occupied voxels are compacted FIRST
    (jnp.nonzero with a static budget) and the finalize + MIN_EIG clamp +
    pack run on the compact set only, then scatter back into `packed`
    (~4k rows instead of ~16k full-table rows for each of the three
    passes).  Per-voxel raw moments are taken about each voxel's own
    corner so the E[xx] - mu mu^T subtraction never cancels at cloud
    extents (round-3b windowed-moment lesson).

    The index grid stores REPRESENTATIVE-POINT ids (`rep`-or-`n` like
    DenseRawGridMap, not vid-or--1): misses and over-budget drops resolve
    to packed row `n` (all zeros -> count 0 -> invalid), so consumers
    need no separate validity select.  Matches the reference's voxelmap
    create + ndt finalize (gaussian_voxelmap.cu ndt_finalize_voxels_kernel,
    ndt_cuda.cu:120-140); over-budget occupied voxels are dropped like the
    reference GPU hash drops on bucket-scan overflow
    (gaussian_voxelmap.cu:37-52).
    """

    packed: jax.Array  # (n + 1, 16); row n all-zero sentinel
    grid: jax.Array  # (gx, gy, gz) int32 rep-or-n (static shape carrier)
    grid8: jax.Array  # (ncells/8 + 1, 8) int32; last row all n
    origin: jax.Array  # (3,) int32 voxel coord of cell 0
    resolution: jax.Array  # () f32


def lookup_ndt_cols(nmap: NdtGridMap, cx, cy, cz):
    """SoA lookup on an NdtGridMap: coord columns -> rep-or-n ids.

    Out-of-grid queries park on grid8's all-`n` sentinel row; id `n`
    indexes the zero row of `packed` (count 0 -> invalid downstream)."""
    gx, gy, gz = nmap.grid.shape
    ncells = gx * gy * gz
    rx = cx - nmap.origin[0]
    ry = cy - nmap.origin[1]
    rz = cz - nmap.origin[2]
    inside = (
        (rx >= 0) & (rx < gx) & (ry >= 0) & (ry < gy) & (rz >= 0) & (rz < gz)
    )
    flat = (rx * gy + ry) * gz + rz
    return _pick8(nmap.grid8, jnp.where(inside, flat, ncells))


class RawNdtGrid(NamedTuple):
    """UNFINALIZED NDT voxel map — the fresh-align fast path (round 5).

    The build is exactly two N-row passes (claim scatter-min + moment
    scatter-add) plus the rep readback; there is no finalize, no MIN_EIG
    clamp, no pack, and no compaction — consumers gather raw rows
    [count, sum d (3), sum dd sym-6 (6)] (moments about each voxel's own
    corner, so nothing cancels) and finalize + clamp INSIDE the fused
    linearize kernel, where the lane math is free (the kernel is
    memory-bound).  The voxel corner is reconstructed from the QUERY
    coordinate at lookup time (o = (c + 1) * res, exact), so it needs no
    storage.  Index grid stores rep-or-n like NdtGridMap; row n of
    `rows` is the all-zero miss sentinel (count 0)."""

    rows: jax.Array  # (n + 1, 10) f32 [cnt, sum d(3), sum dd sym-6(6)]
    grid: jax.Array  # (gx, gy, gz) int32 rep-or-n (static shape carrier)
    grid8: jax.Array  # (ncells/8 + 1, 8) int32; last row all n
    origin: jax.Array  # (3,) int32
    resolution: jax.Array  # () f32


def _ndt_claim_acc(points, mask, resolution, grid_dims):
    """Shared NDT grid-build core: claim + corner-origin moment scatter.

    Returns (acc (n + 1, 10), claim (ncells + 8,), grid8, origin)."""
    n = points.shape[0]
    dtype = points.dtype
    gx, gy, gz = grid_dims
    ncells = gx * gy * gz
    if ncells % 8:
        raise ValueError(f"grid cell count {ncells} must be a multiple of 8")

    # (3, N) column pipeline (an (N, 3) elementwise pipeline pads 3 lanes
    # to 128; see _build_grid_voxelmap)
    pc = jnp.swapaxes(points, 0, 1)
    coords_c = jnp.floor(pc / resolution - 0.5).astype(jnp.int32)
    origin = jnp.min(
        jnp.where(mask[None, :], coords_c, _COORD_SENTINEL), axis=1
    )
    rel = coords_c - origin[:, None]
    dims = jnp.asarray([gx, gy, gz], jnp.int32)
    inside = mask & jnp.all((rel >= 0) & (rel < dims[:, None]), axis=0)
    flat = jnp.where(inside, (rel[0] * gy + rel[1]) * gz + rel[2], ncells)

    point_idx = jnp.arange(n, dtype=jnp.int32)
    claim = jnp.full(ncells + 8, n, jnp.int32).at[flat].min(point_idx)
    grid8 = claim.reshape(ncells // 8 + 1, 8)
    rep = _pick8(grid8, flat)
    vid = jnp.where(inside, rep, n)

    # Raw moments about each voxel's own corner (o = (c + 1) * res, the
    # center of the floor(x/res - 0.5) bin): within-voxel deltas are
    # <= res, so the finalize subtraction never cancels.
    w = inside.astype(dtype)
    o = (coords_c.astype(dtype) + 1.0) * resolution
    dx, dy, dz = pc[0] - o[0], pc[1] - o[1], pc[2] - o[2]
    contrib = jnp.stack(
        [w, dx * w, dy * w, dz * w,
         dx * dx * w, dx * dy * w, dx * dz * w,
         dy * dy * w, dy * dz * w, dz * dz * w],
        axis=1,
    )  # (N, 10): [count, sum d(3), sum dd sym-6]
    acc = jnp.zeros((n + 1, 10), dtype).at[vid].add(contrib)
    return acc, claim, grid8, origin


def build_ndt_raw_grid(points, mask, resolution, grid_dims):
    """Minimal fresh-align NDT build: claim + moment scatter, nothing else
    (see RawNdtGrid)."""
    dtype = points.dtype
    gx, gy, gz = grid_dims
    ncells = gx * gy * gz
    acc, claim, grid8, origin = _ndt_claim_acc(
        points, mask, resolution, grid_dims
    )
    return RawNdtGrid(
        rows=acc,
        grid=claim[:ncells].reshape(gx, gy, gz),
        grid8=grid8,
        origin=origin,
        resolution=jnp.asarray(resolution, dtype),
    )


def build_ndt_grid_compact(
    points,
    mask,
    resolution,
    grid_dims,
    budget: int,
    min_eig: float = 1e-3,
    with_map: bool = True,
    with_stats: bool = False,
):
    """One-pass NDT grid build with compact finalize (see NdtGridMap).

    Returns (map_or_None, stats_or_None) where stats =
    (means (budget, 3), valid (budget,), cov6 (6, budget)) — the compact
    occupied-voxel statistics (what D2D's source side consumes directly,
    replacing build + `_compact_source_voxels`).
    """
    from . import soa

    n = points.shape[0]
    dtype = points.dtype
    gx, gy, gz = grid_dims
    ncells = gx * gy * gz
    acc, claim, grid8, origin = _ndt_claim_acc(
        points, mask, resolution, grid_dims
    )

    # Compact occupied rows FIRST; finalize/clamp/pack only those.
    occ = acc[:n, 0] > 0
    n_occ = jnp.sum(occ.astype(jnp.int32))
    (idx,) = jnp.nonzero(occ, size=budget, fill_value=n)
    valid = jnp.arange(budget, dtype=jnp.int32) < n_occ
    accT = acc[idx].T  # (10, B)
    cnt = accT[0]
    inv_n = jnp.where(cnt > 0, 1.0 / jnp.maximum(cnt, 1.0), 0.0)
    dmu = accT[1:4] * inv_n  # (3, B) mean offset from the voxel corner
    # voxel corner of each compact row from its representative point
    rep_c = jnp.swapaxes(points[idx], 0, 1)  # (3, B)
    oc = (jnp.floor(rep_c / resolution - 0.5) + 1.0) * resolution
    mu = (oc + dmu) * valid[None, :]
    E6 = accT[4:10] * inv_n
    C6 = E6 - jnp.stack(
        [dmu[0] * dmu[0], dmu[0] * dmu[1], dmu[0] * dmu[2],
         dmu[1] * dmu[1], dmu[1] * dmu[2], dmu[2] * dmu[2]],
        axis=0,
    )
    C6c = soa.clamp_eigs_cols(C6, min_eig)

    stats = (
        (jnp.swapaxes(mu, 0, 1), valid, C6c * valid[None, :])
        if with_stats else None
    )
    if not with_map:
        return None, stats

    rows16 = jnp.concatenate(
        [
            jnp.swapaxes(mu, 0, 1),
            soa.sym_cols_to_rows9(C6c),
            cnt[:, None],
            jnp.zeros((budget, 3), dtype),
        ],
        axis=1,
    ) * valid[:, None].astype(dtype)
    # fill rows (idx == n) all carry zeros -> row n stays the zero sentinel
    packed = jnp.zeros((n + 1, 16), dtype).at[idx].set(rows16)
    nmap = NdtGridMap(
        packed=packed,
        grid=claim[:ncells].reshape(gx, gy, gz),
        grid8=grid8,
        origin=origin,
        resolution=jnp.asarray(resolution, dtype),
    )
    return nmap, stats


def lookup_raw_rows_cols(dmap: DenseRawGridMap, grid_dims, cx, cy, cz):
    """Gather raw accumulator rows for integer coord columns (...,) each.

    Two row gathers (int32 grid8 + f32 stats); count 0 in the returned
    rows means miss (out of grid or empty cell)."""
    gx, gy, gz = grid_dims
    ncells = gx * gy * gz
    n = dmap.rows.shape[0] - 1
    rx = cx - dmap.origin[0]
    ry = cy - dmap.origin[1]
    rz = cz - dmap.origin[2]
    inside = (
        (rx >= 0) & (rx < gx) & (ry >= 0) & (ry < gy) & (rz >= 0) & (rz < gz)
    )
    flat = jnp.where(inside, (rx * gy + ry) * gz + rz, ncells)
    vid = _pick8(dmap.grid8, flat)
    # parked queries hit grid8's sentinel tail (= n) -> zero stats row
    return dmap.rows[jnp.where(inside, vid, n)]


class GridVoxelMap(NamedTuple):
    """Gaussian voxel map with a dense 3-D index grid instead of a hash
    table: lookup is ONE gather (vs `MAX_PROBE` verified hash probes) and
    the build skips the scatter-min claiming rounds entirely.

    The grid covers `grid.shape` voxels starting at the dynamic `origin`
    (the min voxel coordinate of the cloud); voxels outside are dropped at
    build and miss at lookup.  Pick dims from the expected scene extent /
    resolution — e.g. (192, 192, 96) covers a 192 m x 192 m x 96 m LiDAR
    scene at 1 m resolution for 14 MB of HBM.  For unbounded maps use the
    hash-table `VoxelMap`.
    """

    means: jax.Array  # (C, 3) finalized voxel means
    covs: jax.Array  # (C, 3, 3) finalized voxel covariances
    counts: jax.Array  # (C,) int32 points per voxel
    coords: jax.Array  # (C, 3) int32 voxel integer coords
    num_voxels: jax.Array  # () int32
    resolution: jax.Array  # () f32
    packed: jax.Array  # (C, 16) f32 [mean(3), cov(9), count, pad(3)]
    grid: jax.Array  # (Dx, Dy, Dz) int32 -> voxel index or -1
    # (Dx*Dy*Dz/8 + 1, 8) duplicate of `grid` for the hot lookup: a 1-D
    # int32 gather lowers to a scalar-core kernel (~2 ms per NDT-P2D
    # refresh iteration at 7 x 16k queries); an 8-wide ROW gather + one-hot
    # lane pick rides the vector path instead (same trick as
    # DenseRawGridMap.grid8).  The last row is an all--1 sentinel so parked
    # (out-of-grid) queries resolve to miss with no extra select.
    grid8: jax.Array
    origin: jax.Array  # (3,) int32 voxel coord of grid[0, 0, 0]


def next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def segment_by_voxel(points, mask, resolution, capacity):
    """Group (N, 3) points by voxel: lexicographic sort of integer coords,
    boundary detection, dense segment ids.

    Returns (vid (N,) per-point segment id in original order — `capacity`
    for masked/overflow points, new_voxel (N,) sorted-order boundary flags,
    vid_sorted (N,), sorted_coords (N, 3), num_voxels ()).  Shared by the
    static builder and the persistent-map update.
    """
    n = points.shape[0]
    coords = voxel_coord(points, resolution)
    coords = jnp.where(mask[:, None], coords, _COORD_SENTINEL)

    point_idx = jnp.arange(n, dtype=jnp.int32)
    cx, cy, cz, order = jax.lax.sort(
        (coords[:, 0], coords[:, 1], coords[:, 2], point_idx), num_keys=3
    )
    valid_sorted = cx < _COORD_SENTINEL
    first = jnp.zeros(n, dtype=bool).at[0].set(True)
    changed = (
        (cx != jnp.roll(cx, 1)) | (cy != jnp.roll(cy, 1)) | (cz != jnp.roll(cz, 1))
    )
    new_voxel = (first | changed) & valid_sorted
    vid_sorted = jnp.cumsum(new_voxel.astype(jnp.int32)) - 1
    num_voxels = jnp.sum(new_voxel.astype(jnp.int32))
    # Invalid points -> overflow bucket `capacity` (sliced off after scatter).
    vid_sorted = jnp.where(
        valid_sorted & (vid_sorted < capacity), vid_sorted, capacity
    )
    # Map segment id back to original point order.
    vid = jnp.zeros(n, dtype=jnp.int32).at[order].set(vid_sorted)
    return vid, new_voxel, vid_sorted, jnp.stack([cx, cy, cz], axis=-1), num_voxels


def lookup_lut(lut, coords):
    """Probe an open-addressing lut (T, 4) [vid, cx, cy, cz] for integer
    coords (..., 3) -> voxel id or -1.  Shared by the static map and the
    persistent scan-to-map state.

    Early exit: a query is RESOLVED on a coordinate match or on the first
    EMPTY slot (insertion never leaves holes inside a probe chain, so an
    empty slot proves absence — same invariant as the reference's probe,
    find_voxel_correspondences.cu:43-45).  At 1/8 load nearly every query
    resolves in round 1, so the while_loop usually runs 1-2 of the
    MAX_PROBE rounds instead of all of them.
    """
    table_size = lut.shape[0]
    mask_t = jnp.uint32(table_size - 1)
    slot0 = (_hash_coords(coords) & mask_t).astype(jnp.int32)
    # lut-seeded carries: keep shard_map varying-axes types consistent when
    # the lut is device-varying but the queries are replicated.
    found = jnp.sum(coords, axis=-1) * 0 - 1 + lut[0, 0] * 0
    resolved = (found > jnp.int32(_EMPTY))  # all-False, lut-varying type

    def cond(s):
        p, _found, resolved = s
        return (p < MAX_PROBE) & ~jnp.all(resolved)

    def body(s):
        p, found, resolved = s
        slot = (slot0 + p) & jnp.int32(table_size - 1)
        row = lut[slot]
        match = jnp.all(row[..., 1:4] == coords, axis=-1)
        found = jnp.where(~resolved & match, row[..., 0], found)
        resolved = resolved | match | (row[..., 0] == _EMPTY)
        return p + 1, found, resolved

    _, found, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), found, resolved))
    return found


def build_voxelmap(
    points,
    mask,
    resolution,
    covs=None,
    mode: str = "additive",
    capacity: int | None = None,
    table_factor: int = 8,
    grid_dims: tuple | None = None,
):
    """Build a Gaussian voxel map from (N, 3) points (+ per-point covs).

    mode:
      * "additive" / "additive_weighted": voxel mean/cov = arithmetic mean of
        member means/covs (fast_vgicp_voxel.hpp:105-122; the reference
        instantiates the SAME AdditiveGaussianVoxel for both enum values,
        fast_vgicp_voxel.hpp:138-141, so these are exact aliases here too).
      * "multiplicative": information-form fusion — accumulate C_i^-1 and
        C_i^-1 mu_i, invert at finalize (fast_vgicp_voxel.hpp:79-103).
      * "raw": NDT-style — mean = E[x], cov = E[x x^T] - mu mu^T from raw
        points, no per-point covs needed (gaussian_voxelmap.cu
        ndt_finalize_voxels_kernel).

    grid_dims: static (Dx, Dy, Dz) -> return a dense-grid `GridVoxelMap`
    (single-gather lookup) instead of the hash-table `VoxelMap`.
    """
    if mode not in ACCUMULATION_MODES:
        raise ValueError(f"unknown accumulation mode: {mode}")
    if grid_dims is not None:
        return _build_grid_voxelmap(
            points, mask, resolution, covs, mode, grid_dims
        )
    n = points.shape[0]
    capacity = capacity or n
    table_size = next_pow2(table_factor * capacity)
    dtype = points.dtype

    vid, new_voxel, vid_sorted, sorted_coords, num_voxels = segment_by_voxel(
        points, mask, resolution, capacity
    )

    # One fused scatter for [count | sum mean | sum cov] (scatters have high
    # fixed cost on TPU; three separate ones measurably slow the build).
    contrib = _mode_contrib(points, mask, covs, mode)
    acc = (
        jnp.zeros((capacity + 1, 13), dtype).at[vid].add(contrib)
    )[:capacity]
    means, covs_out, counts = _finalize(acc, mode)

    # Voxel coords per voxel id (scatter from the sorted boundaries).
    vcoords = (
        jnp.zeros((capacity + 1, 3), jnp.int32)
        .at[jnp.where(new_voxel, vid_sorted, capacity)]
        .set(sorted_coords)
    )[:capacity]

    packed = _pack(means, covs_out, counts, dtype)

    table = _build_table(vcoords, num_voxels, capacity, table_size, MAX_PROBE)
    safe_t = jnp.maximum(table, 0) * (table != _EMPTY)
    lut_coords = jnp.where(
        (table != _EMPTY)[:, None], vcoords[safe_t], _COORD_SENTINEL
    )
    lut = jnp.concatenate([table[:, None], lut_coords], axis=1)

    return VoxelMap(
        means=means,
        covs=covs_out,
        counts=counts,
        coords=vcoords,
        table=table,
        num_voxels=num_voxels,
        resolution=jnp.asarray(resolution, dtype),
        packed=packed,
        lut=lut,
    )


def _mode_contrib(points, mask, covs, mode):
    """(N, 13) accumulation rows [1 | mean-contrib (3) | cov-contrib (9)].

    covs may be (N, 3, 3) AoS or (6, N) sym-6 columns."""
    n = points.shape[0]
    dtype = points.dtype
    if covs is not None and covs.shape[-2:] != (3, 3):
        from . import soa

        covs = soa.sym_cols_to_rows9(covs).reshape(n, 3, 3)
    if mode == "raw":
        m_contrib = points
        c_contrib = points[:, :, None] * points[:, None, :]
    elif mode == "multiplicative":
        if covs is None:
            raise ValueError("multiplicative mode needs per-point covariances")
        cov_inv = linalg3.inv3(covs, eps=1e-30)
        m_contrib = jnp.einsum("nij,nj->ni", cov_inv, points)
        c_contrib = cov_inv
    else:
        if covs is None:
            raise ValueError("additive mode needs per-point covariances")
        m_contrib = points
        c_contrib = covs
    return jnp.concatenate(
        [jnp.ones((n, 1), dtype), m_contrib, c_contrib.reshape(n, 9)], axis=1
    ) * mask.astype(dtype)[:, None]


def _finalize(acc, mode):
    """(C, 13) accumulated rows -> (means, covs, counts)."""
    c = acc.shape[0]
    dtype = acc.dtype
    counts = acc[:, 0].astype(jnp.int32)
    sum_means = acc[:, 1:4]
    sum_covs = acc[:, 4:13].reshape(c, 3, 3)
    n_f = jnp.maximum(acc[:, 0:1], 1.0)
    if mode == "multiplicative":
        covs_out = linalg3.inv3(sum_covs, eps=1e-30)
        means = jnp.einsum("nij,nj->ni", covs_out, sum_means)
    elif mode == "raw":
        means = sum_means / n_f
        covs_out = sum_covs / n_f[..., None] - means[:, :, None] * means[:, None, :]
    else:
        means = sum_means / n_f
        covs_out = sum_covs / n_f[..., None]
    return means, covs_out, counts


def _pack(means, covs, counts, dtype):
    c = means.shape[0]
    return jnp.concatenate(
        [
            means,
            covs.reshape(c, 9),
            counts.astype(dtype)[:, None],
            jnp.zeros((c, 3), dtype),
        ],
        axis=1,
    )


def _build_grid_voxelmap(points, mask, resolution, covs, mode, grid_dims):
    """Sortless dense-grid build: each occupied cell is claimed by its
    lowest-index member point via ONE scatter-min (the dataflow analogue of
    the reference's atomicCAS claim, gaussian_voxelmap.cu:41-43); that
    representative point's index IS the voxel id, so there is no sort, no
    boundary detection, and no compaction.  Voxel ids are sparse in [0, N)
    — consumers only ever test `vid >= 0` and gather packed rows, so
    compactness is not required.
    """
    n = points.shape[0]
    dtype = points.dtype
    gx, gy, gz = grid_dims
    ncells = gx * gy * gz

    # Coordinate pipeline in (3, N) columns: every (N, 3) elementwise op
    # pads its 3-lane dim to 128 on TPU (~43x wasted lanes), and the AoS
    # min-reduce for the origin is the same known-bad layout the candidate
    # -tile bbox fix measured at ~0.8 ms/18k points.  The (N, 3) `coords`
    # view below is test-only and DCE'd inside aligns.
    coords_c = jnp.floor(
        jnp.swapaxes(points, 0, 1) / resolution - 0.5
    ).astype(jnp.int32)  # (3, N)
    origin = jnp.min(
        jnp.where(mask[None, :], coords_c, _COORD_SENTINEL), axis=1
    )
    rel = coords_c - origin[:, None]
    dims = jnp.asarray([gx, gy, gz], jnp.int32)
    inside = mask & jnp.all((rel >= 0) & (rel < dims[:, None]), axis=0)
    flat = (rel[0] * gy + rel[1]) * gz + rel[2]
    flat = jnp.where(inside, flat, ncells)  # park masked/outside points
    coords = jnp.swapaxes(coords_c, 0, 1)

    point_idx = jnp.arange(n, dtype=jnp.int32)
    # Pad the claim table to whole 8-lane rows plus one all-sentinel row so
    # it doubles as the `grid8` lookup array (see GridVoxelMap.grid8).
    npad = ((ncells + 8) + 7) // 8 * 8
    claim = jnp.full(npad, n, jnp.int32).at[flat].min(point_idx)
    # (N,) voxel id (= representative point) per point — row gather + lane
    # pick, not a 1-D gather (see GridVoxelMap.grid8)
    rep = _pick8(claim.reshape(npad // 8, 8), flat)

    contrib = _mode_contrib(points, inside, covs, mode)
    vid = jnp.where(inside, rep, n)
    acc = (jnp.zeros((n + 1, 13), dtype).at[vid].add(contrib))[:n]
    means, covs_out, counts = _finalize(acc, mode)

    vids_flat = jnp.where(claim < n, claim, -1)
    # Sentinel tail: parked (outside/masked) points scatter into slot
    # `ncells`, so force the whole pad region back to miss.
    vids_flat = vids_flat.at[ncells:].set(-1)
    grid = vids_flat[:ncells].reshape(gx, gy, gz)
    grid8 = vids_flat.reshape(npad // 8, 8)
    return GridVoxelMap(
        means=means,
        covs=covs_out,
        counts=counts,
        coords=coords,
        num_voxels=jnp.sum((counts > 0).astype(jnp.int32)),
        resolution=jnp.asarray(resolution, dtype),
        packed=_pack(means, covs_out, counts, dtype),
        grid=grid,
        grid8=grid8,
        origin=origin,
    )


def _build_table(vcoords, num_voxels, capacity, table_size, max_probe):
    """Vectorized open-addressing insert via scatter-min claiming rounds.

    Each round every still-pending voxel tries to claim its current slot with
    a scatter-min of its id; winners are exactly the ids stored afterwards.
    Losers advance one slot (linear probing).  This is the dataflow
    equivalent of the reference's atomicCAS probe loop
    (gaussian_voxelmap.cu:21-58), with `max_probe` rounds instead of a
    dynamic retry-and-grow policy.
    """
    mask_t = jnp.uint32(table_size - 1)
    vids = jnp.arange(capacity, dtype=jnp.int32)
    pending = vids < num_voxels
    slot = (_hash_coords(vcoords) & mask_t).astype(jnp.int32)
    # `+ slot[0] * 0` taints the init table with slot's varying-manual-axes
    # tag: under shard_map each device builds its own table, and a
    # replicated-constant init would trip the fori_loop carry vma check.
    table = jnp.full(table_size, _EMPTY, jnp.int32) + slot[0] * 0

    def body(_, state):
        table, slot, pending = state
        # Only EMPTY slots may be contested — a claim, once made, is final
        # (otherwise a smaller id probing in later could steal the slot and
        # orphan the earlier winner).
        attempt = pending & (table[slot] == _EMPTY)
        try_slot = jnp.where(attempt, slot, table_size)  # park non-attempts
        table_ext = jnp.concatenate([table, jnp.full(1, _EMPTY, jnp.int32)])
        table_ext = table_ext.at[try_slot].min(vids)
        table = table_ext[:table_size]
        claimed = attempt & (table[slot] == vids)
        pending = pending & ~claimed
        slot = jnp.where(pending, (slot + 1) & jnp.int32(table_size - 1), slot)
        return table, slot, pending

    table, _, pending = jax.lax.fori_loop(
        0, max_probe, body, (table, slot, pending)
    )
    # Voxels still pending after max_probe rounds are dropped (the reference
    # similarly caps bucket scans at 10 and regrows; with an 8x table this is
    # vanishingly rare).
    return table


def lookup_voxels(vmap, query_coords):
    """Map integer coords (..., 3) -> voxel index, or -1 if absent.

    GridVoxelMap: a single bounds-checked gather from the dense grid.
    VoxelMap: gather probes with exact coordinate verification (one 4-int
    row gather per probe via the lut); equivalent of `lookup_voxel`
    (fast_vgicp_voxel.hpp:167-174 / find_voxel_correspondences.cu:34-50).
    """
    if isinstance(vmap, GridVoxelMap):
        gx, gy, gz = vmap.grid.shape
        ncells = gx * gy * gz
        rel = query_coords - vmap.origin
        dims = jnp.asarray([gx, gy, gz], jnp.int32)
        inside = jnp.all((rel >= 0) & (rel < dims), axis=-1)
        flat = (rel[..., 0] * gy + rel[..., 1]) * gz + rel[..., 2]
        # row gather + lane pick (never a 1-D gather); parked queries hit
        # the all--1 sentinel tail, so no post-select is needed
        return _pick8(vmap.grid8, jnp.where(inside, flat, ncells))
    return lookup_lut(vmap.lut, query_coords)


def lookup_voxels_cols(vmap, cx, cy, cz):
    """SoA lookup: integer coord component arrays (...,) -> voxel id or -1.

    Same semantics as `lookup_voxels`, but operating on separate x/y/z
    columns so every intermediate keeps the large axis in lanes (an
    (N, K, 3) query array would run at 3/128 lane utilization).
    """
    if isinstance(vmap, GridVoxelMap):
        gx, gy, gz = vmap.grid.shape
        ncells = gx * gy * gz
        rx = cx - vmap.origin[0]
        ry = cy - vmap.origin[1]
        rz = cz - vmap.origin[2]
        inside = (
            (rx >= 0) & (rx < gx) & (ry >= 0) & (ry < gy) & (rz >= 0) & (rz < gz)
        )
        flat = (rx * gy + ry) * gz + rz
        # row gather + lane pick (see GridVoxelMap.grid8); parked queries
        # resolve to -1 via the sentinel tail
        return _pick8(vmap.grid8, jnp.where(inside, flat, ncells))
    table_size = vmap.table.shape[0]
    h = (
        (cx.astype(jnp.uint32) * _HP1)
        ^ (cy.astype(jnp.uint32) * _HP2)
        ^ (cz.astype(jnp.uint32) * _HP3)
    )
    slot0 = (h & jnp.uint32(table_size - 1)).astype(jnp.int32)
    # Seed the carries with a zero drawn from the lut so their shard_map
    # varying-axes types match the loop body (queries may be replicated
    # while the lut is device-varying).
    found = cx * 0 - 1 + vmap.lut[0, 0] * 0
    resolved = found > jnp.int32(_EMPTY)  # all-False, lut-varying type

    def cond(s):
        p, _found, resolved = s
        return (p < MAX_PROBE) & ~jnp.all(resolved)

    def body(s):
        # early exit on match OR first empty slot; see lookup_lut
        p, found, resolved = s
        slot = (slot0 + p) & jnp.int32(table_size - 1)
        row = vmap.lut[slot]  # (..., 4): [vid, cx, cy, cz]
        match = (row[..., 1] == cx) & (row[..., 2] == cy) & (row[..., 3] == cz)
        found = jnp.where(~resolved & match, row[..., 0], found)
        resolved = resolved | match | (row[..., 0] == _EMPTY)
        return p + 1, found, resolved

    _, found, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), found, resolved))
    return found


def gather_voxel_stats(vmap: VoxelMap, vids):
    """(means, covs, counts_f32) for voxel ids (...,) in one row-gather."""
    rows = vmap.packed[vids]  # (..., 16)
    means = rows[..., 0:3]
    covs = rows[..., 3:12].reshape(rows.shape[:-1] + (3, 3))
    counts = rows[..., 12]
    return means, covs, counts


def device_downsample(points, mask, resolution, out_capacity: int, grid_dims):
    """Voxel-grid downsample ON DEVICE: centroid per occupied cell,
    compacted to a fixed-size (out_capacity, 3) cloud + mask.

    The host-side numpy/PCL-equivalent downsample costs ~25 ms per 120k-pt
    scan and serializes the odometry pipeline; this runs as part of the
    jitted per-frame graph (a slim count+sum variant of the sortless grid
    build — no covariance columns — plus one static-size nonzero
    compaction) and pipelines with everything else.

    Returns (points (out_capacity, 3), valid (out_capacity,), n_live (),
    n_out_of_grid ()).  If the cloud has more occupied voxels than
    `out_capacity`, the excess (highest representative index, i.e. latest in
    scan order) is dropped — check ``n_live > out_capacity`` at sync time.
    ``n_out_of_grid`` counts input points falling outside the static grid
    (also silently dropped; nonzero means the grid was sized too small).
    """
    n = points.shape[0]
    dtype = points.dtype
    gx, gy, gz = grid_dims
    ncells = gx * gy * gz

    coords = voxel_coord(points, resolution)
    origin = jnp.min(jnp.where(mask[:, None], coords, _COORD_SENTINEL), axis=0)
    rel = coords - origin
    dims = jnp.asarray([gx, gy, gz], jnp.int32)
    inside = mask & jnp.all((rel >= 0) & (rel < dims), axis=-1)
    flat = (rel[:, 0] * gy + rel[:, 1]) * gz + rel[:, 2]
    flat = jnp.where(inside, flat, ncells)

    point_idx = jnp.arange(n, dtype=jnp.int32)
    claim = jnp.full(ncells + 1, n, jnp.int32).at[flat].min(point_idx)
    rep = claim[flat]
    vid = jnp.where(inside, rep, n)
    contrib = jnp.concatenate(
        [jnp.ones((n, 1), dtype), points], axis=1
    ) * inside.astype(dtype)[:, None]
    acc = (jnp.zeros((n + 1, 4), dtype).at[vid].add(contrib))[:n]
    counts = acc[:, 0]
    means = acc[:, 1:4] / jnp.maximum(counts, 1.0)[:, None]

    live = counts > 0
    n_live = jnp.sum(live.astype(jnp.int32))
    (idx,) = jnp.nonzero(live, size=out_capacity, fill_value=n - 1)
    valid = jnp.arange(out_capacity, dtype=jnp.int32) < jnp.minimum(
        n_live, out_capacity
    )
    pts = means[idx] * valid[:, None]
    n_out = jnp.sum(mask.astype(jnp.int32)) - jnp.sum(inside.astype(jnp.int32))
    return pts, valid, n_live, n_out


def auto_grid_dims(
    points,
    resolution: float,
    margin: int = 2,
    bucket: int = 32,
    max_cells: int = 64_000_000,
):
    """Static dense-grid dims for a host-side cloud, or None if the scene is
    too large for a dense grid (fall back to the hash map).

    Dims are rounded up to `bucket` multiples so odometry loops with slowly
    varying extent hit the jit cache instead of recompiling per frame.
    """
    import numpy as np

    if resolution is None or resolution <= 0:
        return None  # "no downsampling" convention (python/main.cpp:70-76)
    pts = np.asarray(points)
    if pts.size == 0:
        return None
    return auto_grid_dims_from_extent(
        pts.min(axis=0), pts.max(axis=0), resolution,
        margin=margin, bucket=bucket, max_cells=max_cells,
    )


def auto_grid_dims_from_extent(
    lo_pt,
    hi_pt,
    resolution: float,
    margin: int = 2,
    bucket: int = 32,
    max_cells: int = 64_000_000,
):
    """`auto_grid_dims` from a precomputed (lo, hi) point extent — the
    class API caches each Cloud's extent (Cloud.extent()), making the
    per-align grid sizing pure scalar arithmetic instead of a 17k x 3
    host reduction."""
    import numpy as np

    if resolution is None or resolution <= 0:
        return None
    lo = np.floor(np.asarray(lo_pt) / resolution - 0.5)
    hi = np.floor(np.asarray(hi_pt) / resolution - 0.5)
    span = (hi - lo + 1 + 2 * margin).astype(np.int64)
    dims = (np.ceil(span / bucket) * bucket).astype(np.int64)
    if int(dims.prod()) > max_cells:
        return None
    return (int(dims[0]), int(dims[1]), int(dims[2]))


def auto_grid_dims_multi(clouds, resolution: float, **kwargs):
    """`auto_grid_dims` over the EXACT union of several clouds' extents.

    Only per-cloud min/max rows are read, so this is cheap at any frame
    count — unlike sampling a few frames, no mid-sequence scan with a
    wider extent can end up seeing past the grid (out-of-grid voxels park
    on the sentinel row and silently vanish from the map)."""
    import numpy as np

    rows = [
        np.stack([c.min(axis=0), c.max(axis=0)])
        for c in (np.asarray(c) for c in clouds)
        if c.size
    ]
    if not rows:
        return None
    return auto_grid_dims(np.concatenate(rows), resolution, **kwargs)


def neighbor_offsets(method: str, radius: float = 1.5):
    """Static offset list per search method (fast_vgicp_voxel.hpp:10-44;
    RADIUS = all integer offsets with ||o|| <= radius,
    fast_vgicp_cuda.cu:77-91)."""
    import numpy as np

    if method == "direct1":
        offs = [(0, 0, 0)]
    elif method == "direct7":
        offs = [
            (0, 0, 0),
            (1, 0, 0),
            (-1, 0, 0),
            (0, 1, 0),
            (0, -1, 0),
            (0, 0, 1),
            (0, 0, -1),
        ]
    elif method == "direct27":
        offs = [
            (i - 1, j - 1, k - 1)
            for i in range(3)
            for j in range(3)
            for k in range(3)
        ]
    elif method == "direct_radius":
        r = int(np.ceil(radius))
        offs = [
            (i, j, k)
            for i in range(-r, r + 1)
            for j in range(-r, r + 1)
            for k in range(-r, r + 1)
            if np.sqrt(i * i + j * j + k * k) <= radius
        ]
    else:
        raise ValueError(f"unknown neighbor search method: {method}")
    return np.asarray(offs, dtype=np.int32)
