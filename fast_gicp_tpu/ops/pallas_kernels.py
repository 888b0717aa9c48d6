"""Pallas TPU kernels for the N^2 hot ops.

The XLA-only paths in neighbors.py / covariance.py materialize (chunk x N)
distance tiles to HBM (~1.4 GB per 18k-point call) because XLA cannot fuse
elementwise producers into matmul operands.  These kernels keep every
distance tile in VMEM:

  * `nn_search_pallas` — fused distance + running argmin over target tiles
    (the reference's per-iteration kdtree query, fast_gicp_impl.hpp:136, and
    the GPU heap scan, brute_force_knn.cu:94-108).
  * `rbf_moments_pallas` — fused distance + exp weight + (w @ moment-feature)
    MXU accumulation (covariance_estimation_rbf.cu:59-90).

Performance notes (measured on TPU v5e, 16k points):
  * Pairwise squared distances are computed as sum_c (q_c - t_c)^2 on the
    VPU, NOT as |q|^2 - 2 q.t + |t|^2 on the MXU: the dot form has
    contraction depth 3, which runs the 128x128 systolic array at ~2%
    utilization and needs full-f32 (multi-pass) precision to survive the
    |q|^2 - 2qt cancellation.  The squared-difference form is ~150 VPU ops
    per 128 lanes and is exact-relative by construction.  (2.4x faster.)
  * The moment accumulation w @ feats IS an MXU matmul (contraction = target
    tile), fed in bfloat16 with f32 accumulation.  Weights are smooth
    density weights in [0, 1]; 0.4% operand noise is far below the
    statistical noise of kernel density estimation, and end-to-end
    registration error on the bundled reference pair is unchanged (in fact
    slightly better than the chunked-XLA f32 path).
  * Tile sizes by sweep: 512x2048 for the NN kernel, 1024x2048 for the
    RBF kernel (2048x2048 exceeds the 16M scoped-vmem stack limit).
  * A symmetric variant (each (i, j) tile feeding both out rows i and j)
    was measured SLOWER despite halving the FLOPs — the kernels are bound
    by per-step grid overhead, not compute.

Layout: point clouds are passed transposed as (8, N) f32 — rows 0..2 are
x,y,z (masked points parked at MASK_COORD), rows 3..7 pad the sublane dim —
so the lane (last) dimension is the large one, matching the f32 (8, 128)
tile.  Grids iterate (query tile) x (target tile) with the
target axis innermost; outputs revisit the same block across the inner axis
(sequential on TPU), accumulating in place.

All kernels have jnp reference semantics tested against neighbors.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .neighbors import MASK_COORD

# Tile sizes: query rows per step x target cols per step.  Swept on v5e:
# the NN kernel (argmin-heavy) prefers smaller tiles than the RBF kernel
# (matmul-heavy).  Env overrides are a dev knob for re-sweeping on new
# hardware (tools/sweep_rbf_tiles.py); a fresh process per setting — the
# values are baked into traced kernels.
import os as _os

_QT = int(_os.environ.get("FAST_GICP_TPU_QT", 512))
_TT = int(_os.environ.get("FAST_GICP_TPU_TT", 2048))
# RBF tiles re-swept post-culling on the sorted benchmark clouds
# (tools/sweep_rbf_tiles.py, 18432 pts): 512x2048 0.621 ms beats the
# round-1 1024x2048 (0.739) — finer query tiles double the bbox-cull
# grid resolution and the culled fraction wins over the extra grid steps.
_RQT = int(_os.environ.get("FAST_GICP_TPU_RQT", 512))
_RTT = int(_os.environ.get("FAST_GICP_TPU_RTT", 2048))

_BIG = 3.0e38  # python float: jnp constants can't be captured by kernels


def supported(*sizes) -> bool:
    """True when the TPU kernels can serve these point counts on this
    backend (trace-time dispatch; CPU tests take the XLA fallback)."""
    return jax.default_backend() == "tpu" and all(
        n % max(_TT, _RTT) == 0 for n in sizes
    )


def _prep_transposed(points, mask):
    """(N, 3) + mask -> (8, N) layout [x, y, z, 0...]: coordinate rows plus
    sublane padding to the f32 (8, 128) tile; masked points are parked at
    MASK_COORD so their distances are huge everywhere."""
    n = points.shape[0]
    xyz = jnp.where(mask[:, None], points, MASK_COORD).T  # (3, N)
    pad = jnp.zeros((5, n), points.dtype)
    return jnp.concatenate([xyz, pad], axis=0)


def _sq_dists(q, t):
    """(8, QT) x (8, TT) -> (QT, TT) squared distances, on the VPU."""
    d = (q[0][:, None] - t[0][None, :]) ** 2
    d += (q[1][:, None] - t[1][None, :]) ** 2
    d += (q[2][:, None] - t[2][None, :]) ** 2
    return d


def _nn_kernel(rel_ref, q_ref, t_ref, idx0_ref, dist0_ref, idx_ref, dist_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        idx_ref[:] = idx0_ref[:]
        dist_ref[:] = dist0_ref[:]

    @pl.when(rel_ref[i, j] != 0)
    def _():
        d = _sq_dists(q_ref[:], t_ref[:])  # (QT, TT)

        local_min = jnp.min(d, axis=1)  # (QT,)
        local_arg = jnp.argmin(d, axis=1).astype(jnp.int32)
        global_arg = local_arg + j * _TT

        best = dist_ref[:, 0]
        better = local_min < best
        dist_ref[:, 0] = jnp.where(better, local_min, best)
        idx_ref[:, 0] = jnp.where(better, global_arg, idx_ref[:, 0])


def _tile_gap_sq(q, qvalid, t, tvalid, qt, tt):
    """(nq_t, nt_t) squared bbox gaps between query tiles and target tiles:
    any point pair across two tiles is at least sqrt(gap_sq) apart (masked
    points excluded from the boxes).  Shared by the RBF and NN culling."""
    nq_t, nt_t = q.shape[0] // qt, t.shape[0] // tt
    big = 1.0e18
    gap_sq = jnp.zeros((nq_t, nt_t), jnp.float32)
    for a in range(3):
        qlo = jnp.where(qvalid > 0, q[:, a], big)
        qhi = jnp.where(qvalid > 0, q[:, a], -big)
        tlo = jnp.where(tvalid > 0, t[:, a], big)
        thi = jnp.where(tvalid > 0, t[:, a], -big)
        qmin = qlo.reshape(nq_t, qt).min(1)
        qmax = qhi.reshape(nq_t, qt).max(1)
        tmin = tlo.reshape(nt_t, tt).min(1)
        tmax = thi.reshape(nt_t, tt).max(1)
        gap = jnp.maximum(
            0.0,
            jnp.maximum(
                qmin[:, None] - tmax[None, :], tmin[None, :] - qmax[:, None]
            ),
        )
        gap_sq = gap_sq + gap * gap
    return gap_sq


def _nn_pass(rel, qT, tT, idx0, dist0, nq, nt, interpret):
    grid = (nq // _QT, nt // _TT)
    return pl.pallas_call(
        _nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, _QT), lambda i, j: (0, i)),
            pl.BlockSpec((8, _TT), lambda i, j: (0, j)),
            pl.BlockSpec((_QT, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((_QT, 1), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_QT, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((_QT, 1), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, 1), jnp.int32),
            jax.ShapeDtypeStruct((nq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(rel, qT, tT, idx0, dist0)


@partial(jax.jit, static_argnames=("interpret",))
def nn_search_pallas(query, target, target_mask, interpret: bool = False):
    """Fused 1-NN: returns (idx int32 (Nq,), sq_dist f32 (Nq,)).

    Query rows may be masked garbage; results for them are arbitrary but
    finite (downstream masks apply, as everywhere in this codebase).

    EXACT two-pass tile culling (clouds arrive voxel-key sorted, so tile
    bounding boxes are spatially tight): pass 1 scans only tile pairs whose
    bboxes touch (gap 0) — for LiDAR overlap that already contains almost
    every true NN — then each query TILE's worst best-so-far becomes its
    radius bound B_i: a target tile with gap_sq > B_i cannot improve any
    query in the tile (every cross-pair is at least sqrt(gap_sq) apart), so
    pass 2 only visits the few remaining tiles with gap_sq <= B_i.  Query
    tiles that saw no gap-0 tile keep B_i = BIG and fall back to the full
    row — never wrong, only slower.

    interpret=True runs the kernel in Pallas interpret mode (CPU CI pins
    kernel equivalence every run; TPU runs compile the real thing).
    """
    nq, nt = query.shape[0], target.shape[0]
    if nq % _QT or nt % _TT:
        raise ValueError(f"sizes ({nq},{nt}) not multiples of ({_QT},{_TT})")
    qT = _prep_transposed(query, jnp.ones(nq, bool))
    tT = _prep_transposed(target, target_mask)

    gap_sq = _tile_gap_sq(
        query, jnp.ones(nq, jnp.float32), target,
        target_mask.astype(jnp.float32), _QT, _TT,
    )
    import os

    if os.environ.get("FAST_GICP_TPU_NO_CULL"):  # debug escape hatch
        rel1 = jnp.ones_like(gap_sq, jnp.int32)
        idx0 = jnp.zeros((nq, 1), jnp.int32)
        dist0 = jnp.full((nq, 1), _BIG, jnp.float32)
        idx, dist = _nn_pass(rel1, qT, tT, idx0, dist0, nq, nt, interpret)
        return idx[:, 0], jnp.maximum(dist[:, 0], 0.0)

    rel1 = (gap_sq <= 0.0).astype(jnp.int32)
    idx0 = jnp.zeros((nq, 1), jnp.int32)
    dist0 = jnp.full((nq, 1), _BIG, jnp.float32)
    idx1, dist1 = _nn_pass(rel1, qT, tT, idx0, dist0, nq, nt, interpret)

    # Per-query-tile radius bound from pass 1 (BIG where a tile saw nothing).
    bound = dist1[:, 0].reshape(nq // _QT, _QT).max(1)  # (nq_t,)
    rel2 = ((gap_sq <= bound[:, None]) & (rel1 == 0)).astype(jnp.int32)
    idx, dist = _nn_pass(rel2, qT, tT, idx1, dist1, nq, nt, interpret)
    # Masked targets sit at MASK_COORD -> huge distances, never selected.
    return idx[:, 0], jnp.maximum(dist[:, 0], 0.0)


_KNN_TILE = 256  # candidate/query tile granularity of the slab kNN kernel


def _make_knn_slab_kernel(k: int, C: int, ct: int):
    def kernel(cidx_ref, q_ref, c_ref, idx_ref, sq_ref):
        qi = pl.program_id(0)
        # d: (QT, C*ct) distance slab, held as a value (VMEM/registers)
        d = jnp.concatenate(
            [_sq_dists(q_ref[:], c_ref[0, j]) for j in range(C)], axis=1
        )
        iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        for i in range(k):  # static unroll: k iterated argmin-and-mask
            m = jnp.min(d, axis=1)
            am = jnp.argmin(d, axis=1).astype(jnp.int32)
            sub = am // ct
            # slab-local -> global: C scalar compares against this query
            # tile's candidate ids in SMEM (never a gather)
            g = jnp.zeros_like(am)
            for j in range(C):
                g = jnp.where(sub == j, cidx_ref[qi, j], g)
            idx_ref[:, i] = g * ct + am % ct
            sq_ref[:, i] = jnp.maximum(m, 0.0)
            d = jnp.where(iota == am[:, None], _BIG, d)

    return kernel


@partial(jax.jit, static_argnames=("k", "cand_tile", "interpret"))
def knn_slab_pallas(query, qmask, target, tmask, cidx, k: int,
                    cand_tile: int | None = None,
                    interpret: bool = False):
    """k-NN restricted to per-query-tile candidate slabs: for query tile i
    only the target tiles `cidx[i]` (chosen by bbox gap in
    neighbors.knn_search_culled) are searched.

    Row-wise top-k primitives have a ~5-7 ms floor at 16k rows on v5e
    (lax.approx_max_k and lax.top_k are per-row-machinery bound, measured
    flat from 1k to 16k row width).  This kernel does k=20 iterated
    (argmin, record, mask) passes over a (256, C*256) distance slab that
    never leaves VMEM — pure VPU reductions, no top-k machinery at all.
    Ascending output order; ties broken by slab position (= bbox-gap rank),
    unlike the reference heap's global index order (fast_gicp_impl.hpp:257)
    — distances are identical.

    Returns (idx (Nq, k) int32 GLOBAL target ids, sq (Nq, k) f32 ascending).
    """
    ct = _KNN_TILE if cand_tile is None else cand_tile
    nq, nt = query.shape[0], target.shape[0]
    Q, C = cidx.shape
    if nq != Q * _KNN_TILE or nt % ct:
        raise ValueError(f"sizes ({nq},{nt}) not tiled for Q={Q}, ct={ct}")
    T = nt // ct
    qT = _prep_transposed(query, qmask)
    tT = _prep_transposed(target, tmask)
    # (T, 8*ct) tile rows -> whole-row candidate gather (grid8 lore: big
    # contiguous rows, never a 1-D scalar-core gather)
    rows = tT.reshape(8, T, ct).transpose(1, 0, 2).reshape(T, -1)
    candT = rows[cidx].reshape(Q, C, 8, ct)
    return pl.pallas_call(
        _make_knn_slab_kernel(k, C, ct),
        grid=(Q,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, _KNN_TILE), lambda i: (0, i)),
            pl.BlockSpec((1, C, 8, ct), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_KNN_TILE, k), lambda i: (i, 0)),
            pl.BlockSpec((_KNN_TILE, k), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
        ],
        interpret=interpret,
    )(cidx.astype(jnp.int32), qT, candT)


def _make_knn_moments_kernel(k: int, C: int):
    """Fused k-NN selection + moment accumulation over candidate slabs.

    Replaces the knn_slab_pallas -> (N, k) gather -> AoS moment epilogue
    chain of the k=20 covariance path (fast_gicp_impl.hpp:253-298,
    covariance_estimation.cu:16-51) with ONE kernel: the k iterated
    argmin-and-mask passes additionally build a 0/1 selection mask W over
    the slab, and the neighborhood moments are one in-VMEM matmul
    feats(cand) @ W^T — the (N, 20, 3) HBM gather and its (N, 8, 128)-
    padded AoS epilogue never exist.

    Precision: moments are taken about THIS QUERY TILE's first query
    point, not the cloud center — covariances are center-invariant and
    candidates lie within a few metres of the tile, so the finalize's
    moment cancellation is ~|local extent|^2 / |cov| (~1e2..1e3), far
    inside plain-f32 territory (the cloud-center form hits ~1e5 at 40 m
    extents; see the round-3b windowed-moment lore).
    """

    def kernel(q_ref, c_ref, mom_ref, kth_ref):
        # q_ref (8, QT): rows 0-2 raw query coords (masked at MASK_COORD)
        # c_ref (1, C, 8, CT): rows 0-2 raw candidate coords, row 3 valid
        cc = jnp.concatenate([c_ref[0, j] for j in range(C)], axis=1)
        d = _sq_dists(q_ref[:], cc)  # (QT, S)
        # Sortable packed keys: squared distances are non-negative, so
        # their f32 bit patterns order like the floats; replacing the low
        # 12 mantissa bits with the lane index makes every key UNIQUE
        # (ties broken by slab position) and yields argmin for free — the
        # min key IS the identity of the minimizer.  Selection ordering is
        # quantized at 2^-11 relative, noise for neighborhood statistics.
        iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        keys = (
            jax.lax.bitcast_convert_type(d, jnp.int32) & jnp.int32(-4096)
        ) | iota
        m = jnp.zeros_like(keys[:, 0])
        sentinel = jnp.int32(2147483647)  # no real key reaches it
        for _ in range(k):  # static unroll: k iterated min-and-mask
            m = jnp.min(keys, axis=1)
            keys = jnp.where(keys == m[:, None], sentinel, keys)
        # The k selected keys are exactly the sentinel slots — the
        # selection mask needs no accumulator buffer at all.
        W = (keys == sentinel).astype(jnp.float32)
        kth_ref[:, 0] = jnp.maximum(
            jax.lax.bitcast_convert_type(m & jnp.int32(-4096), jnp.float32),
            0.0,
        )
        # Local frame: tile reference point = first query of the tile
        # (valid except in fully-masked padding tiles, whose outputs are
        # never consumed).  Candidate validity zeroes masked sentinels.
        v = cc[3]
        y0 = (cc[0] - q_ref[0, 0]) * v
        y1 = (cc[1] - q_ref[1, 0]) * v
        y2 = (cc[2] - q_ref[2, 0]) * v
        feats = jnp.stack(
            [v, y0, y1, y2,
             y0 * y0, y0 * y1, y0 * y2,
             y1 * y1, y1 * y2, y2 * y2,
             y0, y0, y0, y0, y0, y0],  # pad rows to 16 (ignored)
            axis=0,
        )  # (16, S) f32
        mom_ref[:] = jax.lax.dot_general(
            feats, W, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    return kernel


@partial(jax.jit, static_argnames=("k", "cand_tile", "interpret"))
def knn_moments_pallas(query, qmask, target, tmask, cidx, k: int,
                       cand_tile: int = 128, interpret: bool = False):
    """Fused k-NN moment rows per query: returns (mom (10, Nq) f32,
    kth_sq (Nq,) f32).

    mom rows are [count, sum y (3), sum yy^T upper-sym (6)] over each
    query's k nearest candidates, where y = x - (per-tile local origin)
    — consume with the center-invariant covariance finalize only.  The
    candidate set of query tile i is the `cand_tile`-sized target tiles
    `cidx[i]` (bbox-gap ranked by neighbors.select_candidate_tiles).
    kth_sq is the k-th selected squared distance (certificate input).
    """
    nq, nt = query.shape[0], target.shape[0]
    Q, C = cidx.shape
    if nq != Q * _KNN_TILE or nt % cand_tile:
        raise ValueError(f"sizes ({nq},{nt}) not tiled for Q={Q}")
    if C * cand_tile > 4096:
        raise ValueError("slab width > 4096 (12 index bits packed in keys)")
    T = nt // cand_tile
    qT = _prep_transposed(query, qmask)
    tT = _prep_transposed(target, tmask)
    # validity in sublane row 3 (rows 3..7 are zero padding otherwise)
    tT = tT.at[3].set(tmask.astype(jnp.float32))
    rows = tT.reshape(8, T, cand_tile).transpose(1, 0, 2).reshape(T, -1)
    candT = rows[cidx].reshape(Q, C, 8, cand_tile)
    mom, kth = pl.pallas_call(
        _make_knn_moments_kernel(k, C),
        grid=(Q,),
        in_specs=[
            pl.BlockSpec((8, _KNN_TILE), lambda i: (0, i)),
            pl.BlockSpec((1, C, 8, cand_tile), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((16, _KNN_TILE), lambda i: (0, i)),
            pl.BlockSpec((_KNN_TILE, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((16, nq), jnp.float32),
            jax.ShapeDtypeStruct((nq, 1), jnp.float32),
        ],
        interpret=interpret,
    )(qT, candT)
    return mom[:10], kth[:, 0]


def _rbf_kernel(rel_ref, kw_ref, md_ref, q_ref, t_ref, f_ref, out_ref):
    """Feature and output operands are TRANSPOSED ((32, TT) block, (32, QT)
    out) so the caller never relayouts an (N, 32) matrix — XLA-side
    (N, k)<->(k, N) transposes cost ~100 us each at 22k points.

    rel_ref (SMEM, (nq_tiles, nt_tiles) int32) is the spatial CULLING
    mask: pairs of tiles whose bounding boxes sit farther than max_dist
    apart contribute exactly zero weight and skip the distance/exp/matmul
    body entirely.  Clouds arrive voxel-key sorted from the downsampler,
    so nearby points share tiles and most tile pairs are irrelevant
    (~70-85% skipped on LiDAR scans).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(rel_ref[i, j] != 0)
    def _():
        d = _sq_dists(q_ref[:], t_ref[:])  # (QT, TT)
        kw = kw_ref[0]
        md_sq = md_ref[0]
        w = jnp.where(d <= md_sq, jnp.exp(-kw * d), 0.0)
        # Masked target points carry coords ~1e9 -> d > md_sq -> w = 0.
        # f_ref arrives ALREADY bf16 (see the caller: the hi/lo split must
        # cross the pallas boundary as a real bf16 array — an f32 operand
        # with an .astype(bf16).astype(f32) round-trip gets ELIDED by XLA
        # under jit, silently collapsing the split to single-bf16
        # precision and corrupting far-from-center covariances).
        out_ref[:] += jax.lax.dot_general(
            f_ref[:],  # (32, TT) bf16
            w.astype(jnp.bfloat16),  # (QT, TT)
            (((1,), (1,)), ((), ())),  # contract over the target tile
            preferred_element_type=jnp.float32,
            # Explicit: callers run under default_matmul_precision
            # ("float32"), which Mosaic rejects for bf16 operands
            # (single native pass here).
            precision=jax.lax.Precision.DEFAULT,
        )


@partial(jax.jit, static_argnames=("interpret",))
def rbf_cross_moments_centered_T(query, qmask, target, tmask, kernel_width,
                                 max_dist, center, interpret: bool = False):
    """Cross-cloud RBF moments: (16, Nq) rows of target-density moments
    about `center` for each QUERY point — the kernel behind both the
    self-moments path (query == target) and the query-sharded multi-device
    covariance path (each device computes its N/D queries against the
    all-gathered full cloud; `center` must be the full cloud's, passed in
    so every shard agrees)."""
    nq = query.shape[0]
    nt = target.shape[0]
    if nq % _RQT or nt % _RTT:
        raise ValueError(f"sizes ({nq},{nt}) not multiples of ({_RQT},{_RTT})")
    f32 = jnp.float32
    qvalid = qmask.astype(f32)
    tvalid = tmask.astype(f32)
    yq = query - center
    yt = target - center
    pTq = _prep_transposed(yq, qmask)
    pTt = _prep_transposed(yt, tmask)

    # Moment feature ROWS (16, Nt): [1, y, vec(yy^T), 0, 0, 0] about the
    # center, built entirely in 2-D column layout — an (N, 3, 3) outer
    # product would pad to (N, 8, 128) tiles (~92 MB materialized at 22k
    # points).  Masked rows zeroed so they contribute nothing even inside
    # max_dist.
    y0, y1, y2 = (yt[:, i] * tvalid for i in range(3))
    zero = jnp.zeros((nt,), f32)
    feats_rows = jnp.stack(
        [tvalid, y0, y1, y2,
         y0 * y0, y0 * y1, y0 * y2,
         y1 * y0, y1 * y1, y1 * y2,
         y2 * y0, y2 * y1, y2 * y2,
         zero, zero, zero],
        axis=0,
    )  # (16, Nt)
    # hi/lo bf16 split via MANTISSA BIT ROUNDING: XLA-TPU's excess-
    # precision simplification treats convert(convert(f, bf16), f32) as f
    # itself, so the naive `lo = f - f.astype(bf16).astype(f32)` folds to
    # ZERO inside a jit — silently collapsing the split to single bf16
    # (measured 0.004|y|^2 ~ 15 m^2 covariance errors on 60 m-extent
    # clouds).  Rounding the low 16 mantissa bits away through a uint32
    # bitcast (+0x8000 = round-to-nearest on the magnitude) is opaque to
    # the simplifier: hi is exactly bf16-representable, f32's f - hi is
    # exact, and bf16(lo) rounds at ~2^-18 |f|.
    fu = jax.lax.bitcast_convert_type(feats_rows, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        (fu + jnp.uint32(0x8000)) & jnp.uint32(0xFFFF0000), jnp.float32
    )
    hi = hi_f32.astype(jnp.bfloat16)  # exact: mantissa already rounded
    lo = (feats_rows - hi_f32).astype(jnp.bfloat16)
    feats2 = jnp.concatenate([hi, lo], axis=0)  # (32, Nt) bf16

    # Tile-pair culling mask from per-tile bounding boxes (masked points
    # excluded — they contribute zero weight regardless).  Exact sphere
    # test: any point pair across two boxes is at least sqrt(gap_sq)
    # apart, so gap_sq > max_dist^2 -> all weights zero.
    nq_t, nt_t = nq // _RQT, nt // _RTT
    gap_sq = _tile_gap_sq(yq, qvalid, yt, tvalid, _RQT, _RTT)
    rel = (gap_sq <= max_dist * max_dist).astype(jnp.int32)
    import os

    if os.environ.get("FAST_GICP_TPU_NO_CULL"):  # debug escape hatch
        rel = jnp.ones_like(rel)

    kw = jnp.full((1,), kernel_width, f32)
    md = jnp.full((1,), max_dist * max_dist, f32)

    grid = (nq_t, nt_t)
    out = pl.pallas_call(
        _rbf_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, _RQT), lambda i, j: (0, i)),
            pl.BlockSpec((8, _RTT), lambda i, j: (0, j)),
            pl.BlockSpec((32, _RTT), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((32, _RQT), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((32, nq), jnp.float32),
        interpret=interpret,
    )(rel, kw, md, pTq, pTt, feats2)
    return out[:16] + out[16:]  # recombine hi + lo halves (f32)


@partial(jax.jit, static_argnames=("interpret",))
def rbf_moments_centered_T(points, mask, kernel_width, max_dist,
                           interpret: bool = False):
    """Fused RBF moment accumulation about the cloud center: returns
    (rows (16, N), center (3,)) — the self-moments view of
    `rbf_cross_moments_centered_T` (query == target == points)."""
    mvalid = mask.astype(jnp.float32)
    center = jnp.sum(points * mvalid[:, None], axis=0) / jnp.maximum(
        jnp.sum(mvalid), 1.0
    )
    m = rbf_cross_moments_centered_T(
        points, mask, points, mask, kernel_width, max_dist, center,
        interpret=interpret,
    )
    return m, center


@partial(jax.jit, static_argnames=("interpret",))
def rbf_moments_T(points, mask, kernel_width, max_dist,
                  interpret: bool = False):
    """(16, N) raw moment rows about the ORIGIN
    [sum_w, sum_w*x (3), sum_w*xx^T (9 row-major), pad (3)] — the
    de-centered view of `rbf_moments_centered_T` (pure f32 row math; the
    f32 cancellation here is ~1e-7|x|^2, negligible)."""
    m, c = rbf_moments_centered_T(points, mask, kernel_width, max_dist,
                                  interpret=interpret)
    s_w = m[0]
    s_wy = m[1:4]  # (3, N)
    s_wx = [s_wy[i] + s_w * c[i] for i in range(3)]
    s_wxx = [
        m[4 + 3 * i + j] + c[i] * s_wy[j] + s_wy[i] * c[j] + s_w * c[i] * c[j]
        for i in range(3)
        for j in range(3)
    ]
    zero = jnp.zeros((points.shape[0],), jnp.float32)
    return jnp.stack([s_w, *s_wx, *s_wxx, zero, zero, zero], axis=0)


@partial(jax.jit, static_argnames=("interpret",))
def rbf_moments_pallas(points, mask, kernel_width, max_dist,
                       interpret: bool = False):
    """(N, 16) row-per-point view of `rbf_moments_T` (compat surface)."""
    return rbf_moments_T(points, mask, kernel_width, max_dist,
                         interpret=interpret).T


# ----- adaptive-radius covariances (k-th-NN windowed moments) -------------
#
# The exact kNN covariance needs a top-k over every (query, target-tile)
# distance row; `lax.approx_max_k` over HBM-materialized distance tiles
# costs ~6 ms at 16k points.  But the covariance only consumes the
# NEIGHBORHOOD, not the ordering: find each query's k-th-NN DISTANCE
# (quantized to a geometric radius ladder) with a fused count kernel, then
# take hard-window moments at that per-query radius with an RBF-style MXU
# moment kernel.  Both kernels keep distance tiles in VMEM and use the
# bbox tile culling.  ~5x faster than the approx-top-k path; the statistic
# includes count(r_rung) >= k nearest points instead of exactly k (rung
# ratio 1.3 -> typically k..1.7k on 2-D LiDAR surfaces), which is noise at
# the level of kernel density estimation (the reference itself ships a
# density-estimation covariance mode, covariance_estimation_rbf.cu).


def _count_kernel(rel_ref, r2_ref, q_ref, t_ref, cnt_ref):
    """cnt (L, QT): per query, number of target points within each ladder
    radius.  r2_ref (SMEM, (L,)) is the squared-radius ladder (ascending)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    L = cnt_ref.shape[0]

    @pl.when(j == 0)
    def _():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)

    @pl.when(rel_ref[i, j] != 0)
    def _():
        d = _sq_dists(q_ref[:], t_ref[:])  # (QT, TT)
        for l in range(L):  # static unroll; L ~ 20
            cnt_ref[l, :] += jnp.sum(
                (d <= r2_ref[l]).astype(jnp.float32), axis=1
            )


def _window_kernel(rel_ref, r2q_ref, q_ref, t_ref, f_ref, out_ref):
    """Hard-window moment accumulation: w = 1[d <= r2_q] per QUERY (r2q_ref
    block (1, QT) mapped by i).

    The matmul runs in FULL f32 (HIGHEST): the window covariance finalize
    subtracts two ~|y_max|^2-sized moments that agree to ~|r_window|^2 —
    at 40 m cloud extent and 0.5 m windows that is a 10^4 cancellation, so
    the RBF kernel's bf16 hi/lo split (~1.5e-5 relative) would leave O(1)
    relative error on the covariance (measured: flipped plane normals and
    a 10x worse backward registration on the bundled pair).  Unlike the
    RBF kernel the matmul here is a small fraction of the step (the
    distance pass dominates and most tiles are culled), so f32 costs
    little."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(rel_ref[i, j] != 0)
    def _():
        d = _sq_dists(q_ref[:], t_ref[:])  # (QT, TT)
        w = (d <= r2q_ref[0][:, None]).astype(jnp.float32)
        out_ref[:] += jax.lax.dot_general(
            f_ref[:],  # (16, TT) f32 feature rows
            w,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )


@partial(jax.jit, static_argnames=("interpret",))
def radius_window_moments_T(query, qmask, target, tmask, r2_ladder, k,
                            center, interpret: bool = False):
    """(16, Nq) centered moment rows over each query's k-th-NN window.

    Two fused passes: (1) count target points within each ladder radius,
    pick the smallest rung with >= k neighbors (isolated queries fall back
    to the ladder max); (2) hard-window moments at that per-query radius,
    in full f32 (see _window_kernel).  `center` must be the full cloud's
    mean.  Returns raw sums [n, sum y (3), sum yy^T (9), pad (3)] with
    y = x - center."""
    nq, nt = query.shape[0], target.shape[0]
    if nq % _RQT or nt % _RTT:
        raise ValueError(f"sizes ({nq},{nt}) not multiples of ({_RQT},{_RTT})")
    f32 = jnp.float32
    L = r2_ladder.shape[0]
    qvalid = qmask.astype(f32)
    tvalid = tmask.astype(f32)
    yq = query - center
    yt = target - center
    pTq = _prep_transposed(yq, qmask)
    pTt = _prep_transposed(yt, tmask)

    gap_sq = _tile_gap_sq(yq, qvalid, yt, tvalid, _RQT, _RTT)
    r2_max = r2_ladder[L - 1]
    rel1 = (gap_sq <= r2_max).astype(jnp.int32)

    grid = (nq // _RQT, nt // _RTT)
    cnt = pl.pallas_call(
        _count_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, _RQT), lambda i, j: (0, i)),
            pl.BlockSpec((8, _RTT), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((L, _RQT), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((L, nq), jnp.float32),
        interpret=interpret,
    )(rel1, r2_ladder.astype(f32), pTq, pTt)

    # Smallest rung with >= k neighbors; isolated queries take the ladder
    # max (counts are nondecreasing in l by construction).
    enough = cnt >= jnp.asarray(k, jnp.float32)  # (L, Nq)
    first = jnp.argmax(enough, axis=0)  # 0 when none -> fixed below
    rung = jnp.where(jnp.any(enough, axis=0), first, L - 1)
    # one-hot pick, not r2_ladder[rung]: a 1-D gather would hit the
    # scalar-core path (L is tiny, the select ladder is pure VPU)
    iota = jnp.arange(L, dtype=rung.dtype)[:, None]
    r2_q = jnp.sum(
        jnp.where(iota == rung[None, :], r2_ladder[:, None].astype(f32), 0.0),
        axis=0,
    )  # (Nq,)

    # feature rows about the center, FULL f32 (see _window_kernel for why
    # the RBF hi/lo bf16 split is not precise enough here)
    y0, y1, y2 = (yt[:, i] * tvalid for i in range(3))
    zero = jnp.zeros((nt,), f32)
    feats_rows = jnp.stack(
        [tvalid, y0, y1, y2,
         y0 * y0, y0 * y1, y0 * y2,
         y1 * y0, y1 * y1, y1 * y2,
         y2 * y0, y2 * y1, y2 * y2,
         zero, zero, zero],
        axis=0,
    )  # (16, Nt) f32

    # pass-2 culling: a target tile can only matter to query tile i if its
    # bbox gap is within the tile's LARGEST window radius
    tile_r2 = r2_q.reshape(nq // _RQT, _RQT).max(1)  # (nq_t,)
    rel2 = (gap_sq <= tile_r2[:, None]).astype(jnp.int32)

    out = pl.pallas_call(
        _window_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _RQT), lambda i, j: (0, i)),
            pl.BlockSpec((8, _RQT), lambda i, j: (0, i)),
            pl.BlockSpec((8, _RTT), lambda i, j: (0, j)),
            pl.BlockSpec((16, _RTT), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((16, _RQT), lambda i, j: (0, i)),
        out_shape=jax.ShapeDtypeStruct((16, nq), jnp.float32),
        interpret=interpret,
    )(rel2, r2_q[None, :], pTq, pTt, feats_rows)
    return out
