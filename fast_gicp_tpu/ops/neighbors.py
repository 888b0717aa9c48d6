"""Nearest-neighbor search ops, MXU-shaped (no trees).

The reference uses PCL kd-trees on CPU (fast_gicp_impl.hpp:136, :257) and a
per-query heap scan on GPU (brute_force_knn.cu:94-108).  Trees are pointer
machines and map terribly to TPU; instead we phrase both 1-NN and k-NN as
blocked dense distance computations so the pairwise term ``-2 q . t`` rides
the MXU: per source chunk, d = |q|^2 - 2 q @ T^T + |t|^2 followed by an
argmin / top_k reduction.  `lax.map` over chunks bounds the materialized
distance tile to (chunk, N_target); a fused Pallas kernel that never leaves
VMEM is layered on top in ops/pallas_kernels.py.

Masked (padded) target points are pushed to +BIG so they are never selected.
All shapes are static; callers pad clouds to bucket sizes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Large finite coordinate for masked points: distances ~3.6e18, far below
# f32 overflow (3.4e38) even after squaring differences of 1e9.
MASK_COORD = 1.0e9

# TPU matmuls default to reduced precision; distance computations need full
# f32 or argmin/top_k ordering degrades on metre-scale coordinates.
_PRECISION = jax.lax.Precision.HIGHEST


def _masked_target(target, target_mask):
    return jnp.where(target_mask[:, None], target, MASK_COORD)


def _center_clouds(query, target, target_mask):
    """Shift both clouds by the target's valid-point mean.

    The XLA fallback distance form |q|^2 - 2 q.t + |t|^2 loses ALL
    precision at survey-frame coordinates (f32 eps x |p|^2 ~ 30 m^2 at
    1e4 m offsets — every distance rounds to 0 and argmin returns
    garbage); distances are translation-invariant, so centering restores
    the Pallas kernels' exact-relative behavior.  Masked target points
    stay parked at ~MASK_COORD (1e9 dwarfs any real offset)."""
    valid = target_mask.astype(target.dtype)
    c = jnp.sum(target * valid[:, None], axis=0) / jnp.maximum(
        jnp.sum(valid), 1.0
    )
    return query - c, target - c


def _pick_chunk(n, chunk_size):
    """Largest divisor of n that is <= chunk_size (gcd-based): buckets are
    2048-multiples so this normally returns chunk_size unchanged, but any
    custom bucket still gets a valid (possibly smaller) chunk instead of a
    trace-time ValueError."""
    import math

    return max(1, math.gcd(n, chunk_size))


def _chunked(points, chunk_size):
    n = points.shape[0]
    return points.reshape(n // chunk_size, chunk_size, 3)


def nn_search(query, target, target_mask, chunk_size: int = 2048):
    """1-NN of each query point in target.

    Returns (idx int32 (Nq,), sq_dist f32 (Nq,)).  Equivalent of the
    reference's per-iteration `nearestKSearch(pt, 1, ...)` correspondence
    query (fast_gicp_impl.hpp:136-139).
    """
    nq = query.shape[0]
    from . import pallas_kernels  # function-level: pallas_kernels imports us

    if pallas_kernels.supported(nq, target.shape[0]):
        return pallas_kernels.nn_search_pallas(query, target, target_mask)
    chunk_size = _pick_chunk(nq, chunk_size)
    query, target = _center_clouds(query, target, target_mask)
    tgt = _masked_target(target, target_mask)
    t_sq = jnp.sum(tgt * tgt, axis=-1)

    def body(q):
        d = (
            jnp.sum(q * q, axis=-1)[:, None]
            - 2.0 * jnp.dot(q, tgt.T, precision=_PRECISION)
            + t_sq[None, :]
        )
        idx = jnp.argmin(d, axis=1)
        sq = jnp.take_along_axis(d, idx[:, None], axis=1)[:, 0]
        return idx.astype(jnp.int32), jnp.maximum(sq, 0.0)

    idx, sq = jax.lax.map(body, _chunked(query, chunk_size))
    return idx.reshape(nq), sq.reshape(nq)


def knn_search(
    query,
    target,
    target_mask,
    k: int,
    chunk_size: int = 1024,
    approx: bool = False,
    recall_target: float = 0.98,
):
    """k-NN (sorted ascending) of each query point in target.

    Returns (idx int32 (Nq, k), sq_dist f32 (Nq, k)).  Equivalent of the
    covariance-estimation kNN (fast_gicp_impl.hpp:257, brute_force_knn.cu).
    Ties are broken by target index order (like the reference heap drain).

    approx=True uses `lax.approx_min_k` (the TPU-native partial-reduction
    top-k), ~5x faster than exact top_k at 18k points; appropriate for
    covariance estimation where a 98% neighbor recall is statistically
    indistinguishable.
    """
    nq = query.shape[0]
    chunk_size = _pick_chunk(nq, chunk_size)
    query, target = _center_clouds(query, target, target_mask)
    tgt = _masked_target(target, target_mask)
    t_sq = jnp.sum(tgt * tgt, axis=-1)

    def body(q):
        d = (
            jnp.sum(q * q, axis=-1)[:, None]
            - 2.0 * jnp.dot(q, tgt.T, precision=_PRECISION)
            + t_sq[None, :]
        )
        if approx:
            neg_top, idx = jax.lax.approx_max_k(-d, k, recall_target=recall_target)
        else:
            neg_top, idx = jax.lax.top_k(-d, k)
        return idx.astype(jnp.int32), jnp.maximum(-neg_top, 0.0)

    idx, sq = jax.lax.map(body, _chunked(query, chunk_size))
    return idx.reshape(nq, k), sq.reshape(nq, k)


def select_candidate_tiles(qt, tt, C: int):
    """Per query tile, the C target tiles with the smallest bbox gap.

    qt (Q, tile, 3) raw query tiles; tt (T, tile, 3) masked target tiles
    (masked points parked at MASK_COORD).  Fully-masked target tiles sit
    at MASK_COORD (never selected); a mixed tail tile gets a huge bbox
    and gap 0 everywhere — it simply always competes, which is correct.

    Returns (cidx (Q, C) int32, excluded_sq (Q,) f32: the bbox gap of the
    nearest EXCLUDED tile, inf when C >= T)."""
    Q, qtile = qt.shape[0], qt.shape[1]
    T, ttile = tt.shape[0], tt.shape[1]
    # Per-coordinate 2-D reductions: the one-shot (T, tile, 3) AoS
    # min/max lowers to a padded-tile layout on TPU (~0.8 ms at 18k
    # points); three (T, tile) lane-dim reductions are ~free.
    gap_sq = jnp.zeros((Q, T), qt.dtype)
    for a in range(3):
        q_a = qt[..., a].reshape(Q, qtile)
        t_a = tt[..., a].reshape(T, ttile)
        gap = jnp.maximum(
            0.0,
            jnp.maximum(
                q_a.min(1)[:, None] - t_a.max(1)[None, :],
                t_a.min(1)[None, :] - q_a.max(1)[:, None],
            ),
        )
        gap_sq = gap_sq + gap * gap  # (Q, T)
    if C < T:
        neg_gap, tidx = jax.lax.top_k(-gap_sq, C + 1)
        return tidx[:, :C], -neg_gap[:, C]
    cidx = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (Q, T))
    return cidx, jnp.full((Q,), jnp.inf, qt.dtype)


def knn_search_culled(
    query,
    target,
    target_mask,
    k: int,
    tile: int = 256,
    cand_tiles: int = 16,
    q_chunk_tiles: int = 8,
    recall_target: float = 0.99,
):
    """Tile-culled kNN: per `tile`-query block, search only the
    `cand_tiles` target tiles with the smallest bounding-box gap.

    Clouds arrive voxel-key sorted (utils/downsample.py normalizes output
    order), so consecutive tiles have tight bounding boxes — the same
    observation behind the exact two-pass 1-NN kernel
    (ops/pallas_kernels.nn_search_pallas).  k=20 neighborhoods span
    ~0.3-0.5 m at a 0.1 m downsample while excluded tiles sit metres away,
    so distances + top-k run on a (tile, cand_tiles*tile) candidate slab
    instead of (tile, N) — ~4x less top-k work at 16k points, which is
    what dominates `knn_search`.

    Returns (idx (Nq, k) int32, sq_dist (Nq, k) f32, certified (Nq,)
    bool): certified[i] means query i's k-th found distance is <= the
    bbox gap of the nearest EXCLUDED tile — no excluded tile can hold a
    true neighbor, so the candidate set provably contains the exact kNN
    (with recall_target=1.0 the in-slab top-k is exact too).  Uncertified
    queries are typically sparse far-range points whose k-NN radius spans
    many tiles; measured on the bundled 17k cloud, overall recall matches
    the full-row `approx_min_k` default (~0.965) at ~1/4 of the top-k
    work — the misses coincide with the same statistic-insensitive tails.

    Reference statistic: kd-tree nearestKSearch over the full cloud
    (fast_gicp_impl.hpp:257).  Requires Nq % tile == 0 and
    N_target % tile == 0 (bucket-padded clouds are 2048-multiples).
    """
    nq, nt = query.shape[0], target.shape[0]
    if nq % tile or nt % tile:
        raise ValueError(f"cloud sizes ({nq}, {nt}) not {tile}-multiples")
    Q, T = nq // tile, nt // tile
    C = min(cand_tiles, T)
    query, target = _center_clouds(query, target, target_mask)
    tgt = _masked_target(target, target_mask)
    qt = query.reshape(Q, tile, 3)
    tt = tgt.reshape(T, tile, 3)
    cidx, excluded_sq = select_candidate_tiles(qt, tt, C)

    from . import pallas_kernels  # function-level: pallas_kernels imports us

    if tile == pallas_kernels._KNN_TILE and (
        jax.default_backend() == "tpu"
    ):
        # VPU slab kernel: k iterated argmin-and-mask in VMEM — row-wise
        # top-k primitives have a ~5-7 ms per-16k-rows floor on v5e that
        # dominates the whole search (see knn_slab_pallas).
        gidx, sq = pallas_kernels.knn_slab_pallas(
            query, jnp.ones(nq, bool), target, target_mask, cidx, k
        )
        certified = sq[:, k - 1].reshape(Q, tile) <= excluded_sq[:, None]
        return gidx, sq, certified.reshape(nq)
    # Candidate slabs: contiguous tiles gather as whole rows (no 1-D
    # scalar-core gather; see CLAUDE.md grid8 lore).
    cand = tt.reshape(T, tile * 3)[cidx].reshape(Q, C * tile, 3)
    cand_sq = jnp.sum(cand * cand, axis=-1)  # (Q, C*tile)

    g = max(1, min(q_chunk_tiles, Q))
    while Q % g:
        g -= 1

    def body(args):
        q, c, c_sq = args  # (g, tile, 3), (g, C*tile, 3), (g, C*tile)
        d = (
            jnp.sum(q * q, axis=-1)[..., None]
            - 2.0 * jnp.einsum(
                "qid,qjd->qij", q, c, precision=_PRECISION
            )
            + c_sq[:, None, :]
        )  # (g, tile, C*tile)
        neg_top, loc = jax.lax.approx_max_k(
            -d, k, recall_target=recall_target
        )
        return loc.astype(jnp.int32), jnp.maximum(-neg_top, 0.0)

    loc, sq = jax.lax.map(
        body,
        (
            qt.reshape(Q // g, g, tile, 3),
            cand.reshape(Q // g, g, C * tile, 3),
            cand_sq.reshape(Q // g, g, C * tile),
        ),
    )
    loc = loc.reshape(Q, tile, k)
    sq = sq.reshape(Q, tile, k)
    # slab-local -> global target index: tile id rides a C-lane pick from
    # cidx, never a large gather
    owner = jnp.take_along_axis(
        jnp.broadcast_to(cidx[:, None, :], (Q, tile, C)), loc // tile, axis=2
    )
    gidx = owner * tile + loc % tile  # (Q, tile, k)
    kth = jnp.max(sq, axis=-1)  # (Q, tile)
    certified = kth <= excluded_sq[:, None]
    return (
        gidx.reshape(nq, k).astype(jnp.int32),
        sq.reshape(nq, k),
        certified.reshape(nq),
    )
