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
