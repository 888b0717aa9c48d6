"""Stage-level TPU profiling for kNN covariance estimation (dev tool).

fgicp/vgicp 'fresh' rows pay 2x knn_covariances (~9.7 ms each inferred from
BENCH_METHODS fresh-reuse deltas); find where it goes.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fast_gicp_tpu.ops.covariance import knn_covariances, regularize_covariances
from fast_gicp_tpu.ops.neighbors import knn_search, _masked_target
from fast_gicp_tpu.utils.downsample import voxel_downsample
from fast_gicp_tpu.utils.io import load_pcd, strip_near_origin
from fast_gicp_tpu.utils.padding import pad_points

data = "/root/reference/data"
source = voxel_downsample(strip_near_origin(load_pcd(f"{data}/251371071.pcd")), 0.1)
sp, sm = map(jnp.asarray, pad_points(source))
print("shape:", sp.shape, "device:", jax.devices()[0])


def timeit(name, fn, k=50):
    r = fn()
    jax.block_until_ready(r)
    _ = jax.device_get(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(k):
        r = fn()
    _ = jax.device_get(jax.tree_util.tree_leaves(r)[0])
    dt = (time.perf_counter() - t0) / k * 1e3
    print(f"{name:52s} {dt:8.3f} ms", flush=True)
    return r


from fast_gicp_tpu.ops.pallas_kernels import nn_search_pallas
timeit("nn_search_pallas 1-NN", lambda: nn_search_pallas(sp, sp, sm))

knn_cov = jax.jit(partial(knn_covariances, approx=True))
knn_cov_exact = jax.jit(partial(knn_covariances, approx=False))
timeit("knn_covariances approx (full)", lambda: knn_cov(sp, sm))
timeit("knn_covariances exact (full)", lambda: knn_cov_exact(sp, sm))

# stage: knn_search alone
srch = jax.jit(partial(knn_search, k=20, approx=True))
srch_exact = jax.jit(partial(knn_search, k=20, approx=False))
idx, sq = srch(sp, sp, sm)
timeit("knn_search approx (idx+sq)", lambda: srch(sp, sp, sm))
timeit("knn_search exact", lambda: srch_exact(sp, sp, sm))

# chunk-size sweep for the search
for cs in (512, 1024, 2048, 4096):
    s = jax.jit(partial(knn_search, k=20, approx=True, chunk_size=cs))
    timeit(f"knn_search approx chunk={cs}", lambda s=s: s(sp, sp, sm))

# stage: moments from given idx/sq
@jax.jit
def moments(idx, sq):
    w = (sq < 1e17).astype(sp.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    nbrs = sp[idx]
    mean = jnp.einsum("nk,nki->ni", w, nbrs) / cnt[:, None]
    centered = (nbrs - mean[:, None, :]) * w[:, :, None]
    return jnp.einsum("nki,nkj->nij", centered, centered) / cnt[:, None, None]


cov = moments(idx, sq)
timeit("  gather+moments from idx", lambda: moments(idx, sq))

reg = jax.jit(partial(regularize_covariances, method="plane"))
timeit("  regularize plane (AoS)", lambda: reg(cov))

# bf16 distance variant of the search (covariance stats don't need exact
# ordering): compute -2 q.t on the MXU in bf16, rest f32
def knn_search_bf16(query, target, target_mask, k=20, chunk_size=1024):
    nq = query.shape[0]
    tgt = _masked_target(target, target_mask)
    t_sq = jnp.sum(tgt * tgt, axis=-1)
    tb = tgt.astype(jnp.bfloat16)

    def body(q):
        qt = jnp.dot(q.astype(jnp.bfloat16), tb.T,
                     preferred_element_type=jnp.float32)
        d = jnp.sum(q * q, axis=-1)[:, None] - 2.0 * qt + t_sq[None, :]
        neg_top, idx = jax.lax.approx_max_k(-d, k, recall_target=0.95)
        return idx.astype(jnp.int32), jnp.maximum(-neg_top, 0.0)

    idxs, sqs = jax.lax.map(body, query.reshape(-1, chunk_size, 3))
    return idxs.reshape(nq, k), sqs.reshape(nq, k)


sb = jax.jit(partial(knn_search_bf16))
i2, s2 = sb(sp, sp, sm)
timeit("knn_search bf16-MXU approx", lambda: sb(sp, sp, sm))
# recall of bf16 vs exact
ie, se = srch_exact(sp, sp, sm)
ia = np.asarray(idx); ib = np.asarray(i2); iex = np.asarray(ie)
rec_a = np.mean([len(np.intersect1d(ia[i], iex[i])) / 20 for i in range(0, len(ia), 37)])
rec_b = np.mean([len(np.intersect1d(ib[i], iex[i])) / 20 for i in range(0, len(ib), 37)])
print(f"recall approx={rec_a:.4f} bf16={rec_b:.4f}")
