"""Round-4 stage profiling: where do fgicp/vgicp fresh-path ms go?

Stages: tile-culled slab kNN search, (N,k) gather + moment epilogue,
cols finalize. Goal: fused kNN->moments kernel should kill the epilogue.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fast_gicp_tpu.ops import covariance, neighbors, pallas_kernels, soa
from fast_gicp_tpu.utils.downsample import voxel_downsample
from fast_gicp_tpu.utils.io import load_pcd, strip_near_origin
from fast_gicp_tpu.utils.padding import pad_points

data = "/root/reference/data"
source = voxel_downsample(strip_near_origin(load_pcd(f"{data}/251371071.pcd")), 0.1)
sp, sm = map(jnp.asarray, pad_points(source))
n = sp.shape[0]
print("shape:", sp.shape, "device:", jax.devices()[0], flush=True)


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


# full current path (what fgicp fresh pays per cloud)
cols = jax.jit(partial(covariance.knn_covariance_cols, k=20, approx=True))
timeit("knn_covariance_cols (full, approx/culled)", lambda: cols(sp, sm))

# stage 1: culled search alone
srch = jax.jit(partial(neighbors.knn_search_culled, k=20))
idx, sq, cert = srch(sp, sp, sm)
timeit("knn_search_culled (slab kernel)", lambda: srch(sp, sp, sm))
print("certified frac:", float(jnp.mean(cert.astype(jnp.float32))), flush=True)

# stage 1b: slab kernel alone (given candidate tiles)
tile = pallas_kernels._KNN_TILE
Q = n // tile
tgt = neighbors._masked_target(sp, sm)
qt = sp.reshape(Q, tile, 3)
tt = tgt.reshape(-1, tile, 3)
cidx, excl = jax.jit(partial(neighbors.select_candidate_tiles, C=16))(qt, tt)
slab = jax.jit(partial(pallas_kernels.knn_slab_pallas, k=20))
timeit("  knn_slab_pallas alone", lambda: slab(sp, jnp.ones(n, bool), sp, sm, cidx))
timeit("  select_candidate_tiles alone", lambda: jax.jit(partial(neighbors.select_candidate_tiles, C=16))(qt, tt))

# stage 2: gather + moments epilogue from idx/sq
@jax.jit
def epilogue(idx, sq):
    w = (sq < 1e17).astype(sp.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    nbrs = sp[idx]
    mean = jnp.einsum("nk,nki->ni", w, nbrs) / cnt[:, None]
    c = (nbrs - mean[:, None, :]) * w[:, :, None]
    c0, c1, c2 = c[..., 0], c[..., 1], c[..., 2]
    inv = 1.0 / cnt
    return jnp.stack(
        [jnp.sum(c0 * c0, -1) * inv, jnp.sum(c0 * c1, -1) * inv,
         jnp.sum(c0 * c2, -1) * inv, jnp.sum(c1 * c1, -1) * inv,
         jnp.sum(c1 * c2, -1) * inv, jnp.sum(c2 * c2, -1) * inv], 0)

cov6 = epilogue(idx, sq)
timeit("  gather+moments epilogue (from idx)", lambda: epilogue(idx, sq))

# stage 3: plane finalize in cols
pl6 = jax.jit(soa.plane_covs_cols)
timeit("  plane_covs_cols", lambda: pl6(cov6))

# comparison: adaptive-radius estimator (different statistic, fast)
ad = jax.jit(partial(covariance.adaptive_radius_covariance_cols, k=20))
timeit("adaptive_radius_covariance_cols", lambda: ad(sp, sm))
