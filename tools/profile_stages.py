"""Stage-level TPU profiling for the VGICP pipeline (dev tool, not shipped).

Methodology per bench.py: enqueue K iterations back-to-back, force only the
final result (each device->host force on the axon tunnel costs ~35 ms).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import time

import jax
import jax.numpy as jnp
import numpy as np

from fast_gicp_tpu.models.vgicp import VGICPConfig, vgicp_align
from fast_gicp_tpu.ops.covariance import rbf_covariances_jit, knn_covariances_jit
from fast_gicp_tpu.ops.pallas_kernels import rbf_moments_pallas, nn_search_pallas
from fast_gicp_tpu.ops.voxelmap import build_voxelmap
from fast_gicp_tpu.utils.downsample import voxel_downsample
from fast_gicp_tpu.utils.io import load_pcd, strip_near_origin
from fast_gicp_tpu.utils.padding import pad_points

data = "/root/reference/data"
target = voxel_downsample(strip_near_origin(load_pcd(f"{data}/251370668.pcd")), 0.1)
source = voxel_downsample(strip_near_origin(load_pcd(f"{data}/251371071.pcd")), 0.1)
sp, sm = map(jnp.asarray, pad_points(source))
tp, tm = map(jnp.asarray, pad_points(target))
guess = jnp.eye(4, dtype=jnp.float32)
from fast_gicp_tpu.ops.voxelmap import auto_grid_dims

dims = auto_grid_dims(target, 1.0)
config = VGICPConfig(grid_dims=dims)
print("shapes:", sp.shape, tp.shape, "grid:", dims, "device:", jax.devices()[0])

build_jit = jax.jit(lambda p, m, c: build_voxelmap(p, m, 1.0, covs=c))
build_grid_jit = jax.jit(
    lambda p, m, c: build_voxelmap(p, m, 1.0, covs=c, grid_dims=dims)
)


def timeit(name, fn, k=100):
    r = fn()
    jax.block_until_ready(r)
    _ = jax.device_get(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(k):
        r = fn()
    _ = jax.device_get(jax.tree_util.tree_leaves(r)[0])
    dt = (time.perf_counter() - t0) / k * 1e3
    print(f"{name:42s} {dt:8.3f} ms")
    return r


scovs = timeit("rbf_covariances (XLA)", lambda: rbf_covariances_jit(sp, sm))
timeit("rbf_moments_pallas", lambda: rbf_moments_pallas(sp, sm, 0.5, 3.0))
timeit("knn_covariances (XLA approx)", lambda: knn_covariances_jit(sp, sm))
timeit("nn_search_pallas", lambda: nn_search_pallas(sp, tp, tm))
tcovs = rbf_covariances_jit(tp, tm)
vm = timeit("build_voxelmap (hash)", lambda: build_jit(tp, tm, tcovs))
timeit("build_voxelmap (grid, sortless)", lambda: build_grid_jit(tp, tm, tcovs))
timeit(
    "vgicp_align (solve only, covs ready)",
    lambda: vgicp_align(sp, sm, scovs, tp, tm, tcovs, guess, config),
)


def full():
    sc = rbf_covariances_jit(sp, sm)
    tc = rbf_covariances_jit(tp, tm)
    return vgicp_align(sp, sm, sc, tp, tm, tc, guess, config)


timeit("full registration (2x rbf + align)", full)
