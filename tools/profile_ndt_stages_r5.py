"""Scan-rolled per-stage timing for fresh NDT-D2D (dev tool, round 5).

Each stage runs as its own N-trip lax.scan with the same per-trip jitter
as the device_loop bench; one force at the end. Stage deltas are honest
(no in-scan harness epilogue; the ~35 ms tunnel force amortizes over N).
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from fast_gicp_tpu import se3
from fast_gicp_tpu.models.ndt import (
    NDTConfig, _compact_source_voxels, _ndt_voxelmap, ndt_align,
)
from fast_gicp_tpu.ops.voxelmap import auto_grid_dims, build_voxelmap
from fast_gicp_tpu.utils.downsample import voxel_downsample
from fast_gicp_tpu.utils.io import load_pcd, strip_near_origin
from fast_gicp_tpu.utils.padding import pad_points

data = "/root/reference/data"
target = voxel_downsample(strip_near_origin(load_pcd(f"{data}/251370668.pcd")), 0.1)
source = voxel_downsample(strip_near_origin(load_pcd(f"{data}/251371071.pcd")), 0.1)
sp, sm = map(jnp.asarray, pad_points(source))
tp, tm = map(jnp.asarray, pad_points(target))
ndims = auto_grid_dims(np.concatenate([source, target]), 1.0)
eye = jnp.eye(4, dtype=jnp.float32)
cfg = NDTConfig(resolution=1.0, grid_dims=ndims, refresh_iterations=3,
                max_source_voxels=2048)
print("shapes:", sp.shape, tp.shape, "grid:", ndims, "dev:", jax.devices()[0])

N = 50
rng = np.random.default_rng(0)
twists = 1e-5 * rng.standard_normal((N, 6)).astype(np.float32)
jitters = jnp.asarray(
    np.stack([np.asarray(se3.se3_exp(jnp.asarray(t))) for t in twists])
)


def scanned(body):
    @jax.jit
    def f(jitters):
        def step(c, J):
            sj = sp @ J[:3, :3].T + J[:3, 3]
            tj = tp @ J[:3, :3].T + J[:3, 3]
            return c, body(sj, tj)
        return jax.lax.scan(step, 0, jitters)[1]
    return f


def timeit(name, f):
    out = f(jitters)
    jax.block_until_ready(out)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    out = f(jitters)
    np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) * 1e3 / N
    print(f"{name:44s} {dt:8.3f} ms/align")
    return dt


# stage bodies (each returns something small so the scan carries ~nothing)
def b_jitter_only(sj, tj):
    return jnp.sum(sj[0]) + jnp.sum(tj[0])


def b_tmap(sj, tj):
    vm = _ndt_voxelmap(tj, tm, cfg.resolution, grid_dims=cfg.grid_dims)
    return vm.packed[0, 0]


def b_tmap_raw(sj, tj):
    vm = build_voxelmap(tj, tm, cfg.resolution, mode="raw",
                        grid_dims=cfg.grid_dims)
    return vm.packed[0, 0]


def b_both_maps(sj, tj):
    vm1 = _ndt_voxelmap(tj, tm, cfg.resolution, grid_dims=cfg.grid_dims)
    vm2 = _ndt_voxelmap(sj, sm, cfg.resolution, grid_dims=cfg.grid_dims)
    return vm1.packed[0, 0] + vm2.packed[0, 0]


def b_both_maps_compact(sj, tj):
    vm1 = _ndt_voxelmap(tj, tm, cfg.resolution, grid_dims=cfg.grid_dims)
    vm2 = _ndt_voxelmap(sj, sm, cfg.resolution, grid_dims=cfg.grid_dims)
    means, mask, covs = _compact_source_voxels(vm2, cfg.max_source_voxels)
    return vm1.packed[0, 0] + jnp.sum(means[0]) + covs[0, 0, 0]


def b_full(sj, tj):
    return ndt_align(sj, sm, tj, tm, eye, cfg).transformation


timeit("jitter only (floor)", scanned(b_jitter_only))
t_raw = timeit("target raw build (no clamp)", scanned(b_tmap_raw))
t_map = timeit("target ndt build (raw+clamp)", scanned(b_tmap))
t_both = timeit("both ndt builds", scanned(b_both_maps))
t_bc = timeit("both builds + source compact", scanned(b_both_maps_compact))
t_all = timeit("full d2d align (R=3)", scanned(b_full))
print(f"\nclamp cost/build: {t_map - t_raw:.3f} ms")
print(f"second build: {t_both - t_map:.3f} ms")
print(f"compact: {t_bc - t_both:.3f} ms")
print(f"solve (full - builds+compact): {t_all - t_bc:.3f} ms")
