"""Micro-variants for the round-5 NDT cost cuts (dev tool)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from fast_gicp_tpu import se3
from fast_gicp_tpu.models.ndt import NDTConfig, _ndt_voxelmap
from fast_gicp_tpu.ops.voxelmap import auto_grid_dims
from fast_gicp_tpu.utils.downsample import voxel_downsample
from fast_gicp_tpu.utils.io import load_pcd, strip_near_origin
from fast_gicp_tpu.utils.padding import pad_points

data = "/root/reference/data"
target = voxel_downsample(strip_near_origin(load_pcd(f"{data}/251370668.pcd")), 0.1)
source = voxel_downsample(strip_near_origin(load_pcd(f"{data}/251371071.pcd")), 0.1)
sp, sm = map(jnp.asarray, pad_points(source))
tp, tm = map(jnp.asarray, pad_points(target))
spc = jnp.swapaxes(sp, 0, 1)  # (3, N) columns
tpc = jnp.swapaxes(tp, 0, 1)
ndims = auto_grid_dims(np.concatenate([source, target]), 1.0)
cfg = NDTConfig(resolution=1.0, grid_dims=ndims, max_source_voxels=2048)
print("dev:", jax.devices()[0])

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
            return c, body(J)
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
    print(f"{name:52s} {dt:8.3f} ms/align")
    return dt


def b_nop(J):
    return J[0, 0]


def b_aos(J):  # current bench protocol transform
    sj = sp @ J[:3, :3].T + J[:3, 3]
    tj = tp @ J[:3, :3].T + J[:3, 3]
    return sj[0, 0] + tj[0, 0]


def b_cols(J):  # column transform, stay in columns
    sj = J[:3, :3] @ spc + J[:3, 3, None]
    tj = J[:3, :3] @ tpc + J[:3, 3, None]
    return sj[0, 0] + tj[0, 0]


def b_cols_t(J):  # column transform + transpose back to (N, 3)
    sj = (J[:3, :3] @ spc + J[:3, 3, None]).T
    tj = (J[:3, : 3] @ tpc + J[:3, 3, None]).T
    return sj[0, 0] + tj[0, 0]


def b_compact(J):
    sj = J[:3, :3] @ spc + J[:3, 3, None]
    vm = _ndt_voxelmap(sj.T, sm, cfg.resolution, grid_dims=cfg.grid_dims)
    from fast_gicp_tpu.models.ndt import _compact_source_voxels
    m, msk, c = _compact_source_voxels(vm, cfg.max_source_voxels)
    return jnp.sum(m[0]) + c[0, 0, 0]


def b_build_only(J):
    sj = J[:3, :3] @ spc + J[:3, 3, None]
    vm = _ndt_voxelmap(sj.T, sm, cfg.resolution, grid_dims=cfg.grid_dims)
    return vm.packed[0, 0]


def b_nonzero_only(J):
    sj = J[:3, :3] @ spc + J[:3, 3, None]
    vm = _ndt_voxelmap(sj.T, sm, cfg.resolution, grid_dims=cfg.grid_dims)
    occ = vm.counts > 0
    (idx,) = jnp.nonzero(occ, size=2048, fill_value=0)
    return idx[0]


t0 = timeit("nop floor", scanned(b_nop))
timeit("AoS jitter transform (current bench)", scanned(b_aos))
timeit("column jitter transform", scanned(b_cols))
timeit("column jitter + transpose to AoS", scanned(b_cols_t))
tb = timeit("col jitter + source ndt build", scanned(b_build_only))
tnz = timeit("  + nonzero only", scanned(b_nonzero_only))
tc = timeit("  + full compact (3 gathers)", scanned(b_compact))
print(f"\nnonzero: {tnz - tb:.3f} ms, gathers: {tc - tnz:.3f} ms")
