import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import time
import jax, jax.numpy as jnp, numpy as np
from fast_gicp_tpu.models.vgicp import VGICPConfig, make_vgicp_objective, _build_target_map
from fast_gicp_tpu.ops.covariance import rbf_covariance_cols_jit, rbf_covariances_jit
from fast_gicp_tpu.ops.pallas_kernels import rbf_moments_T
from fast_gicp_tpu.ops.voxelmap import auto_grid_dims, build_raw_grid, neighbor_offsets
from fast_gicp_tpu.precision import f32_matmuls
from fast_gicp_tpu.solver import LsqConfig, lsq_solve
from fast_gicp_tpu.utils.downsample import voxel_downsample
from fast_gicp_tpu.utils.padding import bucket_size, pad_points
from odometry_bench import _trajectory_scans
from functools import partial

rng = np.random.default_rng(7)
scans, gt = _trajectory_scans(rng, n_frames=5)
clouds = [voxel_downsample(s, 0.25) for s in scans]
bucket = max(bucket_size(len(c)) for c in clouds)
padded = [pad_points(c, bucket) for c in clouds]
pts = jnp.asarray(np.stack([p for p, _ in padded]))
msk = jnp.asarray(np.stack([m for _, m in padded]))
dims = auto_grid_dims(np.concatenate(clouds), 1.0)
config = VGICPConfig(resolution=1.0, grid_dims=dims)
offsets = jnp.asarray(neighbor_offsets("direct1", 1.5))
print("bucket", bucket, "dims", dims)

def timeit(name, fn, k=50):
    r = fn(); _ = jax.device_get(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(k): r = fn()
    _ = jax.device_get(jax.tree_util.tree_leaves(r)[0])
    print(f"{name:46s} {(time.perf_counter()-t0)/k*1e3:8.3f} ms")
    return r

p0, m0, p1, m1 = pts[0], msk[0], pts[1], msk[1]
timeit("rbf_moments_T (pallas+decenter)", lambda: rbf_moments_T(p0, m0, 0.5, 3.0))
c0 = timeit("rbf_covariance_cols", lambda: rbf_covariance_cols_jit(p0, m0))
c1 = rbf_covariance_cols_jit(p1, m1)

build_jit = jax.jit(lambda p, m, c: build_raw_grid(p, m, 1.0, c, dims))
timeit("build_raw_grid", lambda: build_jit(p0, m0, c0))

@jax.jit
@f32_matmuls
def solve_raw(sp, sm, sc, tp, tm, tc, g):
    vm = _build_target_map(tp, tm, tc, config)
    lin, err = make_vgicp_objective(sp, sm, sc, vm, offsets, config)
    return lsq_solve(lin, err, g, config.lsq)

gI = jnp.eye(4, dtype=jnp.float32)
res = timeit("build + LM solve (raw grid)", lambda: solve_raw(p1, m1, c1, p0, m0, c0, gI))
print("   iters:", int(res.iterations))
gW = res.transformation
res2 = timeit("build + LM solve (warm guess)", lambda: solve_raw(p1, m1, c1, p0, m0, c0, gW))
print("   iters:", int(res2.iterations))

cfg_gn = config._replace(lsq=LsqConfig(optimizer="gn", max_iterations=8))
@jax.jit
@f32_matmuls
def solve_gn(sp, sm, sc, tp, tm, tc, g):
    vm = _build_target_map(tp, tm, tc, cfg_gn)
    lin, err = make_vgicp_objective(sp, sm, sc, vm, offsets, cfg_gn)
    return lsq_solve(lin, err, g, cfg_gn.lsq)
res3 = timeit("build + GN solve (warm guess)", lambda: solve_gn(p1, m1, c1, p0, m0, c0, gW))
print("   iters:", int(res3.iterations), "T diff vs LM:", float(jnp.abs(res3.transformation - res2.transformation).max()))

@jax.jit
@f32_matmuls
def lin_once(sp, sm, sc, tp, tm, tc, x):
    vm = _build_target_map(tp, tm, tc, config)
    lin, err = make_vgicp_objective(sp, sm, sc, vm, offsets, config)
    return lin(x)[0]
timeit("build + 1 linearize (raw)", lambda: lin_once(p1, m1, c1, p0, m0, c0, gI))
