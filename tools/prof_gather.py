import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax, jax.numpy as jnp, numpy as np
from fast_gicp_tpu.ops.voxelmap import auto_grid_dims, voxel_coord
from fast_gicp_tpu.utils.downsample import voxel_downsample
from fast_gicp_tpu.utils.padding import bucket_size, pad_points
from odometry_bench import _trajectory_scans

rng = np.random.default_rng(7)
scans, _ = _trajectory_scans(rng, n_frames=2)
cloud = voxel_downsample(scans[0], 0.25)
bucket = bucket_size(len(cloud))
p, m = pad_points(cloud, bucket)
p = jnp.asarray(p); m = jnp.asarray(m)
N = bucket
gx, gy, gz = 128, 128, 32
C = gx * gy * gz
coords = np.floor(np.asarray(p) / 1.0 - 0.5).astype(np.int64)
coords -= coords.min(0)
flat = np.clip((coords[:, 0] * gy + coords[:, 1]) * gz + coords[:, 2], 0, C - 1)
idx = jnp.asarray(flat.astype(np.int32))  # REAL clustered indices
tbl = jnp.asarray(np.random.standard_normal((C + 1, 16)).astype(np.float32))
tblT = jnp.asarray(np.asarray(tbl).T.copy())
rows16 = jnp.asarray(np.random.standard_normal((N, 16)).astype(np.float32))

def timeit(name, fn, k=50):
    r = fn(); _ = jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(k): r = fn()
    _ = jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    print(f"{name:52s} {(time.perf_counter()-t0)/k*1e3:8.3f} ms")

gA = jax.jit(lambda t, i: jnp.sum(t[i].reshape(N, 16).T, axis=1))
timeit("A gather rows + transpose + reduce", lambda: gA(tbl, idx))
gB = jax.jit(lambda t, i: jnp.sum(t[i], axis=0))
timeit("B gather rows + reduce (no T)", lambda: gB(tbl, idx))
gC = jax.jit(lambda t, i: jnp.sum(t[:, i], axis=1))
timeit("C lane-gather from (16,C) + reduce", lambda: gC(tblT, idx))
sc = jax.jit(lambda r, i: jnp.zeros((C + 1, 16), jnp.float32).at[i].add(r))
timeit("scatter-add (N,16) into (C+1,16) REAL idx", lambda: sc(rows16, idx))
scb = jax.jit(lambda r, i: jnp.zeros((C + 1, 16), jnp.bfloat16).at[i].add(r.astype(jnp.bfloat16)))
timeit("scatter-add bf16 into (C+1,16)", lambda: scb(rows16, idx))
# sorted idx variant
idx_sorted = jnp.sort(idx)
timeit("scatter-add f32, SORTED idx", lambda: sc(rows16, idx_sorted))
# 1-D int gather for reference
g1 = jax.jit(lambda g, i: jnp.sum(g[i]))
grid1 = jnp.asarray(np.random.randint(0, N, C + 1).astype(np.int32))
timeit("1-D int32 gather (ref)", lambda: g1(grid1, idx))
