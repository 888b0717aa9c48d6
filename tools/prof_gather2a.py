import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax, jax.numpy as jnp, numpy as np
from fast_gicp_tpu.utils.downsample import voxel_downsample
from fast_gicp_tpu.utils.padding import bucket_size, pad_points
from odometry_bench import _trajectory_scans

rng = np.random.default_rng(7)
scans, _ = _trajectory_scans(rng, n_frames=2)
cloud = voxel_downsample(scans[0], 0.25)
N = bucket_size(len(cloud))
p, m = pad_points(cloud, N)
gx, gy, gz = 128, 128, 32
C = gx * gy * gz
coords = np.floor(p / 1.0 - 0.5).astype(np.int64); coords -= coords.min(0)
flat = np.clip((coords[:, 0] * gy + coords[:, 1]) * gz + coords[:, 2], 0, C - 1)
idx = jnp.asarray(flat.astype(np.int32))
tbl = jnp.asarray(np.random.standard_normal((C + 1, 16)).astype(np.float32))
tblT = jnp.asarray(np.asarray(tbl).T.copy())
rows16 = jnp.asarray(np.random.standard_normal((N, 16)).astype(np.float32))
K = 100

def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    t0 = time.perf_counter()
    r = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    dt = (time.perf_counter() - t0) / K * 1e3
    print(f"{name:52s} {dt:8.3f} ms/op")

def loopA(t, i):  # gather + transpose, chained
    def body(k, s):
        ii = i + (s[0].astype(jnp.int32) & 0)
        g = t[ii].reshape(N, 16).T  # (16, N)
        return s + g[:, 0] * 1e-9
    return jax.lax.fori_loop(0, K, body, jnp.zeros(16))
timeit("A gather rows + transpose", loopA, tbl, idx)

def loopB(t, i):
    def body(k, s):
        ii = i + (s[0].astype(jnp.int32) & 0)
        g = t[ii]  # (N, 16)
        return s + g[0] * 1e-9
    return jax.lax.fori_loop(0, K, body, jnp.zeros(16))
pass

def loopC(t, i):
    def body(k, s):
        ii = i + (s[0].astype(jnp.int32) & 0)
        g = t[:, ii]  # (16, N)
        return s + g[:, 0] * 1e-9
    return jax.lax.fori_loop(0, K, body, jnp.zeros(16))
timeit("C lane-gather from (16,C)", loopC, tblT, idx)

def loopS(r, i):
    def body(k, t):
        return t.at[i].add(r * (1.0 + t[0, 0] * 1e-12))
    return jax.lax.fori_loop(0, K, body, jnp.zeros((C + 1, 16)))
timeit("S scatter-add (N,16) -> (C+1,16)", loopS, rows16, idx)

def loopS2(r, i):
    def body(k, t):
        return t.at[i].add(r * (1.0 + t[0, 0] * 1e-12))
    return jax.lax.fori_loop(0, K, body, jnp.zeros((N + 1, 16)))
idx_small = jnp.asarray((flat % N).astype(np.int32))
pass

def loopG1(g, i):
    def body(k, s):
        ii = i + (s.astype(jnp.int32) & 0)
        return s + g[ii][0].astype(jnp.float32) * 1e-9
    return jax.lax.fori_loop(0, K, body, jnp.float32(0))
grid1 = jnp.asarray(np.random.randint(0, N, C + 1).astype(np.int32))
pass

def loopT(r):
    def body(k, s):
        g = (r + s[0, 0] * 1e-12).T
        return s + g * 1e-9
    return jax.lax.fori_loop(0, K, body, jnp.zeros((16, N)))
pass
