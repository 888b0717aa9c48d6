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
print("N:", N, "unique cells:", len(np.unique(flat)))
idx = jnp.asarray(flat.astype(np.int32))
rows16 = jnp.asarray(np.random.standard_normal((N, 16)).astype(np.float32))
NU = N // 2
# unique compacted indices (pad with distinct trailing slots)
u = np.unique(flat)
uidx = np.full(NU, 0, np.int64)
uidx[:len(u)] = u
uidx[len(u):] = C + 1 + np.arange(NU - len(u))  # distinct parking slots
uidx = jnp.asarray(uidx.astype(np.int32))
urows = jnp.asarray(np.random.standard_normal((NU, 16)).astype(np.float32))
K = 100

def timeit(name, fn, *args):
    f = jax.jit(fn)
    r = f(*args); jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    t0 = time.perf_counter()
    r = f(*args)
    jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    print(f"{name:52s} {(time.perf_counter()-t0)/K*1e3:8.3f} ms/op")

def loopSet(r, i):
    def body(k, t):
        t2 = t.at[i].set(r * (1.0 + t[0, 0] * 1e-12), unique_indices=True)
        return t2
    return jax.lax.fori_loop(0, K, body, jnp.zeros((C + 1 + NU, 16)))
timeit(f"scatter-SET unique ({NU} rows) -> big", loopSet, urows, uidx)

def loopAdd2(r, i):
    def body(k, t):
        return t.at[i].add(r * (1.0 + t[0, 0] * 1e-12))
    return jax.lax.fori_loop(0, K, body, jnp.zeros((C + 1 + NU, 16)))
timeit(f"scatter-ADD ({NU} rows) -> big", loopAdd2, urows, uidx)

def loopCumsum(r):
    def body(k, s):
        cs = jnp.cumsum(r + s[0] * 1e-12, axis=0)
        return s + cs[-1] * 1e-9
    return jax.lax.fori_loop(0, K, body, jnp.zeros(16))
timeit("cumsum (N,16) axis0", loopCumsum, rows16)
