import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax, jax.numpy as jnp, numpy as np

N = 22528
C = 524288  # 128*128*32
rng = np.random.default_rng(0)
idx_big = jnp.asarray(rng.integers(0, C, N).astype(np.int32))
idx_small = jnp.asarray(rng.integers(0, N, N).astype(np.int32))
rows16 = jnp.asarray(rng.standard_normal((N, 16)).astype(np.float32))
tbl16_small = jnp.asarray(rng.standard_normal((N, 16)).astype(np.float32))
tbl16_big = jnp.asarray(rng.standard_normal((C, 16)).astype(np.float32))
tbl8_big = jnp.asarray(rng.integers(0, N, (C, 8)).astype(np.int32))
grid1d = jnp.asarray(rng.integers(0, N, C).astype(np.int32))
pidx = jnp.arange(N, dtype=jnp.int32)

def timeit(name, fn, k=30):
    r = fn(); _ = jax.device_get(jax.tree_util.tree_leaves(r)[0].ravel()[:1])
    # force via tiny slice to avoid tunnel transfer of big arrays
    t0 = time.perf_counter()
    for _ in range(k): r = fn()
    _ = jax.device_get(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    print(f"{name:50s} {(time.perf_counter()-t0)/k*1e3:8.3f} ms")

f_sum = jax.jit(lambda t: jnp.sum(t))
g1 = jax.jit(lambda g, i: jnp.sum(g[i].astype(jnp.float32)))
timeit("1-D int gather 22k from 524k (+sum)", lambda: g1(grid1d, idx_big))
g2 = jax.jit(lambda t, i: jnp.sum(t[i]))
timeit("row gather (22k,16)f32 from (524k,16) (+sum)", lambda: g2(tbl16_big, idx_big))
timeit("row gather (22k,16)f32 from (22k,16) (+sum)", lambda: g2(tbl16_small, idx_small))
g3 = jax.jit(lambda t, i: jnp.sum(t[i].astype(jnp.float32)))
timeit("row gather (22k,8)int from (524k,8) (+sum)", lambda: g3(tbl8_big, idx_big))
s1 = jax.jit(lambda r, i: jnp.zeros((N + 1, 16), jnp.float32).at[i].add(r))
timeit("scatter-add (22k,16) into (22k,16)", lambda: s1(rows16, idx_small))
s2 = jax.jit(lambda r, i: jnp.zeros((C + 1, 16), jnp.float32).at[i].add(r))
timeit("scatter-add (22k,16) into (524k,16)", lambda: s2(rows16, idx_big))
s3 = jax.jit(lambda i: jnp.full(C + 1, N, jnp.int32).at[i].min(pidx))
timeit("scatter-min 1-D 22k into 524k", lambda: s3(idx_big))
s4 = jax.jit(lambda g: jnp.broadcast_to(g[:, None], (C, 8)) + 0)
timeit("materialize (524k,8) int broadcast", lambda: s4(grid1d))
tr = jax.jit(lambda r: r.T + 0.0)
timeit("transpose (22k,16) -> (16,22k)", lambda: tr(rows16))
