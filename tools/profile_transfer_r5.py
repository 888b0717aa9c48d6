import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import time
import numpy as np
import jax, jax.numpy as jnp

x = jnp.ones((8, 8)); np.asarray(x)  # init backend
N = 40

def timed(name, fn, sync=lambda: None):
    fn(); sync()
    t0 = time.perf_counter()
    for _ in range(N):
        fn()
    sync()
    print(f"{name:44s} {(time.perf_counter()-t0)*1e3/N:8.2f} ms/it", flush=True)

out = [None]
def t1():
    out[0] = jnp.eye(4, dtype=jnp.float32)
timed("jnp.eye(4) fresh each call", t1, lambda: np.asarray(out[0]))

host = np.eye(4, dtype=np.float32)
def t2():
    out[0] = jnp.asarray(host)
timed("jnp.asarray(np.eye) each call", t2, lambda: np.asarray(out[0]))

big = np.zeros((18432, 3), np.float32)
def t3():
    out[0] = jnp.asarray(big)
timed("jnp.asarray((18k,3)) upload", t3, lambda: np.asarray(out[0][0]))

dev_eye = jnp.eye(4, dtype=jnp.float32); np.asarray(dev_eye)
f = jax.jit(lambda a: a @ a)
def t4():
    out[0] = f(dev_eye)
timed("tiny jit dispatch (4x4 matmul)", t4, lambda: np.asarray(out[0]))
