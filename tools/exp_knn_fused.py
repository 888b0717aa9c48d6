"""TPU experiment: fused kNN-moments kernel vs the round-3 path (dev tool).

In-scan per-cloud cost (lax.scan of M trips, one dispatch) + end fitness
for slab geometry variants. Drives the round-4 'fgicp/vgicp fresh < 10 ms'
target.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fast_gicp_tpu.ops import covariance, pallas_kernels, soa
from fast_gicp_tpu.ops.neighbors import knn_search_culled
from fast_gicp_tpu.utils.downsample import approximate_voxel_downsample
from fast_gicp_tpu.utils.io import load_pcd, load_relative_txt, strip_near_origin
from fast_gicp_tpu.utils.padding import pad_points

data = "/root/reference/data"
target = approximate_voxel_downsample(strip_near_origin(load_pcd(f"{data}/251370668.pcd")), 0.1)
source = approximate_voxel_downsample(strip_near_origin(load_pcd(f"{data}/251371071.pcd")), 0.1)
gt = load_relative_txt(f"{data}/relative.txt")
sp, sm = map(jnp.asarray, pad_points(source))
tp, tm = map(jnp.asarray, pad_points(target))
print("source pad:", sp.shape, "target pad:", tp.shape, flush=True)

M = 30


def scan_time(name, fn):
    """ONE dispatch: lax.scan of M trips with a jitter so nothing hoists."""
    @jax.jit
    def run(pts, mask):
        def step(carry, i):
            p = pts + 1e-6 * i  # re-observe
            out = fn(p, mask)
            return carry + jnp.sum(out), None
        return jax.lax.scan(step, 0.0, jnp.arange(M, dtype=jnp.float32))[0]

    r = run(sp, sm); r.block_until_ready(); float(r)
    t0 = time.perf_counter()
    r = run(sp, sm); float(r)
    dt = (time.perf_counter() - t0) / M * 1e3
    print(f"{name:46s} {dt:8.3f} ms/cloud", flush=True)
    return dt


def old_path(p, m):
    idx, sq, _ = knn_search_culled(p, p, m, k=20)
    w = (sq < 1e17).astype(p.dtype)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    nbrs = p[idx]
    mean = jnp.einsum("nk,nki->ni", w, nbrs) / cnt[:, None]
    c = (nbrs - mean[:, None, :]) * w[:, :, None]
    c0, c1, c2 = c[..., 0], c[..., 1], c[..., 2]
    inv = 1.0 / cnt
    cov6 = jnp.stack(
        [jnp.sum(c0*c0,-1)*inv, jnp.sum(c0*c1,-1)*inv, jnp.sum(c0*c2,-1)*inv,
         jnp.sum(c1*c1,-1)*inv, jnp.sum(c1*c2,-1)*inv, jnp.sum(c2*c2,-1)*inv], 0)
    return soa.plane_covs_cols(cov6)


def fused(ct, C):
    def f(p, m):
        mom, _k, _e = covariance._knn_moment_cols_fused(
            p, m, 20, cand_tile=ct, cand_tiles=C)
        return soa.plane_covs_cols(covariance._finalize_mom_cols(mom))
    return f


scan_time("old: knn_search_culled(256x16) + epilogue", old_path)
variants = [(256, 16), (256, 8), (128, 16), (128, 12), (128, 8), (64, 24), (64, 16)]
for ct, C in variants:
    scan_time(f"fused ct={ct} C={C} (slab {ct*C})", fused(ct, C))

# accuracy: stats vs exact + end-to-end registration
from fast_gicp_tpu.models.gicp import GICPConfig, gicp_align
from fast_gicp_tpu.ops.covariance import knn_covariance_cols

gcfg = GICPConfig(refresh_iterations=2)
eye = jnp.eye(4, dtype=jnp.float32)
exact_s = jax.jit(partial(knn_covariance_cols, k=20, approx=False))(sp, sm)
exact_t = jax.jit(partial(knn_covariance_cols, k=20, approx=False))(tp, tm)
r = gicp_align(sp, sm, exact_s, tp, tm, exact_t, eye, gcfg)
T = np.asarray(r.transformation)
e0 = np.linalg.norm((np.linalg.inv(gt) @ T)[:3, 3])
print(f"exact-kNN t_err = {e0:.4f} m", flush=True)

for ct, C in [(256, 16), (128, 16), (128, 12), (128, 8), (64, 24)]:
    f = jax.jit(fused(ct, C))
    cs, ctg = f(sp, sm), f(tp, tm)
    # cov agreement vs exact (plane covs are unit-trace-ish; abs diff ok)
    da = float(jnp.max(jnp.abs(cs - exact_s)))
    frac = float(jnp.mean((jnp.abs(cs - exact_s) > 0.05).any(axis=0)))
    r = gicp_align(sp, sm, cs, tp, tm, ctg, eye, gcfg)
    T = np.asarray(r.transformation)
    e = np.linalg.norm((np.linalg.inv(gt) @ T)[:3, 3])
    print(f"ct={ct} C={C}: t_err={e:.4f} m  max|dcov|={da:.3f} "
          f"frac_pts_diff>.05={frac:.4f}", flush=True)
