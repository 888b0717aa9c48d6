"""Stage-level TPU profiling for the NDT solves (dev tool, not shipped).

Methodology per bench.py: enqueue K iterations back-to-back, force only the
final result (each device->host force on the axon tunnel costs ~35 ms).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fast_gicp_tpu.models.ndt import (
    NDTConfig, ndt_align, _ndt_voxelmap, _ndt_objective_for,
)
from fast_gicp_tpu.ops.voxelmap import auto_grid_dims
from fast_gicp_tpu.utils.downsample import voxel_downsample
from fast_gicp_tpu.utils.io import load_pcd, strip_near_origin
from fast_gicp_tpu.utils.padding import pad_points

data = "/root/reference/data"
target = voxel_downsample(strip_near_origin(load_pcd(f"{data}/251370668.pcd")), 0.1)
source = voxel_downsample(strip_near_origin(load_pcd(f"{data}/251371071.pcd")), 0.1)
sp, sm = map(jnp.asarray, pad_points(source))
tp, tm = map(jnp.asarray, pad_points(target))
guess = jnp.eye(4, dtype=jnp.float32)
both = np.concatenate([source, target])
ndims = auto_grid_dims(both, 1.0)
print("shapes:", sp.shape, tp.shape, "grid:", ndims, "device:", jax.devices()[0])

cfg_d2d = NDTConfig(resolution=1.0, grid_dims=ndims, refresh_iterations=3)
cfg_p2d = cfg_d2d._replace(distance_mode="p2d", refresh_iterations=6)


def timeit(name, fn, k=50):
    r = fn()
    jax.block_until_ready(r)
    _ = jax.device_get(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(k):
        r = fn()
    _ = jax.device_get(np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
                       if False else jax.tree_util.tree_leaves(r)[0])
    dt = (time.perf_counter() - t0) / k * 1e3
    print(f"{name:46s} {dt:8.3f} ms")
    return r


# --- full aligns + iteration counts ---
for name, cfg in [("ndt_d2d align", cfg_d2d), ("ndt_p2d align", cfg_p2d)]:
    r = timeit(name, lambda cfg=cfg: ndt_align(sp, sm, tp, tm, guess, cfg))
    print(f"    iterations={int(r.iterations)} error={float(r.error):.4f}")

# sweep p2d refresh iterations
for R in (2, 3, 4, 6, None):
    cfg = cfg_p2d._replace(refresh_iterations=R)
    r = timeit(f"ndt_p2d align R={R}",
               lambda cfg=cfg: ndt_align(sp, sm, tp, tm, guess, cfg))
    print(f"    iterations={int(r.iterations)} error={float(r.error):.4f}")

# --- stage pieces for p2d ---
@partial(jax.jit, static_argnames=("cfg",))
def p2d_freeze(x, cfg):
    lin, err, freeze, linf = _ndt_objective_for(sp, sm, tp, tm, cfg, with_freeze=True)
    return freeze(x)


@partial(jax.jit, static_argnames=("cfg",))
def p2d_lin_frozen(x, frozen, cfg):
    lin, err, freeze, linf = _ndt_objective_for(sp, sm, tp, tm, cfg, with_freeze=True)
    e, H, b, aux = linf(x, frozen)
    return e, H, b


@partial(jax.jit, static_argnames=("cfg",))
def p2d_err(x, frozen, cfg):
    lin, err, freeze, linf = _ndt_objective_for(sp, sm, tp, tm, cfg, with_freeze=True)
    e, H, b, aux = linf(x, frozen)
    return err(x, aux)


@partial(jax.jit, static_argnames=("cfg",))
def build_map(cfg):
    return _ndt_voxelmap(tp, tm, cfg.resolution, grid_dims=cfg.grid_dims)


frozen = p2d_freeze(guess, cfg_p2d)
timeit("p2d build target map", lambda: build_map(cfg_p2d))
timeit("p2d freeze (lookup+gather)", lambda: p2d_freeze(guess, cfg_p2d))
timeit("p2d linearize_frozen (incl inv_sym)", lambda: p2d_lin_frozen(guess, frozen, cfg_p2d))
timeit("p2d linearize_frozen+error", lambda: p2d_err(guess, frozen, cfg_p2d))

# d2d stage pieces
@partial(jax.jit, static_argnames=("cfg",))
def d2d_freeze(x, cfg):
    lin, err, freeze, linf = _ndt_objective_for(sp, sm, tp, tm, cfg, with_freeze=True)
    return freeze(x)


@partial(jax.jit, static_argnames=("cfg",))
def d2d_lin_frozen(x, frozen, cfg):
    lin, err, freeze, linf = _ndt_objective_for(sp, sm, tp, tm, cfg, with_freeze=True)
    e, H, b, aux = linf(x, frozen)
    return e, H, b


frozen_d = d2d_freeze(guess, cfg_d2d)
timeit("d2d freeze (lookup+gather)", lambda: d2d_freeze(guess, cfg_d2d))
timeit("d2d linearize_frozen", lambda: d2d_lin_frozen(guess, frozen_d, cfg_d2d))
