"""Per-frame breakdown of the scan-mode odometry hot loop on TPU (dev tool).

Times the full `run_odometry_scan` program per frame, plus each stage of
the per-frame graph in isolation (covariance / map build / solve pieces)
to direct optimization work.  Methodology per bench.py: enqueue K, force
only the last result.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import time

import jax
import jax.numpy as jnp
import numpy as np

from fast_gicp_tpu.models.vgicp import VGICPConfig, make_vgicp_objective
from fast_gicp_tpu.ops.covariance import rbf_covariances_jit
from fast_gicp_tpu.ops.voxelmap import auto_grid_dims, build_voxelmap, neighbor_offsets
from fast_gicp_tpu.precision import f32_matmuls
from fast_gicp_tpu.solver import LsqConfig, lsq_solve
from fast_gicp_tpu.utils.downsample import voxel_downsample
from fast_gicp_tpu.utils.padding import bucket_size, pad_points
from odometry_bench import _trajectory_scans

F = 33  # frames (32 pairs)


def timeit(name, fn, k=50):
    r = fn()
    _ = jax.device_get(jax.tree_util.tree_leaves(r)[0])
    t0 = time.perf_counter()
    for _ in range(k):
        r = fn()
    _ = jax.device_get(jax.tree_util.tree_leaves(r)[0])
    dt = (time.perf_counter() - t0) / k * 1e3
    print(f"{name:46s} {dt:8.3f} ms")
    return r


def main():
    rng = np.random.default_rng(7)
    scans, gt = _trajectory_scans(rng, n_frames=F)
    clouds = [voxel_downsample(s, 0.25) for s in scans]
    print("cloud sizes:", [len(c) for c in clouds[:4]], "...")
    bucket = max(bucket_size(len(c)) for c in clouds)
    padded = [pad_points(c, bucket) for c in clouds]
    pts = jnp.asarray(np.stack([p for p, _ in padded]))
    msk = jnp.asarray(np.stack([m for _, m in padded]))
    print("bucket:", bucket, "frames:", F, "device:", jax.devices()[0])

    dims = auto_grid_dims(np.concatenate(clouds[:3]), 1.0)
    config = VGICPConfig(resolution=1.0, grid_dims=dims)
    print("grid dims:", dims)

    # --- whole-sequence scan mode
    from fast_gicp_tpu.utils.kitti import _get_odometry_scan

    scan_fn = _get_odometry_scan()

    def whole():
        return scan_fn(pts, msk, config, True)

    r = whole()
    _ = jax.device_get(r)
    t0 = time.perf_counter()
    K = 10
    for _ in range(K):
        r = whole()
    _ = jax.device_get(r)
    dt = (time.perf_counter() - t0) / K / (F - 1) * 1e3
    print(f"{'run_odometry_scan per frame':46s} {dt:8.3f} ms  "
          f"({1000.0 / dt:.0f} fps)")

    # --- stages at this bucket
    p0, m0 = pts[0], msk[0]
    p1, m1 = pts[1], msk[1]
    c0 = timeit("rbf_covariances", lambda: rbf_covariances_jit(p0, m0))
    c1 = rbf_covariances_jit(p1, m1)

    build_jit = jax.jit(lambda p, m, c: build_voxelmap(
        p, m, 1.0, covs=c, grid_dims=dims))
    vm = timeit("build_voxelmap (grid)", lambda: build_jit(p0, m0, c0))

    offsets = jnp.asarray(neighbor_offsets("direct1", 1.5))

    @jax.jit
    @f32_matmuls
    def solve_only(sp, sm, sc, tp, tm, tc):
        vm = build_voxelmap(tp, tm, 1.0, covs=tc, grid_dims=dims)
        lin, err = make_vgicp_objective(sp, sm, sc, vm, offsets, config)
        return lsq_solve(lin, err, jnp.eye(4, dtype=jnp.float32), config.lsq)

    res = timeit("build + LM solve", lambda: solve_only(p1, m1, c1, p0, m0, c0))
    print("   iters:", int(res.iterations))

    @jax.jit
    @f32_matmuls
    def lin_once(sp, sm, sc, tp, tm, tc, x):
        vmc = build_voxelmap(tp, tm, 1.0, covs=tc, grid_dims=dims)
        lin, err = make_vgicp_objective(sp, sm, sc, vmc, offsets, config)
        return lin(x)[0]

    x0 = jnp.eye(4, dtype=jnp.float32)
    timeit("build + 1 linearize", lambda: lin_once(p1, m1, c1, p0, m0, c0, x0))

    # LM driver overhead with a trivial objective
    Hc = jnp.eye(6, dtype=jnp.float32)
    bc = jnp.zeros(6, jnp.float32)

    @jax.jit
    def trivial_solve(x):
        lin = lambda xx: (jnp.float32(1.0), Hc, bc, ())
        err = lambda xx, aux: jnp.float32(1.0)
        return lsq_solve(lin, err, x, LsqConfig(max_iterations=6))

    timeit("LM driver alone (6 outer, trivial obj)", lambda: trivial_solve(x0))


if __name__ == "__main__":
    main()
