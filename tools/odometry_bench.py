"""Measure batched odometry throughput on TPU (dev tool)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import time

import numpy as np

import jax.numpy as jnp

from fast_gicp_tpu import se3
from fast_gicp_tpu.models.vgicp import VGICPConfig
from fast_gicp_tpu.utils.kitti import ate_rmse, run_odometry_batched


def _world(rng, n=60000):
    ground = np.stack(
        [rng.uniform(-60, 60, n // 2), rng.uniform(-60, 60, n // 2),
         0.05 * rng.standard_normal(n // 2)], axis=1)
    wall = np.stack(
        [rng.uniform(-60, 60, n // 4), 12.0 + 0.05 * rng.standard_normal(n // 4),
         rng.uniform(0, 5, n // 4)], axis=1)
    pillars = np.stack(
        [np.repeat(rng.uniform(-50, 50, 40), n // 160),
         np.repeat(rng.uniform(-10, 10, 40), n // 160),
         rng.uniform(0, 4, (n // 160) * 40)], axis=1)
    return np.concatenate([ground, wall, pillars]).astype(np.float32)


def _trajectory_scans(rng, n_frames=5):
    world = _world(rng)
    scans, poses = [], []
    T = np.eye(4)
    for _ in range(n_frames):
        poses.append(T.copy())
        R, t = T[:3, :3], T[:3, 3]
        local = (world - t) @ R
        keep = np.linalg.norm(local, axis=1) < 55.0
        sel = keep & (rng.random(len(local)) < 0.7)
        scans.append((local[sel] + 0.01 * rng.standard_normal((sel.sum(), 3))
                      ).astype(np.float32))
        step = np.asarray(se3.se3_exp(jnp.asarray(
            np.float32([0, 0, 0.02, 0.8, 0.05, 0]))))
        T = T @ step
    return scans, poses


def _loop_scans(rng, n_frames=40):
    """Closed-loop trajectory: drive a circle back to the start — the
    scenario where the persistent map pays off (re-anchoring kills the
    drift scan-to-scan accumulates)."""
    import jax.numpy as jnp

    from fast_gicp_tpu import se3

    world = _world(rng)
    scans, poses = [], []
    T = np.eye(4)
    dtheta = 2 * np.pi / n_frames
    step = np.asarray(se3.se3_exp(jnp.asarray(
        np.float32([0, 0, dtheta, 0.9, 0.0, 0]))), np.float64)
    for _ in range(n_frames):
        poses.append(T.copy())
        R, t = T[:3, :3], T[:3, 3]
        local = (world - t) @ R
        keep = np.linalg.norm(local, axis=1) < 55.0
        sel = keep & (rng.random(len(local)) < 0.7)
        scans.append((local[sel] + 0.01 * rng.standard_normal(
            (sel.sum(), 3))).astype(np.float32))
        T = T @ step
    return scans, poses


def loop_comparison():
    """Closed-loop benchmark: scan-to-scan vs persistent scan-to-map.
    Measured on TPU v5e: scan-to-scan ATE 0.064 m / end error 0.080 m;
    scan-to-map ATE 0.016 m / end error 0.019 m (4x better)."""
    from fast_gicp_tpu.models.scan_to_map import (
        ScanToMapConfig, ScanToMapOdometry,
    )
    from fast_gicp_tpu.ops.voxelmap import auto_grid_dims
    from fast_gicp_tpu.utils.downsample import voxel_downsample
    from fast_gicp_tpu.utils.kitti import ate_rmse, run_odometry_stream

    rng = np.random.default_rng(3)
    scans, gt = _loop_scans(rng, 40)
    clouds = [voxel_downsample(s, 0.25) for s in scans]
    dims = auto_grid_dims(clouds[0], 1.0)
    poses_ss = run_odometry_stream(
        scans, 0.25, config=VGICPConfig(resolution=1.0, grid_dims=dims)
    )
    print(f"scan-to-scan: ate={ate_rmse(gt, poses_ss):.3f}")
    odo = ScanToMapOdometry(ScanToMapConfig(
        resolution=1.0, capacity=1 << 17,
        gate_translation=0.5, gate_rotation=0.2,
    ))
    for c in clouds:
        odo.process_async(c)
    print(f"scan-to-map:  ate={ate_rmse(gt, odo.poses):.3f}")


def main():
    rng = np.random.default_rng(7)
    scans, gt = _trajectory_scans(rng, n_frames=33)
    print("scan sizes:", [len(s) for s in scans[:3]])
    cfg = VGICPConfig(resolution=1.0, neighbor_search_method="direct7",
                      grid_dims=(96, 96, 32))
    # warm-up (compile)
    poses = run_odometry_batched(scans, downsample_resolution=0.2,
                                 batch_size=16, config=cfg)
    t0 = time.perf_counter()
    poses = run_odometry_batched(scans, downsample_resolution=0.2,
                                 batch_size=16, config=cfg)
    dt = time.perf_counter() - t0
    n = len(scans) - 1
    print(f"ate={ate_rmse(gt, poses):.4f} frames/s={n / dt:.1f} "
          f"({dt / n * 1e3:.2f} ms/frame)")


if __name__ == "__main__":
    main()
