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
