"""KITTI-style scan-to-scan odometry driver.

Equivalent of the reference's gicp_kitti app / kitti.py script
(src/kitti.cpp:71-156, src/kitti.py:9-55): per frame, downsample ->
set_input_source -> align -> swap_source_and_target (reusing the source's
covariances as the next target's) -> chain poses[i] = poses[i-1] @ dT.
Works with any Registration subclass.
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, List, Optional

import numpy as np

from ..models.base import Registration
from .downsample import voxel_downsample
from .io import load_kitti_bin


def run_odometry(
    scans: Iterable[np.ndarray],
    reg: Registration,
    downsample_resolution: float = 0.25,
    progress: Optional[Callable[[int, np.ndarray, float], None]] = None,
) -> List[np.ndarray]:
    """Run scan-to-scan odometry over an iterable of (N, 3) scans.

    Returns the list of absolute 4x4 poses (pose[0] = I).  `progress(i,
    pose, fps)` is called per frame with a 30-frame sliding-window FPS like
    kitti.cpp:112-132.
    """
    poses: List[np.ndarray] = []
    stamps: List[float] = []
    for i, raw in enumerate(scans):
        pts = voxel_downsample(raw, downsample_resolution)
        if i == 0:
            reg.set_input_target(pts)
            poses.append(np.eye(4))
            continue
        reg.set_input_source(pts)
        delta = reg.align()
        reg.swap_source_and_target()
        poses.append(poses[-1] @ delta)

        stamps.append(time.perf_counter())
        if progress is not None:
            window = stamps[-30:]
            fps = (len(window) - 1) / max(window[-1] - window[0], 1e-9)
            progress(i, poses[-1], fps)
    return poses


def kitti_scan_paths(directory: str, limit: Optional[int] = None):
    """Sorted %06d.bin scan paths under a KITTI velodyne directory."""
    import glob
    import os

    paths = sorted(glob.glob(os.path.join(directory, "*.bin")))
    return paths[:limit]


def run_kitti_odometry(
    directory: str,
    reg: Registration,
    downsample_resolution: float = 0.25,
    limit: Optional[int] = None,
    progress=None,
) -> List[np.ndarray]:
    scans = (load_kitti_bin(p) for p in kitti_scan_paths(directory, limit))
    return run_odometry(scans, reg, downsample_resolution, progress)


def save_poses_kitti(path: str, poses: List[np.ndarray]) -> None:
    """Write poses as 3x4 row-major lines (kitti.cpp:141-153 format)."""
    with open(path, "w") as f:
        for T in poses:
            f.write(" ".join(f"{v:.9g}" for v in np.asarray(T)[:3].ravel()))
            f.write("\n")


def ate_rmse(gt_poses: List[np.ndarray], est_poses: List[np.ndarray]) -> float:
    """Absolute trajectory error (RMSE of translation) after Umeyama-free
    direct comparison (both trajectories start at I)."""
    gt = np.asarray([T[:3, 3] for T in gt_poses])
    est = np.asarray([T[:3, 3] for T in est_poses])
    n = min(len(gt), len(est))
    return float(np.sqrt(np.mean(np.sum((gt[:n] - est[:n]) ** 2, axis=1))))
