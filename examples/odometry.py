#!/usr/bin/env python3
"""Odometry modes on a synthetic trajectory: scan-to-scan stream vs the
persistent scan-to-map (with tracking gate)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import numpy as np

from odometry_bench import _trajectory_scans
from fast_gicp_tpu.models.scan_to_map import ScanToMapConfig, ScanToMapOdometry
from fast_gicp_tpu.models.vgicp import VGICPConfig
from fast_gicp_tpu.ops.voxelmap import auto_grid_dims
from fast_gicp_tpu.utils.downsample import voxel_downsample
from fast_gicp_tpu.utils.kitti import ate_rmse, run_odometry_stream


def main():
    rng = np.random.default_rng(7)
    scans, gt = _trajectory_scans(rng, n_frames=15)

    dims = auto_grid_dims(voxel_downsample(scans[0], 0.25), 1.0)
    poses = run_odometry_stream(
        scans, 0.25, config=VGICPConfig(resolution=1.0, grid_dims=dims)
    )
    print(f"scan-to-scan stream: ATE {ate_rmse(gt, poses):.3f} m")

    odo = ScanToMapOdometry(
        ScanToMapConfig(
            resolution=1.0, gate_translation=0.5, gate_rotation=0.2
        )
    )
    for scan in scans:
        odo.process_async(voxel_downsample(scan, 0.25))
    print(f"scan-to-map:         ATE {ate_rmse(gt, odo.poses):.3f} m")


if __name__ == "__main__":
    main()
