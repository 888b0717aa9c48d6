"""App-layer smoke: drive apps/kitti.py through its CLI entry point.

The apps are the reference's gicp_kitti / kitti.py equivalents
(src/kitti.cpp:71-156) and sit above every driver; they are exercised
nowhere else in the suite (a stale import or argparse wiring breaks users,
not tests). One tiny synthetic sequence, two contrasting modes."""

import runpy

import numpy as np
import pytest

from fast_gicp_tpu.utils.kitti import ate_rmse

from tests.test_odometry import _trajectory_scans


@pytest.fixture(scope="module")
def kitti_dir(tmp_path_factory):
    """Three synthetic frames in KITTI velodyne .bin layout (x,y,z,i)."""
    d = tmp_path_factory.mktemp("velodyne")
    scans, gt = _trajectory_scans(np.random.default_rng(21), n_frames=3)
    for i, s in enumerate(scans):
        rec = np.concatenate([s, np.zeros((len(s), 1), np.float32)], axis=1)
        rec.astype(np.float32).tofile(d / f"{i:06d}.bin")
    return d, gt


@pytest.mark.parametrize("mode", ["stream", "map"])
def test_kitti_app_modes(kitti_dir, tmp_path, mode):
    d, gt = kitti_dir
    out = tmp_path / f"traj_{mode}.txt"
    app = runpy.run_path("apps/kitti.py")
    app["main"]([str(d), "--mode", mode, "--downsample", "0.3",
                 "--out", str(out)])
    rows = np.loadtxt(out).reshape(-1, 3, 4)
    assert len(rows) == 3
    poses = [np.vstack([r, [0, 0, 0, 1]]) for r in rows]
    assert ate_rmse(gt, poses) < 0.05


@pytest.fixture(scope="module")
def kitti_drive_20(tmp_path_factory):
    """20-frame synthetic drive in KITTI velodyne .bin layout — the
    VERDICT-prescribed end-to-end fixture (float32 x,y,z,intensity rows,
    kitti.cpp:40-64)."""
    d = tmp_path_factory.mktemp("velodyne20")
    scans, gt = _trajectory_scans(np.random.default_rng(7), n_frames=20)
    for i, s in enumerate(scans):
        rec = np.concatenate([s, np.zeros((len(s), 1), np.float32)], axis=1)
        rec.astype(np.float32).tofile(d / f"{i:06d}.bin")
    return d, gt


@pytest.mark.parametrize("mode", ["scan", "map"])
def test_kitti_app_20frame_drive_soak(kitti_drive_20, tmp_path, mode):
    """The exact user-facing CLI path on a 20-frame drive: .bin parsing,
    scan-to-scan (covariance-reuse swap protocol, kitti.cpp:115-128) and
    persistent-map odometry, 3x4 row-major trajectory output
    (kitti.cpp:141-153), sub-voxel ATE against the generator's ground
    truth."""
    d, gt = kitti_drive_20
    out = tmp_path / f"traj20_{mode}.txt"
    app = runpy.run_path("apps/kitti.py")
    app["main"]([str(d), "--mode", mode, "--downsample", "0.3",
                 "--out", str(out)])
    rows = np.loadtxt(out).reshape(-1, 3, 4)
    assert len(rows) == 20
    poses = [np.vstack([r, [0, 0, 0, 1]]) for r in rows]
    # sub-voxel: well under the 0.3 m downsample leaf over a 20-frame chain
    assert ate_rmse(gt, poses) < 0.1
