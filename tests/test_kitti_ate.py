"""KITTI ATE harness: metric math against known-perturbation goldens and
the end-to-end CLI on the synthetic 20-frame drive (VERDICT round-3 item 5
— real sequences don't ship here, so the harness itself is pinned)."""

import runpy

import numpy as np
import pytest

from fast_gicp_tpu.utils.kitti import (
    ate_rmse,
    ate_rmse_aligned,
    load_poses_kitti,
    rpe,
    save_poses_kitti,
    trajectory_report,
)

from tests.test_odometry import _trajectory_scans


def _circle_poses(n=40, radius=20.0):
    poses = []
    for i in range(n):
        th = 2 * np.pi * i / n
        c, s = np.cos(th), np.sin(th)
        T = np.eye(4)
        T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        T[:3, 3] = [radius * np.cos(th), radius * np.sin(th), 0.1 * i]
        poses.append(T)
    return poses


def test_ate_known_perturbation_golden():
    gt = _circle_poses()
    rng = np.random.default_rng(3)
    offsets = rng.normal(size=(len(gt), 3)) * 0.2
    est = []
    for T, d in zip(gt, offsets):
        E = T.copy()
        E[:3, 3] = T[:3, 3] + d
        est.append(E)
    expect = float(np.sqrt(np.mean(np.sum(offsets**2, axis=1))))
    assert ate_rmse(gt, est) == pytest.approx(expect, rel=1e-9)


def test_aligned_ate_invariant_to_rigid_offset():
    gt = _circle_poses()
    # a global rigid offset between the frames: direct ATE blows up,
    # aligned ATE must stay ~0
    R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], float)
    t = np.array([5.0, -3.0, 1.0])
    est = []
    for T in gt:
        E = T.copy()
        E[:3, 3] = R @ T[:3, 3] + t
        est.append(E)
    assert ate_rmse(gt, est) > 5.0
    assert ate_rmse_aligned(gt, est) == pytest.approx(0.0, abs=1e-9)


def test_rpe_known_step_error_golden():
    gt = _circle_poses()
    # inject a constant drift D into every estimated step:
    # est_{i+1} = est_i @ (gt_i^-1 gt_{i+1}) @ D, so the per-step error
    # e = dg^-1 de is exactly D (RPE trans = |d|, RPE rot = 0)
    d = np.array([0.03, -0.04, 0.12])  # |d| = 0.13
    D = np.eye(4)
    D[:3, 3] = d
    est = [gt[0]]
    for i in range(len(gt) - 1):
        dg = np.linalg.inv(gt[i]) @ gt[i + 1]
        est.append(est[-1] @ dg @ D)
    rpe_t, rpe_r = rpe(gt, est, 1)
    assert rpe_t == pytest.approx(0.13, rel=1e-9)
    assert rpe_r == pytest.approx(0.0, abs=1e-6)  # arccos numerics

    # pure-translation ground truth: everything commutes, so the 10-step
    # drift compounds to exactly 10 |d|
    line = []
    for i in range(30):
        T = np.eye(4)
        T[:3, 3] = [1.0 * i, 0.0, 0.0]
        line.append(T)
    est = [line[0]]
    for i in range(len(line) - 1):
        dg = np.linalg.inv(line[i]) @ line[i + 1]
        est.append(est[-1] @ dg @ D)
    rpe10_t, _ = rpe(line, est, 10)
    assert rpe10_t == pytest.approx(1.3, rel=1e-9)


def test_pose_io_roundtrip(tmp_path):
    gt = _circle_poses(7)
    p = tmp_path / "poses.txt"
    save_poses_kitti(str(p), gt)
    back = load_poses_kitti(str(p))
    assert len(back) == 7
    np.testing.assert_allclose(np.asarray(back), np.asarray(gt), atol=1e-6)


@pytest.fixture(scope="module")
def kitti_drive(tmp_path_factory):
    d = tmp_path_factory.mktemp("velodyne_ate")
    scans, gt = _trajectory_scans(np.random.default_rng(5), n_frames=20)
    for i, s in enumerate(scans):
        rec = np.concatenate([s, np.zeros((len(s), 1), np.float32)], axis=1)
        rec.astype(np.float32).tofile(d / f"{i:06d}.bin")
    return d, gt


def test_kitti_ate_harness_end_to_end(kitti_drive, tmp_path):
    """The full CLI on a synthetic drive: engine run + metrics + JSON,
    sub-voxel ATE against the generator's ground truth."""
    import json

    d, gt = kitti_drive
    gt_file = tmp_path / "gt.txt"
    save_poses_kitti(str(gt_file), gt)
    out_json = tmp_path / "report.json"
    tool = runpy.run_path("tools/kitti_ate.py")
    rc = tool["main"]([
        str(d), "--gt", str(gt_file), "--mode", "scan",
        "--downsample", "0.3", "--json", str(out_json),
        "--out", str(tmp_path / "traj.txt"),
    ])
    assert rc == 0
    rep = json.loads(out_json.read_text())["est_vs_gt"]
    assert rep["frames"] == 20
    assert rep["ate_rmse_m"] < 0.1
    assert rep["rpe1_trans_m"] < 0.05
    # trajectory file written in loadable KITTI format
    est = load_poses_kitti(str(tmp_path / "traj.txt"))
    assert trajectory_report(gt, est)["ate_rmse_m"] < 0.1


def test_kitti_ate_harness_est_only(kitti_drive, tmp_path):
    """--est evaluation path (e.g. scoring the reference's /tmp/traj.txt)."""
    _d, gt = kitti_drive
    gt_file = tmp_path / "gt.txt"
    est_file = tmp_path / "est.txt"
    save_poses_kitti(str(gt_file), gt)
    save_poses_kitti(str(est_file), gt)  # perfect trajectory
    tool = runpy.run_path("tools/kitti_ate.py")
    rc = tool["main"](["--est", str(est_file), "--gt", str(gt_file)])
    assert rc == 0
