#!/usr/bin/env python3
"""Real-KITTI ATE/RPE comparison harness.

Given any user-provided KITTI-layout sequence (velodyne %06d.bin scans)
and ground-truth poses, runs the reference's exact odometry protocol
(downsample 0.25 m, scan-to-scan registration, covariance reuse via
swap_source_and_target, pose chaining — /root/reference/src/kitti.py:28-55,
src/kitti.cpp:115-128) and reports ATE / aligned-ATE / RPE against ground
truth — and optionally against a second engine configuration, so a real
sequence can pin "TPU engine matches reference protocol" the day data is
on disk (no KITTI sequence ships in this environment).

Modes:
  serial  reference protocol: class-API scan-to-scan with swap reuse
  scan    device-resident lax.scan pipeline (same estimator, one dispatch)
  map     persistent scan-to-map odometry (beyond-reference; lowest drift)

Usage:
  # engine vs ground truth (reference protocol):
  python tools/kitti_ate.py $KITTI/sequences/00/velodyne \
      --gt $KITTI/poses/00.txt

  # engine A vs engine B (e.g. device pipeline vs reference protocol):
  python tools/kitti_ate.py $KITTI/sequences/00/velodyne \
      --gt $KITTI/poses/00.txt --mode scan --compare serial

  # evaluate an existing trajectory file (e.g. the reference's
  # /tmp/traj.txt) without running any engine:
  python tools/kitti_ate.py --est /tmp/traj.txt --gt $KITTI/poses/00.txt
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_engine(scans, mode: str, method: str, downsample: float,
               resolution: float):
    """Run one engine configuration over in-memory scans -> list of 4x4."""
    from fast_gicp_tpu.models.vgicp import FastVGICP, VGICPConfig
    from fast_gicp_tpu.utils.kitti import run_odometry, run_odometry_scan

    if mode == "serial":
        if method == "gicp":
            # kitti.cpp:86-92: FastGICP with max correspondence dist 1.0
            from fast_gicp_tpu.models.gicp import FastGICP

            reg = FastGICP()
            reg.set_max_correspondence_distance(1.0)
        else:
            reg = FastVGICP(resolution=resolution)
        return run_odometry(scans, reg, downsample)
    if mode == "scan":
        from fast_gicp_tpu.ops.voxelmap import auto_grid_dims_multi

        dims = auto_grid_dims_multi(scans, resolution)
        config = VGICPConfig(resolution=resolution, grid_dims=dims)
        return run_odometry_scan(scans, downsample, config=config)
    if mode == "map":
        from fast_gicp_tpu.models.scan_to_map import (
            ScanToMapConfig, ScanToMapOdometry,
        )
        from fast_gicp_tpu.utils.downsample import voxel_downsample

        odo = ScanToMapOdometry(ScanToMapConfig(resolution=resolution))
        clouds = [voxel_downsample(s, downsample) for s in scans]
        for lo in range(0, len(clouds), 32):
            odo.process_chunk(clouds[lo:lo + 32])
        return odo.poses
    raise ValueError(f"unknown mode {mode!r}")


def print_report(title: str, rep: dict) -> None:
    print(f"\n== {title} ==")
    print(f"  frames            {rep['frames']}")
    print(f"  path length       {rep['path_length_m']:.1f} m")
    print(f"  ATE RMSE          {rep['ate_rmse_m']:.4f} m (direct; both "
          f"trajectories start at I)")
    print(f"  ATE RMSE aligned  {rep['ate_rmse_aligned_m']:.4f} m "
          f"(best rigid alignment)")
    print(f"  RPE (1 frame)     {rep['rpe1_trans_m']:.4f} m / "
          f"{rep['rpe1_rot_deg']:.4f} deg")
    print(f"  RPE ({rep['rpe10_delta_frames']} frames)  "
          f"{rep['rpe10_trans_m']:.4f} m / {rep['rpe10_rot_deg']:.4f} deg")
    print(f"  end-point error   {rep['end_error_m']:.4f} m")


def main(argv=None):
    parser = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    parser.add_argument("data_dir", nargs="?",
                        help="KITTI velodyne directory of %%06d.bin scans")
    parser.add_argument("--gt", required=True,
                        help="ground-truth poses (KITTI 3x4 row-major)")
    parser.add_argument("--est", default=None,
                        help="evaluate this trajectory file instead of "
                             "running an engine")
    parser.add_argument("--mode", default="serial",
                        choices=("serial", "scan", "map"))
    parser.add_argument("--method", default="vgicp",
                        choices=("vgicp", "gicp"),
                        help="serial-mode estimator (kitti.cpp uses GICP "
                             "with corr dist 1.0; kitti.py uses the "
                             "pygicp default)")
    parser.add_argument("--compare", default=None,
                        choices=("serial", "scan", "map"),
                        help="also run this second engine mode and report "
                             "A-vs-B trajectory deltas")
    parser.add_argument("--downsample", type=float, default=0.25,
                        help="reference protocol resolution "
                             "(kitti.cpp:81, kitti.py:35)")
    parser.add_argument("--resolution", type=float, default=1.0)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--out", default=None,
                        help="write the engine trajectory here (3x4 rows)")
    parser.add_argument("--json", default=None,
                        help="write the metric report as JSON")
    args = parser.parse_args(argv)

    from fast_gicp_tpu.utils.kitti import (
        kitti_scan_paths, load_poses_kitti, save_poses_kitti,
        trajectory_report,
    )

    gt = load_poses_kitti(args.gt)
    payload = {"gt": args.gt, "downsample": args.downsample}

    if args.est:
        est = load_poses_kitti(args.est)
        rep = trajectory_report(gt, est)
        print_report(f"{args.est} vs ground truth", rep)
        payload["est_vs_gt"] = rep
    else:
        if not args.data_dir:
            parser.error("either a data_dir or --est is required")
        from fast_gicp_tpu.utils.io import load_kitti_bin

        paths = kitti_scan_paths(args.data_dir, args.limit)
        if len(paths) < 2:
            print(f"no scans under {args.data_dir}", file=sys.stderr)
            return 1
        print(f"{len(paths)} scans", flush=True)
        scans = [load_kitti_bin(p) for p in paths]

        t0 = time.perf_counter()
        est = run_engine(scans, args.mode, args.method, args.downsample,
                         args.resolution)
        dt = time.perf_counter() - t0
        print(f"{args.mode}: {len(est)} poses in {dt:.1f}s "
              f"({len(est) / dt:.1f} FPS incl. host prep)")
        rep = trajectory_report(gt, est)
        print_report(f"{args.mode} vs ground truth", rep)
        payload.update({"mode": args.mode, "fps": len(est) / dt,
                        "est_vs_gt": rep})
        if args.out:
            save_poses_kitti(args.out, est)
            print(f"trajectory written to {args.out}")

        if args.compare:
            t0 = time.perf_counter()
            est_b = run_engine(scans, args.compare, args.method,
                               args.downsample, args.resolution)
            dt_b = time.perf_counter() - t0
            rep_b = trajectory_report(gt, est_b)
            print_report(f"{args.compare} vs ground truth", rep_b)
            rep_ab = trajectory_report(est, est_b)
            print_report(f"{args.compare} vs {args.mode} (A-B delta)", rep_ab)
            payload.update({
                "compare_mode": args.compare,
                "compare_fps": len(est_b) / dt_b,
                "compare_vs_gt": rep_b,
                "compare_vs_mode": rep_ab,
            })

    if args.json:
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
        print(f"report written to {args.json}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
