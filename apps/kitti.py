#!/usr/bin/env python3
"""KITTI odometry app: frame-by-frame VGICP over a velodyne sequence.

Equivalent of the reference's `gicp_kitti` (src/kitti.cpp:71-156) and
kitti.py (src/kitti.py): loads %06d.bin scans, downsamples at 0.25 m, runs
scan-to-scan registration, chains poses, reports FPS, writes the trajectory
in KITTI 3x4 row-major format.

Modes (scan-to-scan `batched` was demoted to a library building block in
round 4 — the device-side lax.scan beats vmapped pair batches even on
independent-pair backlogs; see BENCH_BACKLOG.json):
  --mode serial   reference-style loop with covariance reuse via swap
  --mode stream   device-chained serial: every align enqueued with the
                  previous delta as warm start, one sync at the end (default)
  --mode scan     whole sequence as ONE jitted lax.scan program
  --mode map      persistent scan-to-map odometry (registers against an
                  incrementally fused world voxel map — beyond the
                  reference's scan-to-scan-only pipeline)

Usage: python apps/kitti.py /path/to/sequences/00/velodyne [--limit N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("data_dir", help="directory of KITTI .bin scans")
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--mode",
                        choices=("serial", "stream", "scan", "map"),
                        default="stream")
    parser.add_argument("--downsample", type=float, default=0.25)
    parser.add_argument("--resolution", type=float, default=1.0)
    parser.add_argument("--out", default="/tmp/traj.txt")
    parser.add_argument(
        "--eviction-radius", type=float, default=None, metavar="M",
        help="(--mode map) bound map memory on long drives: every "
        "--evict-every frames drop voxels farther than this many meters "
        "from the current pose (default: keep full history)",
    )
    parser.add_argument("--evict-every", type=int, default=64)
    parser.add_argument("--plot", default=None, metavar="PNG",
                        help="save a top-down trajectory plot (matplotlib), "
                             "like the reference kitti.py viewer")
    args = parser.parse_args(argv)

    from fast_gicp_tpu.models.vgicp import FastVGICP, VGICPConfig
    from fast_gicp_tpu.utils.io import load_kitti_bin
    from fast_gicp_tpu.utils.kitti import (
        kitti_scan_paths,
        run_odometry,
        run_odometry_stream,
        save_poses_kitti,
    )

    paths = kitti_scan_paths(args.data_dir, args.limit)
    if len(paths) < 2:
        print(f"no scans found under {args.data_dir}", file=sys.stderr)
        return 1
    print(f"{len(paths)} scans", flush=True)
    scans = [load_kitti_bin(p) for p in paths]

    t0 = time.perf_counter()
    if args.mode == "serial":
        reg = FastVGICP(resolution=args.resolution)

        def progress(i, pose, fps):
            if i % 30 == 0:
                print(f"frame {i}: fps={fps:.1f}", flush=True)

        poses = run_odometry(scans, reg, args.downsample, progress)
    elif args.mode == "map":
        from fast_gicp_tpu.models.scan_to_map import (
            ScanToMapConfig,
            ScanToMapOdometry,
        )
        from fast_gicp_tpu.utils.downsample import voxel_downsample

        odo = ScanToMapOdometry(
            ScanToMapConfig(
                resolution=args.resolution,
                eviction_radius=args.eviction_radius,
                evict_every=args.evict_every,
            )
        )
        # chunked driver: one device dispatch per 32 frames (host dispatch
        # latency otherwise caps the wall rate; see process_chunk)
        clouds = [voxel_downsample(s, args.downsample) for s in scans]
        for lo in range(0, len(clouds), 32):
            odo.process_chunk(clouds[lo:lo + 32])
        poses = odo.poses  # single synchronization
    elif args.mode == "scan":
        import numpy as np

        from fast_gicp_tpu.ops.voxelmap import auto_grid_dims_multi
        from fast_gicp_tpu.utils.kitti import run_odometry_scan

        dims = auto_grid_dims_multi(scans, args.resolution)
        config = VGICPConfig(resolution=args.resolution, grid_dims=dims)
        poses = run_odometry_scan(scans, args.downsample, config=config)
    elif args.mode == "stream":
        import numpy as np

        from fast_gicp_tpu.ops.voxelmap import auto_grid_dims_multi

        # size the dense grid over the union of every frame's extent
        # (a sequence that opens up later must not get clipped)
        dims = auto_grid_dims_multi(scans, args.resolution)
        config = VGICPConfig(resolution=args.resolution, grid_dims=dims)
        poses = run_odometry_stream(scans, args.downsample, config=config)
    else:  # unreachable: argparse rejects other modes
        raise SystemExit(f"unknown mode {args.mode}")
    dt = time.perf_counter() - t0
    print(f"{len(poses)} poses in {dt:.1f}s = {len(poses) / dt:.1f} FPS "
          f"(incl. I/O and downsampling)", flush=True)
    save_poses_kitti(args.out, poses)
    print(f"trajectory written to {args.out}")
    if args.plot:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            print("matplotlib not available; skipping plot", file=sys.stderr)
            return 0
        import numpy as np
        xy = np.asarray([[T[0, 3], T[1, 3]] for T in poses])
        plt.figure(figsize=(6, 6))
        plt.plot(xy[:, 0], xy[:, 1], lw=1)
        plt.axis("equal"); plt.grid(True, alpha=0.3)
        plt.title(f"trajectory ({len(poses)} frames)")
        plt.savefig(args.plot, dpi=120, bbox_inches="tight")
        print(f"plot written to {args.plot}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
