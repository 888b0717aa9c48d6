#!/usr/bin/env python3
"""Map-then-localize: checkpoint a persistent map, resume anywhere.

The reference has no checkpoint/resume at all (SURVEY.md §5) — its target
voxel map lives for one align.  The persistent scan-to-map odometry maps a
drive once, saves the world map, and later sessions localize against it
immediately — single-device or sharded, on any device count (the sharded
checkpoint is mesh-size-independent: shards merge into one .npz and
re-partition by ownership hash on load).  Bounded-memory eviction keeps
unbounded drives from growing the map forever.
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import numpy as np

from odometry_bench import _trajectory_scans
from fast_gicp_tpu.models.scan_to_map import (
    ScanToMapConfig,
    ScanToMapOdometry,
    load_map,
)
from fast_gicp_tpu.utils.downsample import voxel_downsample
from fast_gicp_tpu.utils.kitti import ate_rmse


def main():
    rng = np.random.default_rng(3)
    scans, gt = _trajectory_scans(rng, n_frames=12)
    scans = [voxel_downsample(s, 0.25) for s in scans]
    cfg = ScanToMapConfig(resolution=1.0, capacity=1 << 14)

    # --- session 1: map the first part of the drive, checkpoint ---------
    mapper = ScanToMapOdometry(cfg, covariance="knn")
    for s in scans[:8]:
        mapper.process(s)
    path = os.path.join(tempfile.gettempdir(), "world_map.npz")
    mapper.save(path)
    nv = int(np.asarray(mapper.state.num_voxels))
    print(f"mapped 8 frames -> {nv} voxels, checkpoint at {path}")

    # --- session 2: resume from the checkpoint, keep driving ------------
    # initial_pose seeds the frame-0 alignment guess where session 1 left
    # off; with a non-empty checkpoint the driver aligns (never stamps)
    # the first resumed scan.
    resumed = ScanToMapOdometry(cfg, covariance="knn",
                                initial_map=load_map(path),
                                initial_pose=mapper.poses[-1],
                                initial_velocity=mapper.velocity)
    for s in scans[8:]:
        resumed.process(s)
    # resumed.poses holds only THIS session's frames (8..11) — compare
    # against the matching ground-truth slice
    print(f"resumed session ATE vs ground truth: "
          f"{ate_rmse(gt[8:], resumed.poses):.3f} m")

    # --- localization-only: frozen map, align from frame 0 --------------
    loc = ScanToMapOdometry(cfg._replace(fuse_scans=False),
                            covariance="knn", initial_map=load_map(path))
    for s in scans[:8]:
        loc.process(s)
    print(f"localization mode (frozen map) ATE: "
          f"{ate_rmse(gt[:8], loc.poses):.3f} m, map still "
          f"{int(np.asarray(loc.state.num_voxels))} voxels")

    # --- bounded-memory variant: eviction for unbounded drives ----------
    bounded = ScanToMapOdometry(
        cfg._replace(eviction_radius=40.0, evict_every=4),
        covariance="knn",
    )
    for s in scans:
        bounded.process(s)
    _ = bounded.poses  # sync
    nv_bounded = int(np.asarray(bounded.state.num_voxels))
    print(f"eviction keeps the map bounded: {nv_bounded} voxels "
          f"(radius 40 m of the pose) vs {nv} unbounded")

    # --- sharded checkpoints restore on ANY mesh ------------------------
    from fast_gicp_tpu.parallel.sharded import make_mesh
    from fast_gicp_tpu.parallel.sharded_map import ShardedScanToMapOdometry

    sharded = ShardedScanToMapOdometry(
        cfg, mesh=make_mesh(), covariance="knn",
        initial_map=load_map(path),  # the single-device checkpoint
        initial_pose=mapper.poses[-1],
        initial_velocity=mapper.velocity,
    )
    sharded.process(scans[8])
    print("single-device checkpoint restored onto the device mesh: pose\n",
          np.asarray(sharded.poses[-1]).round(3))

    # --- multi-session stitching: merge two sessions' maps --------------
    # Session B drives frames 7..11 as its OWN fresh run, with its FIRST
    # frame (the overlap frame shared with session 1) anchored at that
    # frame's known pose; merge_maps fuses its map with session 1's
    # checkpoint into one world map (co-located voxels sum their
    # accumulators).
    from fast_gicp_tpu.models.scan_to_map import merge_maps

    session_b = ScanToMapOdometry(cfg, covariance="knn",
                                  initial_pose=mapper.poses[-1],
                                  initial_velocity=mapper.velocity)
    for s in scans[7:]:
        session_b.process(s)
    merged = merge_maps(load_map(path), session_b.state)
    # read the count BEFORE localizing: the fused frame step donates the
    # map state, so `merged`'s buffers belong to loc2 once it processes
    n_merged = int(np.asarray(merged.num_voxels))
    loc2 = ScanToMapOdometry(cfg._replace(fuse_scans=False),
                             covariance="knn", initial_map=merged)
    for s in scans:
        loc2.process(s)
    print(f"stitched map: {n_merged} voxels; "
          f"full-drive localization ATE {ate_rmse(gt, loc2.poses):.3f} m")


if __name__ == "__main__":
    main()
