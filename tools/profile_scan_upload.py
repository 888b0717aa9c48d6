"""Wall-clock stage breakdown of run_odometry_scan (dev tool, real TPU).

The scan mode's 512-frame wall clock is host prep + tunnel upload +
one device scan program + one drain.  This times each stage alone so
optimization work lands where the milliseconds are.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import time

import numpy as np


def t(name, fn):
    t0 = time.perf_counter()
    r = fn()
    dt = time.perf_counter() - t0
    print(f"{name:42s} {dt*1e3:9.1f} ms")
    return r


def main(n_frames=256, downsample=0.25):
    import jax
    import jax.numpy as jnp

    from fast_gicp_tpu.models.vgicp import VGICPConfig
    from fast_gicp_tpu.ops.voxelmap import auto_grid_dims_multi
    from fast_gicp_tpu.utils.downsample import voxel_downsample
    from fast_gicp_tpu.utils.kitti import (
        _get_odometry_scan_ragged,
    )
    from fast_gicp_tpu.utils.padding import bucket_size
    from fast_gicp_tpu.utils.synthetic import drive_scans

    rng = np.random.default_rng(11)
    scans, gt = drive_scans(rng, n_frames=n_frames)
    print(f"frames={n_frames} device={jax.devices()[0]}")

    clouds = t("downsample (excluded from bench)", lambda: [
        voxel_downsample(s, downsample) for s in scans])
    scans = None

    cfg = VGICPConfig()
    cfg = cfg._replace(grid_dims=auto_grid_dims_multi(clouds, cfg.resolution))

    bucket = max(bucket_size(len(c)) for c in clouds)
    counts = np.asarray([len(c) for c in clouds], np.int32)
    starts = np.concatenate(
        [np.zeros(1, np.int64), np.cumsum(counts.astype(np.int64))[:-1]]
    ).astype(np.int32)

    flat = t("concat", lambda: np.concatenate(
        [np.ascontiguousarray(c[:, :3], np.float32) for c in clouds]))
    s_pad = bucket_size(flat.shape[0] + bucket)
    flat = t("tail pad", lambda: np.concatenate(
        [flat, np.zeros((s_pad - flat.shape[0], 3), np.float32)]))
    print(f"flat: {flat.shape} = {flat.nbytes/1e6:.1f} MB f32, bucket={bucket}")

    amax = t("absmax (legacy numpy)", lambda: float(np.max(np.abs(flat))) or 1.0)
    scale = amax / 32000.0
    q = t("quantize (legacy rint+astype)", lambda: np.rint(
        flat * (1.0 / scale)).astype(np.int16))
    print(f"int16 payload: {q.nbytes/1e6:.1f} MB")

    # current run_odometry_scan staging path: per-cloud native absmax +
    # native quantize straight into the shared int16 buffer (no f32
    # concatenation at all) — see utils/kitti.py run_odometry_scan.
    from fast_gicp_tpu import native

    print(f"native quantizer available: {native.quantize_available()}")
    amax2 = t("absmax (native, per cloud)", lambda: max(
        (native.absmax(c[:, :3]) for c in clouds), default=0.0) or 1.0)
    stage = np.zeros((s_pad, 3), np.int16)

    def native_stage():
        inv = 32000.0 / amax2
        for c, lo in zip(clouds, starts):
            src = np.ascontiguousarray(c[:, :3], np.float32)
            native.quantize_i16(src, inv, stage[lo:lo + len(c)])
        return stage
    q2 = t("quantize (native, into staging buf)", native_stage)
    assert np.array_equal(q2[: len(clouds[0])],
                          q[: len(clouds[0])]), "staging paths disagree"

    # upload alone: force with a tiny reduction (device_get of a scalar)
    def upload():
        d = jnp.asarray(q)
        jax.device_get(d[0, 0])
        return d
    qd = t("upload int16 + force", upload)
    sd = jnp.asarray(starts); cd = jnp.asarray(counts)

    scan_fn = _get_odometry_scan_ragged()
    sc = jnp.asarray(scale, jnp.float32)

    def compile_and_run():
        return jax.device_get(scan_fn(qd, sd, cd, cfg, True, sc, bucket))
    t("compile + first run", compile_and_run)

    def device_only():
        return jax.device_get(scan_fn(qd, sd, cd, cfg, True, sc, bucket))
    t("device scan (warm, data resident)", device_only)

    # end-to-end warm wall clock, matching bench protocol
    from fast_gicp_tpu.utils.kitti import run_odometry_scan
    t("run_odometry_scan end-to-end (warm)", lambda: run_odometry_scan(
        clouds, -1.0, config=cfg))
    t("run_odometry_scan end-to-end (warm 2)", lambda: run_odometry_scan(
        clouds, -1.0, config=cfg))


if __name__ == "__main__":
    main()
