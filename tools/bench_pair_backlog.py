"""Pair-backlog benchmark: where batched (vmapped) alignment wins.

The flagship odometry modes beat `batched` on serial drives (warm starts
+ no lockstep LM). The regime batched is FOR: a backlog of INDEPENDENT
small-cloud pairs (multi-session relocalization candidates, loop-closure
verification queues, map-merge hypothesis checks) where no warm start
exists and each pair underfills the chip. This bench pits
`vgicp_align_batch` (one vmapped program, B-fold arithmetic intensity)
against the strongest sequential alternative — the same pairs rolled
through a device-side `lax.scan` (zero dispatch overhead, work-efficient
LM) — at small padding buckets.

Writes BENCH_BACKLOG.json rows {bucket, B, scan_ms_per_pair,
batch_ms_per_pair, speedup}.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fast_gicp_tpu import se3
from fast_gicp_tpu.models.batch import vgicp_align_batch
from fast_gicp_tpu.models.vgicp import VGICPConfig, vgicp_align
from fast_gicp_tpu.ops.covariance import adaptive_radius_covariance_cols
from fast_gicp_tpu.ops import soa
from fast_gicp_tpu.utils.synthetic import drive_scans
from fast_gicp_tpu.utils.downsample import voxel_downsample
from fast_gicp_tpu.ops.voxelmap import auto_grid_dims_multi


def make_backlog(rng, n_pairs, bucket, downsample):
    """Independent pairs: consecutive-frame clouds from a synthetic drive,
    cropped/padded to one bucket, with random SE(3) jitters so nothing is
    loop-invariant."""
    scans, _gt = drive_scans(rng, n_frames=n_pairs + 1)
    clouds = [voxel_downsample(s, downsample) for s in scans]
    dims = auto_grid_dims_multi(clouds, 1.0)
    S = np.zeros((n_pairs, bucket, 3), np.float32)
    T = np.zeros((n_pairs, bucket, 3), np.float32)
    SM = np.zeros((n_pairs, bucket), bool)
    TM = np.zeros((n_pairs, bucket), bool)
    for i in range(n_pairs):
        a, b = clouds[i + 1][:bucket], clouds[i][:bucket]
        S[i, : len(a)] = a
        T[i, : len(b)] = b
        SM[i, : len(a)] = True
        TM[i, : len(b)] = True
    g = np.tile(np.eye(4, dtype=np.float32), (n_pairs, 1, 1))
    return (jnp.asarray(S), jnp.asarray(SM), jnp.asarray(T),
            jnp.asarray(TM), jnp.asarray(g), dims)


def covs_for(p, m):
    return adaptive_radius_covariance_cols(p, m, 20)


def main():
    rng = np.random.default_rng(17)
    out = {"rows": []}
    for bucket, downsample, B in ((2048, 0.9, 64), (4096, 0.5, 32)):
        S, SM, T, TM, G, dims = make_backlog(rng, B, bucket, downsample)
        cfg = VGICPConfig(grid_dims=dims)
        print(f"bucket={bucket} B={B} grid={dims}", flush=True)

        @jax.jit
        def run_scan(S, SM, T, TM, G):
            def step(carry, args):
                sp, sm, tp, tm, g = args
                r = vgicp_align(sp, sm, covs_for(sp, sm),
                                tp, tm, covs_for(tp, tm), g, cfg)
                return carry, r.transformation
            return jax.lax.scan(step, 0, (S, SM, T, TM, G))[1]

        @jax.jit
        def run_batch(S, SM, T, TM, G):
            sc = jax.vmap(covs_for)(S, SM)
            tc = jax.vmap(covs_for)(T, TM)
            return vgicp_align_batch(S, SM, sc, T, TM, tc, G, cfg).transformation

        def timeit(name, fn, k=8):
            r = fn(S, SM, T, TM, G); np.asarray(r)
            t0 = time.perf_counter()
            for _ in range(k):
                r = fn(S, SM, T, TM, G)
            np.asarray(r)
            dt = (time.perf_counter() - t0) / k / B * 1e3
            print(f"  {name:24s} {dt:8.3f} ms/pair", flush=True)
            return dt, np.asarray(r)

        t_scan, p_scan = timeit("sequential lax.scan", run_scan)
        t_batch, p_batch = timeit("vmapped batch", run_batch)
        # same poses from both paths (sanity)
        dd = np.abs(p_scan - p_batch).max()
        print(f"  pose agreement max|d|={dd:.2e}")
        out["rows"].append({
            "bucket": bucket, "pairs": B,
            "scan_ms_per_pair": round(t_scan, 3),
            "batch_ms_per_pair": round(t_batch, 3),
            "speedup": round(t_scan / t_batch, 2),
        })
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "BENCH_BACKLOG.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
