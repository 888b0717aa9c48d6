"""Raw-scan-scale bench: the hot kernels + full aligns at >=65k points.

Raw velodyne scans are ~120k points (the reference loads them raw and
downsamples, kitti.cpp:40-64).  This pins the Pallas kernels and the
registration graphs at 65 536 and 131 072 padding buckets on real TPU:
the bundled pair is upsampled by point duplication + 2 cm jitter (the
structure of a denser scan of the same scene), pose parity is checked
against ground truth, and per-stage times use the scan-rolled protocol
(one force at the end; see CLAUDE.md).

Writes BENCH_LARGE_N.json at the repo root.

Usage: python tools/bench_large_n.py [--buckets 65536 131072] [--n 10]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np


def upsample_to(points, n_out, rng, jitter=0.02):
    reps = int(np.ceil(n_out / len(points)))
    out = [points]
    for _ in range(reps - 1):
        out.append(
            points
            + rng.normal(scale=jitter, size=points.shape).astype(np.float32)
        )
    return np.concatenate(out)[:n_out].astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", type=int, nargs="*",
                    default=[65536, 131072])
    ap.add_argument("--n", type=int, default=10,
                    help="aligns per timed scan")
    ap.add_argument("--json", default=os.path.join(
        os.path.dirname(__file__), "..", "BENCH_LARGE_N.json"))
    args = ap.parse_args()

    from fast_gicp_tpu import se3
    from fast_gicp_tpu.models.gicp import GICPConfig, gicp_align
    from fast_gicp_tpu.models.vgicp import VGICPConfig, vgicp_register
    from fast_gicp_tpu.ops.covariance import (
        knn_covariance_cols, rbf_covariance_cols,
    )
    from fast_gicp_tpu.ops.neighbors import nn_search
    from fast_gicp_tpu.ops.voxelmap import auto_grid_dims
    from fast_gicp_tpu.utils.downsample import approximate_voxel_downsample
    from fast_gicp_tpu.utils.io import (
        load_pcd, load_relative_txt, strip_near_origin,
    )

    data = "/root/reference/data"
    tgt0 = approximate_voxel_downsample(
        strip_near_origin(load_pcd(f"{data}/251370668.pcd")), 0.1)
    src0 = approximate_voxel_downsample(
        strip_near_origin(load_pcd(f"{data}/251371071.pcd")), 0.1)
    gt = load_relative_txt(f"{data}/relative.txt")
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])

    n_scan = args.n
    twists = 1e-5 * rng.standard_normal((n_scan, 6)).astype(np.float32)
    jitters = jnp.asarray(np.stack(
        [np.asarray(se3.se3_exp(jnp.asarray(t))) for t in twists]
    ))
    eye = jnp.eye(4, dtype=jnp.float32)

    results = {}
    for bucket in args.buckets:
        src = upsample_to(src0, bucket, rng)
        tgt = upsample_to(tgt0, bucket, rng)
        sp, tp = jnp.asarray(src), jnp.asarray(tgt)
        sm = jnp.ones(bucket, bool)
        tm = jnp.ones(bucket, bool)
        dims = auto_grid_dims(tgt, 1.0)
        gcfg = GICPConfig(refresh_iterations=2)
        vcfg = VGICPConfig(grid_dims=dims, refresh_iterations=2)
        row = {"bucket": bucket}
        print(f"\n=== bucket {bucket} ===")

        def scanned(body):
            @jax.jit
            def f(jitters):
                def step(c, J):
                    sj = sp @ J[:3, :3].T + J[:3, 3]
                    tj = tp @ J[:3, :3].T + J[:3, 3]
                    return c, body(sj, tj)
                return jax.lax.scan(step, 0, jitters)[1]
            return f

        def timeit(name, body, key):
            f = scanned(body)
            t0 = time.perf_counter()
            out = f(jitters)
            jax.block_until_ready(out)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = f(jitters)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            dt = (time.perf_counter() - t0) * 1e3 / n_scan
            print(f"{name:32s} {dt:9.3f} ms  (compile {compile_s:.0f}s)")
            row[key] = round(dt, 3)
            return out

        timeit("rbf covariances (fused)",
               lambda sj, tj: rbf_covariance_cols(sj, sm)[0, 0],
               "rbf_cov_ms")
        timeit("knn covariances (fused k=20)",
               lambda sj, tj: knn_covariance_cols(sj, sm)[0, 0],
               "knn_cov_ms")
        timeit("exact 1-NN (culled two-pass)",
               lambda sj, tj: nn_search(sj, tj, tm)[1][0],
               "nn_ms")
        timeit(
            "fgicp align (fresh covs, R=2)",
            lambda sj, tj: gicp_align(
                sj, sm, knn_covariance_cols(sj, sm),
                tj, tm, knn_covariance_cols(tj, tm), eye, gcfg
            ).transformation,
            "fgicp_ms",
        )
        out = timeit(
            "vgicp_rbf register (one graph)",
            lambda sj, tj: vgicp_register(sj, sm, tj, tm, eye, vcfg
                                          ).transformation,
            "vgicp_rbf_ms",
        )
        T = np.asarray(out)[-1]
        t_err = float(np.linalg.norm((np.linalg.inv(gt) @ T)[:3, 3]))
        row["vgicp_t_err_m"] = round(t_err, 4)
        print(f"vgicp t_err vs gt: {t_err:.4f} m")
        # the upsampled pair must still register to the reference
        # tolerance (gicp_test.cpp:148)
        row["pose_ok"] = bool(t_err < 0.05)
        results[str(bucket)] = row

    with open(args.json, "w") as f:
        json.dump(results, f, indent=1)
        f.write("\n")
    print(f"\nwrote {args.json}")


if __name__ == "__main__":
    main()
