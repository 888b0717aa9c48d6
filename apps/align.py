#!/usr/bin/env python3
"""Benchmark/demo app: align two PCD files with every algorithm.

Equivalent of the reference's `gicp_align` (src/align.cpp:22-215): loads two
clouds, strips near-origin points, downsamples at 0.1 m, then benchmarks
each method three ways — single align, N repeated aligns (fresh covariances
each time), and N aligns reusing covariances via swap_source_and_target —
printing milliseconds and fitness like the reference README table.

Usage:
  python apps/align.py [target.pcd source.pcd] [--n 100] [--methods ...]
Defaults to the bundled reference pair.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_methods(args):
    from fast_gicp_tpu import FastGICP, FastVGICP, NDTCuda

    methods = {}
    methods["fgicp"] = lambda: FastGICP()
    methods["vgicp"] = lambda: FastVGICP()

    def vgicp_rbf():
        reg = FastVGICP()
        reg.set_nearest_neighbor_method("rbf")
        return reg

    methods["vgicp_rbf"] = vgicp_rbf

    def ndt_d2d():
        reg = NDTCuda()
        reg.set_resolution(1.0)
        return reg

    methods["ndt_d2d"] = ndt_d2d

    def ndt_p2d():
        reg = NDTCuda()
        reg.set_distance_mode("p2d")
        reg.set_resolution(1.0)
        return reg

    methods["ndt_p2d"] = ndt_p2d
    if args.methods:
        unknown = set(args.methods) - set(methods)
        if unknown:
            raise SystemExit(
                f"unknown methods {sorted(unknown)}; available: "
                f"{sorted(methods)}"
            )
        methods = {k: v for k, v in methods.items() if k in args.methods}
    return methods


def run_device_rows(methods, source, target, n):
    """Device-rolled Nx protocol: the N aligns run as ONE jitted lax.scan
    (zero per-align host dispatch — the TPU-idiomatic equivalent of the
    reference's C++ `for` loop, align.cpp:56-76, whose loop overhead is
    also zero).  Per-trip rigid jitter re-observes the clouds so nothing
    is loop-invariant (XLA would otherwise hoist covariance passes and map
    builds out of the loop).  "fresh" re-estimates covariances every trip;
    "reuse" rotates cached covariances (the swap-protocol analogue,
    align.cpp:87-103: covariance estimation leaves the loop, map build and
    solve stay in it).  NDT's cache is its per-cloud voxel maps
    (ndt_cuda.cu:70-93); its reuse row prebuilds the TARGET map outside
    the loop and re-observes only the source (see ndt_reuse_body).
    """
    import time
    from functools import partial

    import jax
    import jax.numpy as jnp

    from fast_gicp_tpu import se3
    from fast_gicp_tpu.models.gicp import GICPConfig, gicp_align
    from fast_gicp_tpu.models.ndt import NDTConfig, ndt_align
    from fast_gicp_tpu.models.vgicp import (
        VGICPConfig, vgicp_align, vgicp_register,
    )
    from fast_gicp_tpu.ops.covariance import (
        knn_covariance_cols, knn_covariances, rbf_covariances,
    )
    from fast_gicp_tpu.ops.voxelmap import auto_grid_dims
    from fast_gicp_tpu.utils.padding import pad_points

    sp, sm = map(jnp.asarray, pad_points(source))
    tp, tm = map(jnp.asarray, pad_points(target))
    dims = auto_grid_dims(target, 1.0)
    # NDT D2D builds a SOURCE voxel map too; size the grid for the union
    # of extents (cf. NDTCuda._grid_dims).
    ndims = auto_grid_dims(np.concatenate([source, target]), 1.0)
    eye = jnp.eye(4, dtype=jnp.float32)
    vcfg = VGICPConfig(grid_dims=dims, refresh_iterations=2)
    gcfg = GICPConfig(refresh_iterations=2)
    # max_source_voxels: the bundled pair occupies ~1.1k voxels at 1.0 m
    # (measured; D2D iterates every source row per LM iteration, so half
    # the 4096 default budget saves ~0.4 ms/align at identical t_err)
    ncfg_d2d = NDTConfig(resolution=1.0, grid_dims=ndims,
                         refresh_iterations=3, max_source_voxels=2048)
    # P2D refresh converges by R=3 on the corner-origin raw maps
    # (measured: t_err 0.0153 / fitness 0.1997 vs 0.0129 / 0.2017 at
    # R=None; the old finalized-map path needed R=6)
    ncfg_p2d = ncfg_d2d._replace(distance_mode="p2d", refresh_iterations=3)

    rng = np.random.default_rng(0)
    twists = 1e-5 * rng.standard_normal((n, 6)).astype(np.float32)
    jitters = jnp.asarray(
        np.stack([np.asarray(se3.se3_exp(jnp.asarray(t))) for t in twists])
    )
    scovs_rbf = rbf_covariances(sp, sm)
    tcovs_rbf = rbf_covariances(tp, tm)
    scovs_knn = knn_covariances(sp, sm)
    tcovs_knn = knn_covariances(tp, tm)

    def rot_covs(J, covs):
        R = J[:3, :3]
        out = jnp.einsum("ij,njk,lk->nil", R, covs, R)
        # Barrier: without it XLA fuses this 17k-cov rotation INTO the LM
        # while_loop body (it looks cheap to rematerialize), recomputing it
        # every iteration — measured 3x on the whole align.
        return jax.lax.optimization_barrier(out)

    def fgicp_fresh(J):
        sj, tj = sp @ J[:3, :3].T + J[:3, 3], tp @ J[:3, :3].T + J[:3, 3]
        return gicp_align(sj, sm, knn_covariance_cols(sj, sm),
                          tj, tm, knn_covariance_cols(tj, tm), eye, gcfg)

    def fgicp_reuse(J):
        sj, tj = sp @ J[:3, :3].T + J[:3, 3], tp @ J[:3, :3].T + J[:3, 3]
        return gicp_align(sj, sm, rot_covs(J, scovs_knn),
                          tj, tm, rot_covs(J, tcovs_knn), eye, gcfg)

    def vgicp_fresh(J):
        sj, tj = sp @ J[:3, :3].T + J[:3, 3], tp @ J[:3, :3].T + J[:3, 3]
        return vgicp_align(sj, sm, knn_covariance_cols(sj, sm),
                           tj, tm, knn_covariance_cols(tj, tm), eye, vcfg)

    def vgicp_reuse(J):
        sj, tj = sp @ J[:3, :3].T + J[:3, 3], tp @ J[:3, :3].T + J[:3, 3]
        return vgicp_align(sj, sm, rot_covs(J, scovs_knn),
                           tj, tm, rot_covs(J, tcovs_knn), eye, vcfg)

    def vgicp_rbf_fresh(J):
        sj, tj = sp @ J[:3, :3].T + J[:3, 3], tp @ J[:3, :3].T + J[:3, 3]
        return vgicp_register(sj, sm, tj, tm, eye, vcfg)

    def vgicp_rbf_reuse(J):
        sj, tj = sp @ J[:3, :3].T + J[:3, 3], tp @ J[:3, :3].T + J[:3, 3]
        return vgicp_align(sj, sm, rot_covs(J, scovs_rbf),
                           tj, tm, rot_covs(J, tcovs_rbf), eye, vcfg)

    def ndt_body(cfg):
        def body(J):
            sj, tj = sp @ J[:3, :3].T + J[:3, 3], tp @ J[:3, :3].T + J[:3, 3]
            return ndt_align(sj, sm, tj, tm, eye, cfg)
        return body

    def ndt_reuse_body(cfg):
        """NDT reuse = the reference's per-cloud voxel-map cache
        (ndt_cuda.cu:70-93: maps built at set_input_* and swapped with
        the clouds): the TARGET map is prebuilt ONCE outside the loop
        (loop-invariant — XLA hoists it, exactly like the cached map);
        each trip re-observes only the SOURCE and rebuilds its per-align
        state (D2D compact stats; P2D nothing)."""
        from fast_gicp_tpu.models.ndt import (
            ndt_align_prebuilt, ndt_prepare_cloud,
        )
        from fast_gicp_tpu.ops.voxelmap import build_ndt_grid_compact

        prepared = ndt_prepare_cloud(tp, tm, cfg)

        def body(J):
            tvm, _, tcen = prepared
            sj = sp @ J[:3, :3].T + J[:3, 3]
            if cfg.distance_mode == "d2d":
                w = sm.astype(sj.dtype)
                scen = jnp.sum(sj * w[:, None], 0) / jnp.maximum(
                    jnp.sum(w), 1.0
                )
                _, stats = build_ndt_grid_compact(
                    sj - scen, sm, cfg.resolution, cfg.grid_dims,
                    budget=cfg.max_source_voxels,
                    with_map=False, with_stats=True,
                )
            else:
                stats, scen = None, tcen
            return ndt_align_prebuilt(
                sj, sm, stats, scen, tvm, tcen, eye, cfg
            )
        return body

    # beyond-reference estimator: the k-th-NN windowed (adaptive-radius)
    # covariances replace the exact-kNN statistic (see ops/covariance.py);
    # reported as separate rows so the knn rows stay reference-parity
    from fast_gicp_tpu.ops.covariance import adaptive_radius_covariances

    def fgicp_adaptive(J):
        sj, tj = sp @ J[:3, :3].T + J[:3, 3], tp @ J[:3, :3].T + J[:3, 3]
        return gicp_align(sj, sm, adaptive_radius_covariances(sj, sm),
                          tj, tm, adaptive_radius_covariances(tj, tm),
                          eye, gcfg)

    def vgicp_adaptive(J):
        sj, tj = sp @ J[:3, :3].T + J[:3, 3], tp @ J[:3, :3].T + J[:3, 3]
        return vgicp_align(sj, sm, adaptive_radius_covariances(sj, sm),
                           tj, tm, adaptive_radius_covariances(tj, tm),
                           eye, vcfg)

    bodies = {
        "fgicp": (fgicp_fresh, fgicp_reuse),
        "fgicp_adaptive": (fgicp_adaptive, fgicp_reuse),
        "vgicp": (vgicp_fresh, vgicp_reuse),
        "vgicp_adaptive": (vgicp_adaptive, vgicp_reuse),
        "vgicp_rbf": (vgicp_rbf_fresh, vgicp_rbf_reuse),
        "ndt_d2d": (ndt_body(ncfg_d2d), ndt_reuse_body(ncfg_d2d)),
        "ndt_p2d": (ndt_body(ncfg_p2d), ndt_reuse_body(ncfg_p2d)),
    }

    @partial(jax.jit, static_argnames=("which", "col"))
    def scan_n(jitters, which, col):
        def step(carry, J):
            r = bodies[which][col](J)
            return carry, r.transformation
        return jax.lax.scan(step, 0, jitters)[1]

    def timed(which, col, reps=5):
        out = scan_n(jitters, which, col)
        np.asarray(out)  # warm-up/compile
        # Enqueue `reps` scans, force ONCE (bench.py methodology): each
        # device->host force on the axon tunnel costs a flat ~23-35 ms
        # that would otherwise pollute the per-align number by ~0.2 ms
        # at n=100.
        t0 = time.perf_counter()
        for _ in range(reps):
            out = scan_n(jitters, which, col)
        np.asarray(out)
        return (time.perf_counter() - t0) * 1e3 / (n * reps)

    rows = {}
    print(f"\ndevice-rolled lax.scan protocol ({n} aligns / dispatch):")
    print(f"{'method':<16} {'fresh':>14} {'reuse':>14}")
    # the *_adaptive rows ride along whenever their base method is selected
    row_names = [
        b for b in bodies
        if b in methods or b.removesuffix("_adaptive") in methods
    ]
    for name in row_names:
        fresh = timed(name, 0)
        reuse = timed(name, 1)
        rows[name] = {
            "fresh_ms_per_align": round(fresh, 3),
            "reuse_ms_per_align": round(reuse, 3),
        }
        print(f"{name:<16} {fresh:>11.2f}ms {reuse:>11.2f}ms", flush=True)
    return rows


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("target", nargs="?",
                        default="/root/reference/data/251370668.pcd")
    parser.add_argument("source", nargs="?",
                        default="/root/reference/data/251371071.pcd")
    parser.add_argument("--n", type=int, default=100,
                        help="iterations for the repeated benchmarks")
    parser.add_argument("--downsample", type=float, default=0.1)
    parser.add_argument("--methods", nargs="*", default=None)
    parser.add_argument(
        "--exact-downsample", action="store_true",
        help="use the exact centroid voxel grid instead of the "
        "PCL-ApproximateVoxelGrid-compatible filter the reference "
        "benchmark uses (align.cpp:30-36)",
    )
    parser.add_argument("--json", default=None,
                        help="also write the table as JSON to this path")
    parser.add_argument(
        "--device-loop", action="store_true",
        help="additionally run the Nx protocols as ONE jitted lax.scan per "
        "row (no per-align host dispatch; the TPU equivalent of the "
        "reference's zero-overhead C++ loop)",
    )
    parser.add_argument(
        "--pipelined", action="store_true",
        help="run the Nx rows through align_async (enqueue every align, "
        "synchronize once at the end) — on a remote-device runtime the "
        "synchronous class API pays a full round trip per align (~35 ms "
        "on this tunnel), which this mode amortizes away",
    )
    args = parser.parse_args(argv)

    from fast_gicp_tpu.utils.downsample import (
        approximate_voxel_downsample,
        voxel_downsample,
    )
    from fast_gicp_tpu.utils.io import load_pcd, strip_near_origin

    # The reference benchmark filters through pcl::ApproximateVoxelGrid
    # (align.cpp:30-36) — use the compatible filter by default so point
    # counts and fitness are comparable with its README table.
    filt = voxel_downsample if args.exact_downsample else (
        approximate_voxel_downsample)
    target = filt(strip_near_origin(load_pcd(args.target)), args.downsample)
    source = filt(strip_near_origin(load_pcd(args.source)), args.downsample)
    print(f"target: {len(target)} pts, source: {len(source)} pts", flush=True)
    print(f"{'method':<12} {'single':>10} {f'{args.n}x':>12} "
          f"{f'{args.n}x_reuse':>12} {'fitness':>10}")

    rows = {}
    for name, make in build_methods(args).items():
        # single (includes compile on first ever call; warm a throwaway
        # instance first so numbers reflect steady state, mirroring the
        # reference's GPU warm-up at construction, fast_vgicp_cuda.cu:20)
        warm = make()
        warm.set_input_target(target)
        warm.set_input_source(source)
        warm.align()
        # also compile the swapped direction (used by the reuse protocol —
        # auto grid dims differ per target cloud), AND the forward
        # direction with CACHED covariances: the first align populated the
        # cache via the one-dispatch fused path, so the forward
        # cached-covariance executable (what the reuse loop's odd
        # iterations run) is a distinct compile
        warm.swap_source_and_target()
        warm.align()
        warm.swap_source_and_target()
        warm.align()

        reg = make()
        t0 = time.perf_counter()
        reg.set_input_target(target)
        reg.set_input_source(source)
        reg.align()
        single_ms = (time.perf_counter() - t0) * 1e3

        if args.pipelined:
            # Nx with fresh covariances: keep the uploaded clouds, drop the
            # cached covariances each round (the async analogue of the
            # reference's construct-a-new-instance loop, align.cpp:56-76),
            # and synchronize once after the last enqueue.
            reg = make()
            reg.set_input_target(target)
            reg.set_input_source(source)
            t0 = time.perf_counter()
            for _ in range(args.n):
                reg.clear_covariances()
                reg.align_async()
            reg.get_final_transformation()  # one device->host sync
            multi_ms = (time.perf_counter() - t0) * 1e3

            t0 = time.perf_counter()
            reg = make()
            reg.set_input_target(target)
            reg.set_input_source(source)
            for _ in range(args.n):
                reg.align_async()
                reg.swap_source_and_target()
            reg.get_final_transformation()
            reuse_ms = (time.perf_counter() - t0) * 1e3
        else:
            t0 = time.perf_counter()
            for _ in range(args.n):
                reg = make()
                reg.set_input_target(target)
                reg.set_input_source(source)
                reg.align()
            multi_ms = (time.perf_counter() - t0) * 1e3

            t0 = time.perf_counter()
            reg = make()
            reg.set_input_target(target)
            reg.set_input_source(source)
            for _ in range(args.n):
                reg.align()
                reg.swap_source_and_target()
            reuse_ms = (time.perf_counter() - t0) * 1e3

        reg = make()
        reg.set_input_target(target)
        reg.set_input_source(source)
        reg.align()
        fitness = reg.get_fitness_score()
        print(f"{name:<12} {single_ms:>8.2f}ms {multi_ms:>10.1f}ms "
              f"{reuse_ms:>10.1f}ms {fitness:>10.5f}", flush=True)
        rows[name] = {
            "single_ms": round(single_ms, 2),
            f"{args.n}x_ms": round(multi_ms, 1),
            f"{args.n}x_reuse_ms": round(reuse_ms, 1),
            "fitness": round(float(fitness), 6),
        }
    device_rows = None
    if args.device_loop:
        device_rows = run_device_rows(
            list(build_methods(args)), source, target, args.n
        )
    if args.json:
        import json

        payload = {
            "n": args.n,
            "pipelined": bool(args.pipelined),
            "downsample": args.downsample,
            "n_target": int(len(target)),
            "n_source": int(len(source)),
            "methods": rows,
        }
        if device_rows is not None:
            payload["device_loop"] = device_rows
        with open(args.json, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
