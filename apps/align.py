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
        "--pipelined", action="store_true",
        help="run the Nx rows through align_async (enqueue every align, "
        "synchronize once at the end) — on a remote-device runtime the "
        "synchronous class API pays a full round trip per align (~35 ms "
        "on this tunnel), which this mode amortizes away",
    )
    args = parser.parse_args(argv)

    from fast_gicp_tpu.utils.downsample import voxel_downsample
    from fast_gicp_tpu.utils.io import load_pcd, strip_near_origin

    target = voxel_downsample(strip_near_origin(load_pcd(args.target)),
                              args.downsample)
    source = voxel_downsample(strip_near_origin(load_pcd(args.source)),
                              args.downsample)
    print(f"target: {len(target)} pts, source: {len(source)} pts", flush=True)
    print(f"{'method':<12} {'single':>10} {f'{args.n}x':>12} "
          f"{f'{args.n}x_reuse':>12} {'fitness':>10}")

    for name, make in build_methods(args).items():
        # single (includes compile on first ever call; warm a throwaway
        # instance first so numbers reflect steady state, mirroring the
        # reference's GPU warm-up at construction, fast_vgicp_cuda.cu:20)
        warm = make()
        warm.set_input_target(target)
        warm.set_input_source(source)
        warm.align()
        # also compile the swapped direction (used by the reuse protocol —
        # auto grid dims differ per target cloud)
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
