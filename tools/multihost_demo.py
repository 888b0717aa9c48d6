#!/usr/bin/env python3
"""Multi-process (multi-host) demo worker: one rank of an N-process job.

Run one copy per process (every rank runs this same program — JAX
multi-controller SPMD):

  python tools/multihost_demo.py --coordinator 127.0.0.1:9911 \
      --num-processes 2 --process-id 0 [--cpu-devices 2]

Each rank contributes its own slice of the source cloud; the sharded GICP
align runs over the process-spanning global mesh (psum'd normal equations
cross the process boundary every LM iteration), and every rank checks the
resulting pose against a locally-computed single-process reference solve.
Prints `MULTIHOST OK ...` on success.  With --cpu-devices the CPU backend
is forced with that many virtual devices per process, which is how
tests/test_multihost.py proves process-spanning collectives work without a
multi-host TPU slice; on a real TPU pod, omit all flags and let
`initialize()` auto-detect (docs/MULTIHOST.md).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument(
        "--cpu-devices", type=int, default=0,
        help="force the CPU backend with this many virtual devices",
    )
    parser.add_argument(
        "--sharded-map", action="store_true",
        help="also drive the hash-sharded persistent-map odometry across "
        "the process-spanning mesh (3 frames) and check the trajectory "
        "against a single-process reference",
    )
    args = parser.parse_args(argv)

    if args.cpu_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count="
            f"{args.cpu_devices}"
        ).strip()
        os.environ.setdefault("FAST_GICP_TPU_NO_CACHE", "1")
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from fast_gicp_tpu.parallel import distributed

    distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import numpy as np

    rank, nprocs = jax.process_index(), jax.process_count()
    mesh = distributed.make_global_mesh()
    n_dev = len(jax.devices())

    # Every rank generates the SAME clouds (shared seed), then keeps only
    # its contiguous slice of the source.
    import __graft_entry__ as ge

    source, target = ge._example_clouds(n_source=64 * n_dev, n_target=512)
    covs_all = _covs(source)
    tcovs = _covs(target)
    n_local = source.shape[0] // nprocs
    lo = rank * n_local
    local_src = source[lo:lo + n_local]
    local_covs = covs_all[lo:lo + n_local]
    local_mask = np.ones(n_local, bool)

    import jax.numpy as jnp

    from fast_gicp_tpu.models.gicp import GICPConfig
    from fast_gicp_tpu.solver import LsqConfig

    config = GICPConfig(lsq=LsqConfig(max_iterations=8))
    result = distributed.gicp_align_multihost(
        mesh, local_src, local_mask, local_covs,
        target, np.ones(len(target), bool), tcovs,
        np.eye(4, dtype=np.float32), config,
    )
    T = np.asarray(result.transformation)

    # Single-process reference: same objective on the full clouds, local
    # devices only (no cross-process collectives).
    from fast_gicp_tpu.models.gicp import gicp_align

    ref = gicp_align(
        jnp.asarray(source), jnp.ones(len(source), bool), jnp.asarray(covs_all),
        jnp.asarray(target), jnp.ones(len(target), bool), jnp.asarray(tcovs),
        jnp.eye(4, dtype=jnp.float32), config,
    )
    T_ref = np.asarray(ref.transformation)

    if not np.isfinite(T).all():
        raise SystemExit(f"rank {rank}: non-finite multihost pose\n{T}")
    if not np.allclose(T, T_ref, atol=1e-3):
        raise SystemExit(
            f"rank {rank}: multihost pose diverged from single-process "
            f"reference\n{T}\n{T_ref}"
        )
    print(
        f"MULTIHOST OK rank={rank}/{nprocs} devices={n_dev} "
        f"iters={int(result.iterations)} "
        f"t={np.array2string(T[:3, 3], precision=5)}",
        flush=True,
    )

    if args.sharded_map:
        # Phase 2: the persistent hash-sharded world map on the SAME
        # process-spanning mesh — every rank feeds identical frames (SPMD
        # multi-controller), map shards live on devices of both
        # processes, and the routed all_to_all fusion/align collectives
        # cross the process boundary each frame.
        from fast_gicp_tpu.models.scan_to_map import (
            ScanToMapConfig, ScanToMapOdometry,
        )
        from fast_gicp_tpu.parallel.sharded_map import (
            ShardedScanToMapOdometry,
        )

        rng = np.random.default_rng(0)
        frames = []
        for i in range(3):
            base = (rng.uniform(size=(768, 3)) * 24 - 12).astype(np.float32)
            shift = np.float32([0.05 * i, 0.02 * i, 0.0])
            frames.append(base[: 512 + 64 * i] + shift)
        cfg = ScanToMapConfig(resolution=1.0, capacity=1 << 12)
        odo = ShardedScanToMapOdometry(cfg, mesh=mesh, covariance="knn")
        ref_odo = ScanToMapOdometry(cfg, covariance="knn")
        for f in frames:
            p_sh = odo.process(f)
            p_ref = ref_odo.process(f)
            if not np.allclose(p_sh, p_ref, atol=5e-3):
                raise SystemExit(
                    f"rank {rank}: sharded-map pose diverged\n"
                    f"{p_sh}\n{p_ref}"
                )
        print(
            f"MULTIHOST MAP OK rank={rank}/{nprocs} frames={len(frames)} "
            f"t={np.array2string(np.asarray(odo.poses[-1])[:3, 3], precision=5)}",
            flush=True,
        )
    return 0


def _covs(points):
    import numpy as np

    # Cheap isotropic covariances: the demo exercises the distributed
    # solve, not covariance estimation.
    n = len(points)
    return np.tile(0.01 * np.eye(3, dtype=np.float32), (n, 1, 1))


if __name__ == "__main__":
    sys.exit(main())
