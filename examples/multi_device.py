#!/usr/bin/env python3
"""Multi-device registration on a simulated 8-device CPU mesh.

Run as-is anywhere (forces the CPU backend with 8 virtual devices); on a
real multi-chip TPU slice, drop the XLA_FLAGS override and the same code
shards over the physical mesh.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from fast_gicp_tpu import VGICPConfig, se3
from fast_gicp_tpu.ops.covariance import knn_covariances_jit
from fast_gicp_tpu.parallel.sharded import make_mesh, vgicp_align_sharded
from fast_gicp_tpu.parallel.sharded_map import ShardedScanToMapOdometry
from fast_gicp_tpu.models.scan_to_map import ScanToMapConfig


def main():
    mesh = make_mesh(8)
    print("mesh:", mesh)

    rng = np.random.default_rng(0)
    n = 2048
    base = rng.uniform(-8, 8, (n, 2)).astype(np.float32)
    target = np.concatenate(
        [base, np.sin(base[:, :1]) * np.cos(base[:, 1:])], axis=1
    )
    T_true = np.asarray(
        se3.se3_exp(jnp.asarray(np.float32([0, 0, 0.04, 0.2, -0.1, 0.05])))
    )
    source = target @ T_true[:3, :3].T + T_true[:3, 3]

    sp, tp = jnp.asarray(source), jnp.asarray(target)
    mask = jnp.ones(n, bool)
    scovs = knn_covariances_jit(sp, mask, k=10)
    tcovs = knn_covariances_jit(tp, mask, k=10)

    # Source points sharded over 8 devices; (err, H, b) psummed per LM step.
    result = vgicp_align_sharded(
        mesh, sp, mask, scovs, tp, mask, tcovs,
        jnp.eye(4, dtype=jnp.float32), VGICPConfig(resolution=0.5),
    )
    err = np.linalg.norm(
        (np.linalg.inv(T_true) @ np.asarray(result.transformation))[:3, 3]
    )
    print(f"sharded VGICP: t_err={err:.5f} m converged={bool(result.converged)}")

    # Hash-sharded persistent map (each device owns voxels by coord hash).
    odo = ShardedScanToMapOdometry(
        ScanToMapConfig(resolution=0.5, capacity=1 << 13), mesh=mesh,
        covariance="knn",
    )
    odo.process(target)
    odo.process(source)
    print("sharded scan-to-map pose:\n", odo.poses[-1].round(4))


if __name__ == "__main__":
    main()
