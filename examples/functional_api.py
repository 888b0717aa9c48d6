#!/usr/bin/env python3
"""Functional layer: fully jitted registration for throughput pipelines.

The class API is synchronous; the functional layer keeps everything as
device arrays so calls pipeline (see bench.py for the honest timing rules
on a remote TPU).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from fast_gicp_tpu import VGICPConfig, vgicp_register
from fast_gicp_tpu.models.batch import vgicp_align_batch
from fast_gicp_tpu.ops.covariance import rbf_covariances_jit
from fast_gicp_tpu.ops.voxelmap import auto_grid_dims
from fast_gicp_tpu.utils.downsample import voxel_downsample
from fast_gicp_tpu.utils.io import load_pcd, strip_near_origin
from fast_gicp_tpu.utils.padding import pad_points

DATA = "/root/reference/data"


def main():
    target = voxel_downsample(
        strip_near_origin(load_pcd(f"{DATA}/251370668.pcd")), 0.25
    )
    source = voxel_downsample(
        strip_near_origin(load_pcd(f"{DATA}/251371071.pcd")), 0.25
    )
    sp, sm = map(jnp.asarray, pad_points(source))
    tp, tm = map(jnp.asarray, pad_points(target))
    guess = jnp.eye(4, dtype=jnp.float32)

    # One-graph full registration: RBF covariances for BOTH clouds + VGICP
    # align, nothing leaves the device until you ask.
    config = VGICPConfig(grid_dims=auto_grid_dims(target, 1.0))
    result = vgicp_register(sp, sm, tp, tm, guess, config)
    print("pose:\n", np.asarray(result.transformation).round(4))
    print(f"converged={bool(result.converged)} iters={int(result.iterations)}")

    # Batched multi-pair alignment (vmap over registrations).
    B = 4
    scovs = rbf_covariances_jit(sp, sm)
    tcovs = rbf_covariances_jit(tp, tm)
    tile = lambda a: jnp.broadcast_to(a, (B,) + a.shape)
    batch = vgicp_align_batch(
        tile(sp), tile(sm), tile(scovs), tile(tp), tile(tm), tile(tcovs),
        tile(guess), config,
    )
    print(f"batched: {B} aligns, converged={np.asarray(batch.converged)}")


if __name__ == "__main__":
    main()
