"""Test env: force CPU backend with 8 virtual devices (multi-chip sharding
is validated on a simulated mesh; real-TPU perf runs via bench.py)."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU through
# the config API before any backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/data")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def bundled_pair():
    """The reference's bundled LiDAR pair, downsampled like gicp_test.cpp
    (VoxelGrid 0.2) — target 251370668, source 251371071, gt relative.txt."""
    from fast_gicp_tpu.utils.downsample import voxel_downsample
    from fast_gicp_tpu.utils.io import load_pcd, load_relative_txt

    target = voxel_downsample(load_pcd(str(REFERENCE_DATA / "251370668.pcd")), 0.2)
    source = voxel_downsample(load_pcd(str(REFERENCE_DATA / "251371071.pcd")), 0.2)
    gt = load_relative_txt(str(REFERENCE_DATA / "relative.txt"))
    return source, target, gt
