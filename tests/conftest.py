"""Test env: force CPU backend with 8 virtual devices (multi-chip sharding
is validated on a simulated mesh; real-TPU perf runs via bench.py)."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Tests must NOT share the persistent jit cache (~/.cache/fast_gicp_tpu_jit):
# concurrent writers (a test run racing another jax process) corrupt entries,
# and later readers SEGFAULT/abort inside zstandard decompress mid-suite.
# CPU compiles are fast; the persistent cache exists for the TPU tunnel.
os.environ.setdefault("FAST_GICP_TPU_NO_CACHE", "1")

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU through
# the config API before any backend is initialized.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import numpy as np
import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/data")

# XLA:CPU (jax 0.9.0) SEGFAULTS inside `backend_compile_and_load` once a
# single process has accumulated enough compiled programs (the full suite
# in one process reliably dies at the same mid-suite compile; any subset
# passes).  Dropping the accumulated executables between test FILES keeps
# the per-process compile footprint bounded; within-file jit reuse (what
# the expensive tests rely on) is untouched.
_current_file = [None]


def pytest_runtest_setup(item):
    path = str(item.fspath)
    if _current_file[0] is not None and path != _current_file[0]:
        jax.clear_caches()
    _current_file[0] = path


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
