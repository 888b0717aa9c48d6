"""Multi-device shard_map tests on the 8-device CPU mesh: sharded aligns
must match single-device results (psum'd normal equations are exact)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_gicp_tpu.models.gicp import GICPConfig, gicp_align
from fast_gicp_tpu.models.ndt import NDTConfig, ndt_align
from fast_gicp_tpu.models.vgicp import VGICPConfig, vgicp_align
from fast_gicp_tpu.ops.covariance import knn_covariances
from fast_gicp_tpu.parallel.sharded import (
    gicp_align_sharded,
    make_mesh,
    ndt_align_sharded,
    vgicp_align_sharded,
)
from fast_gicp_tpu.solver import LsqConfig


@pytest.fixture(scope="module")
def synthetic_pair(rng=None):
    rng = np.random.default_rng(7)
    n = 512
    base = rng.uniform(-6, 6, size=(n, 2)).astype(np.float32)
    target = np.concatenate(
        [base, (np.sin(base[:, :1]) + 0.2 * base[:, 1:])], axis=1
    ).astype(np.float32)
    c, s = np.cos(0.04), np.sin(0.04)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    source = target @ R.T + np.float32([0.15, -0.1, 0.05])
    sp, tp = jnp.asarray(source), jnp.asarray(target)
    mask = jnp.ones(n, bool)
    scovs = knn_covariances(sp, mask, k=10, approx=False)
    tcovs = knn_covariances(tp, mask, k=10, approx=False)
    return sp, tp, mask, scovs, tcovs


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_gicp_sharded_matches_single(synthetic_pair):
    sp, tp, mask, scovs, tcovs = synthetic_pair
    guess = jnp.eye(4, dtype=jnp.float32)
    cfg = GICPConfig(lsq=LsqConfig(max_iterations=16))
    single = gicp_align(sp, mask, scovs, tp, mask, tcovs, guess, cfg)
    mesh = make_mesh()
    sharded = gicp_align_sharded(mesh, sp, mask, scovs, tp, mask, tcovs, guess, cfg)
    np.testing.assert_allclose(
        np.asarray(sharded.transformation),
        np.asarray(single.transformation),
        atol=1e-4,
    )
    assert bool(sharded.converged) == bool(single.converged)


def test_vgicp_sharded_matches_single(synthetic_pair):
    sp, tp, mask, scovs, tcovs = synthetic_pair
    guess = jnp.eye(4, dtype=jnp.float32)
    cfg = VGICPConfig(
        resolution=1.0,
        neighbor_search_method="direct7",
        lsq=LsqConfig(max_iterations=16),
    )
    single = vgicp_align(sp, mask, scovs, tp, mask, tcovs, guess, cfg)
    mesh = make_mesh()
    sharded = vgicp_align_sharded(mesh, sp, mask, scovs, tp, mask, tcovs, guess, cfg)
    np.testing.assert_allclose(
        np.asarray(sharded.transformation),
        np.asarray(single.transformation),
        atol=1e-4,
    )


def test_ndt_sharded_matches_single(synthetic_pair):
    sp, tp, mask, _, _ = synthetic_pair
    guess = jnp.eye(4, dtype=jnp.float32)
    cfg = NDTConfig(resolution=2.0, lsq=LsqConfig(max_iterations=16))
    single = ndt_align(sp, mask, tp, mask, guess, cfg)
    mesh = make_mesh()
    sharded = ndt_align_sharded(mesh, sp, mask, tp, mask, guess, cfg)
    np.testing.assert_allclose(
        np.asarray(sharded.transformation),
        np.asarray(single.transformation),
        atol=1e-4,
    )


def test_graft_entry_dryrun():
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out.transformation)).all()
    ge.dryrun_multichip(8)
