"""Native (C++) host runtime tests: kd-tree kNN, downsample, and the
kdtree covariance path wired into FastVGICP."""

import numpy as np
import pytest

from fast_gicp_tpu import native


@pytest.fixture(scope="module", autouse=True)
def ensure_native():
    if not native.available():
        if not native.build():
            pytest.skip("native library unavailable and build failed")


def test_kdtree_knn_exact(rng):
    pts = rng.random((3000, 3)).astype(np.float32) * 40
    q = rng.random((500, 3)).astype(np.float32) * 40
    idx, dist = native.knn_search(pts, q, 8)
    d = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    ref = np.sort(d, axis=1)[:, :8]
    np.testing.assert_allclose(dist, ref, rtol=1e-4, atol=1e-4)
    # indices must point at matching distances
    np.testing.assert_allclose(
        np.take_along_axis(d, idx, axis=1), ref, rtol=1e-4, atol=1e-4
    )


def test_kdtree_self_query_includes_self(rng):
    pts = rng.random((1000, 3)).astype(np.float32) * 10
    idx, dist = native.knn_search(pts, pts, 5)
    np.testing.assert_array_equal(idx[:, 0], np.arange(1000))
    np.testing.assert_allclose(dist[:, 0], 0.0, atol=1e-6)


def test_native_downsample_matches_numpy(rng, monkeypatch):
    """The C++ filter is BITWISE identical to the pure-numpy path: same
    floor(p/res) convention, f64 accumulation in point order, and
    voxel-key-sorted output (the dispatch in utils/downsample relies on
    this being a pure speedup)."""
    from fast_gicp_tpu.utils import downsample

    pts = rng.random((5000, 3)).astype(np.float32) * 30
    a = native.voxel_downsample(pts, 0.7)
    # force the numpy reference path (voxel_downsample itself dispatches
    # to the native build when available)
    monkeypatch.setattr(native, "available", lambda: False)
    b = downsample.voxel_downsample(pts, 0.7)
    np.testing.assert_array_equal(a, b)


def test_load_kitti_bin_native(tmp_path, rng):
    data = rng.random((100, 4)).astype(np.float32)
    path = tmp_path / "000000.bin"
    data.tofile(path)
    pts = native.load_kitti_bin(str(path))
    np.testing.assert_allclose(pts, data[:, :3], atol=1e-7)


def test_vgicp_kdtree_covariance_path(pair_coarse_native):
    from fast_gicp_tpu import pose_error
    from fast_gicp_tpu.models.vgicp import FastVGICP

    source, target, gt = pair_coarse_native
    reg = FastVGICP()
    reg.set_nearest_neighbor_method("kdtree")
    reg.set_input_target(target)
    reg.set_input_source(source)
    est = reg.align()
    t_err, r_err = pose_error(gt.astype(np.float32), est.astype(np.float32))
    assert float(t_err) < 0.05
    assert float(r_err) < np.deg2rad(1.0)


@pytest.fixture(scope="module")
def pair_coarse_native():
    from tests.conftest import REFERENCE_DATA
    from fast_gicp_tpu.utils.downsample import voxel_downsample
    from fast_gicp_tpu.utils.io import load_pcd, load_relative_txt

    target = voxel_downsample(load_pcd(str(REFERENCE_DATA / "251370668.pcd")), 0.3)
    source = voxel_downsample(load_pcd(str(REFERENCE_DATA / "251371071.pcd")), 0.3)
    gt = load_relative_txt(str(REFERENCE_DATA / "relative.txt"))
    return source, target, gt
