"""Loader sanity (the reference's LoadCheck, gicp_test.cpp:89-94) +
format roundtrips."""

import numpy as np

from fast_gicp_tpu.utils.io import (
    load_kitti_bin,
    load_pcd,
    load_relative_txt,
    strip_near_origin,
)

DATA = "/root/reference/data"


def test_load_check():
    target = load_pcd(f"{DATA}/251370668.pcd")
    source = load_pcd(f"{DATA}/251371071.pcd")
    assert len(target) > 10000 and len(source) > 10000
    assert np.isfinite(target).all() and np.isfinite(source).all()
    gt = load_relative_txt(f"{DATA}/relative.txt")
    assert gt.shape == (4, 4)
    # ~0.49 m relative translation (SURVEY data fixture note)
    assert 0.3 < np.linalg.norm(gt[:3, 3]) < 0.7
    R = gt[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_strip_near_origin():
    pts = np.asarray([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.01, 0.0, 0.0]],
                     np.float32)
    out = strip_near_origin(pts)
    assert len(out) == 1 and out[0, 0] == 1.0


def test_kitti_bin_roundtrip(tmp_path):
    rec = np.random.default_rng(0).normal(size=(64, 4)).astype(np.float32)
    p = tmp_path / "000000.bin"
    rec.tofile(p)
    pts = load_kitti_bin(str(p))
    np.testing.assert_allclose(pts, rec[:, :3])
