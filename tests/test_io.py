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


def test_ascii_pcd_count_fields_and_single_point(tmp_path):
    """ASCII parsing: COUNT>1 fields before xyz shift the columns; a
    single-point file parses (ndmin)."""
    p = tmp_path / "a.pcd"
    p.write_text(
        "VERSION 0.7\nFIELDS normal x y z\nSIZE 4 4 4 4\nTYPE F F F F\n"
        "COUNT 3 1 1 1\nWIDTH 1\nHEIGHT 1\nPOINTS 1\nDATA ascii\n"
        "9 9 9 1 2 3\n"
    )
    np.testing.assert_allclose(load_pcd(str(p)), [[1.0, 2.0, 3.0]])


def test_truncated_pcd_raises(tmp_path):
    import pytest

    p = tmp_path / "bad.pcd"
    p.write_text("VERSION 0.7\nFIELDS x y z\n")  # no DATA line
    with pytest.raises(ValueError, match="truncated"):
        load_pcd(str(p))


def test_downsample_robustness():
    from fast_gicp_tpu.utils.downsample import voxel_downsample

    # empty cloud
    assert voxel_downsample(np.zeros((0, 3), np.float32), 0.5).shape == (0, 3)
    # NaN points dropped, not merged
    pts = np.asarray([[0, 0, 0], [np.nan, 0, 0], [1, 1, 1]], np.float32)
    out = voxel_downsample(pts, 0.5)
    assert len(out) == 2 and np.isfinite(out).all()
    # huge span falls back to exact row-wise unique
    far = np.asarray([[0, 0, 0], [3e6, 0, 0]], np.float32)
    out = voxel_downsample(far, 1.0)
    assert len(out) == 2
