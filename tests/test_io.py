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


def test_channel_payloads_ride_through(tmp_path):
    """Reference PointXYZI parity: intensity loads from KITTI .bin, rides
    through downsampling (averaged per voxel) and registration, and comes
    back attached to the aligned output (fast_gicp.cpp:1-6 instantiates
    every algorithm for payload-carrying point types; registration math
    ignores the payload exactly like the reference)."""
    import numpy as np

    from fast_gicp_tpu.models.vgicp import FastVGICP
    from fast_gicp_tpu.utils.downsample import voxel_downsample
    from fast_gicp_tpu.utils.io import load_kitti_bin, strip_near_origin

    rng = np.random.default_rng(0)
    n = 600
    pts = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    intensity = rng.uniform(0, 1, (n, 1)).astype(np.float32)
    path = tmp_path / "scan.bin"
    np.concatenate([pts, intensity], axis=1).astype(np.float32).tofile(path)

    xyz, ch = load_kitti_bin(str(path), with_channels=True)
    np.testing.assert_allclose(xyz, pts)
    np.testing.assert_allclose(ch, intensity)

    xyz2, ch2 = strip_near_origin(xyz, channels=ch)
    assert len(xyz2) == len(ch2) <= n

    dpts, dch = voxel_downsample(xyz2, 0.5, channels=ch2)
    assert len(dpts) == len(dch)
    # single-member voxels keep their exact intensity
    # (cross-check one voxel by brute force)
    import collections
    coords = np.floor(xyz2 / 0.5).astype(np.int64)
    keys = [tuple(c) for c in coords]
    counts = collections.Counter(keys)
    singles = [i for i, k in enumerate(keys) if counts[k] == 1]
    if singles:
        i = singles[0]
        j = np.argmin(np.linalg.norm(dpts - xyz2[i], axis=1))
        np.testing.assert_allclose(dch[j], ch2[i], atol=1e-5)

    # payload survives registration and comes back on the aligned cloud
    reg = FastVGICP(resolution=1.0, covariance_estimation="knn")
    reg.set_input_target(dpts)
    reg.set_input_source(dpts, channels=dch)
    reg.align()
    out = reg.aligned_source()
    assert out.shape == (len(dpts), 4)
    np.testing.assert_allclose(out[:, 3:], dch, atol=1e-6)


def test_approximate_downsample_counts_pinned():
    """Freeze the PCL-ApproximateVoxelGrid emulation's exact counts on the
    bundled benchmark pair (align.cpp:30-36 protocol: near-origin strip,
    0.1 m leaf).  The reference's published counts are 17249/17518
    (README.md:116); the residual -88/-52 delta is characterized in the
    utils/downsample.py docstring as hash-detail noise of the 2019 PCL
    build (multiplier perturbations at the same table size scatter counts
    over +-1300).  Any drift in the emulation itself must be deliberate."""
    from tests.conftest import REFERENCE_DATA

    from fast_gicp_tpu.utils.downsample import (
        approximate_voxel_downsample, voxel_downsample,
    )
    from fast_gicp_tpu.utils.io import load_pcd, strip_near_origin

    t = strip_near_origin(load_pcd(str(REFERENCE_DATA / "251370668.pcd")))
    s = strip_near_origin(load_pcd(str(REFERENCE_DATA / "251371071.pcd")))
    assert len(approximate_voxel_downsample(t, 0.1)) == 17338
    assert len(approximate_voxel_downsample(s, 0.1)) == 17570
    # exact voxel counts (the collision-free lower bound of the split
    # decomposition: output = exact + collision splits)
    assert len(voxel_downsample(t, 0.1)) == 15772
    assert len(voxel_downsample(s, 0.1)) == 15949
