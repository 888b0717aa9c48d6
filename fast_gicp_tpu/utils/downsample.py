"""Voxel-grid downsampling (host-side numpy).

Equivalent of pcl::ApproximateVoxelGrid / pcl::VoxelGrid as used by the
reference apps and tests (align.cpp:30-36 res 0.1, kitti.cpp:79-84 res 0.25,
gicp_test.cpp:36-44 res 0.2, python main.cpp:46-62): one output point per
occupied voxel at the centroid of its members.  Exact (hash-collision-free),
which the "Approximate" PCL variant is not — point counts can differ by a
few points; registration results are insensitive to this.
"""

from __future__ import annotations

import numpy as np


def voxel_downsample(points: np.ndarray, resolution: float) -> np.ndarray:
    """Centroid-per-voxel downsample of (N, 3) points; resolution <= 0 is a
    passthrough (align_points' downsample_resolution=-1 convention,
    python/main.cpp:70-76)."""
    if resolution is None or resolution <= 0:
        return np.ascontiguousarray(points[:, :3], dtype=np.float32)
    pts = np.asarray(points[:, :3], dtype=np.float64)
    pts = pts[np.isfinite(pts).all(axis=1)]  # NaN/inf returns poison keys
    if len(pts) == 0:
        return np.zeros((0, 3), np.float32)
    coords = np.floor(pts / resolution).astype(np.int64)
    cmin = coords.min(axis=0)
    c = coords - cmin
    if int(c.max(initial=0)) < (1 << 21):
        # Pack 3x21-bit (re-based) coords into one int64 key for np.unique.
        key = (c[:, 0] << 42) | (c[:, 1] << 21) | c[:, 2]
        uniq, inv = np.unique(key, return_inverse=True)
    else:
        # span exceeds 21 bits/axis: exact (slower) row-wise unique
        uniq, inv = np.unique(c, axis=0, return_inverse=True)
        # numpy 2.0.x returns a 2-D inverse from axis-unique; flatten so
        # add.at/bincount index correctly on every numpy version.
        inv = np.asarray(inv).reshape(-1)
        uniq = np.arange(len(uniq))
    sums = np.zeros((uniq.shape[0], 3), dtype=np.float64)
    np.add.at(sums, inv, pts)
    counts = np.bincount(inv, minlength=uniq.shape[0]).astype(np.float64)
    return (sums / counts[:, None]).astype(np.float32)
