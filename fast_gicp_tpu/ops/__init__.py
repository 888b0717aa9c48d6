"""Compute ops: neighbor search, covariances, voxel map, fused reductions."""

from . import covariance, linalg3, neighbors, reduction, voxelmap  # noqa: F401
