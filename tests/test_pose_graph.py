"""Pose-graph GN back-end tests."""

import jax.numpy as jnp
import numpy as np

from fast_gicp_tpu import se3
from fast_gicp_tpu.models.pose_graph import (
    PoseGraphConfig,
    edges_from_odometry,
    optimize_pose_graph,
)


def _chain(rng, k=8, step=None):
    """Ground-truth pose chain with a gentle turn."""
    step = step if step is not None else np.float32([0, 0, 0.15, 1.0, 0.1, 0])
    T = np.eye(4, dtype=np.float64)
    poses = []
    for _ in range(k):
        poses.append(T.copy())
        T = T @ np.asarray(se3.se3_exp(jnp.asarray(step)), np.float64)
    return poses


def test_consistent_graph_is_fixed_point(rng):
    gt = _chain(rng)
    i, j, rel = edges_from_odometry(gt)
    res = optimize_pose_graph(
        jnp.asarray(np.stack(gt), jnp.float32), jnp.asarray(i), jnp.asarray(j),
        jnp.asarray(rel),
    )
    assert float(res.error) < 1e-6
    np.testing.assert_allclose(
        np.asarray(res.poses), np.stack(gt).astype(np.float32), atol=1e-4
    )


def test_loop_closure_corrects_drift(rng):
    gt = _chain(rng, k=10)
    k = len(gt)
    # noisy odometry edges (simulated drift)
    i, j, rel = edges_from_odometry(gt)
    noise = rng.normal(scale=0.01, size=(k - 1, 6)).astype(np.float32)
    rel_noisy = np.stack(
        [
            r @ np.asarray(se3.se3_exp(jnp.asarray(n)), np.float32)
            for r, n in zip(rel, noise)
        ]
    )
    # integrate the noisy odometry -> drifted initial guess
    drifted = [np.eye(4, dtype=np.float64)]
    for r in rel_noisy:
        drifted.append(drifted[-1] @ r.astype(np.float64))
    drift0 = np.linalg.norm(drifted[-1][:3, 3] - gt[-1][:3, 3])
    assert drift0 > 0.01  # the test is vacuous otherwise

    # exact loop-closure edge 0 -> K-1 (e.g. from a registration), with much
    # higher information than the odometry edges
    lc_rel = (np.linalg.inv(gt[0]) @ gt[-1]).astype(np.float32)
    edge_i = np.concatenate([i, [0]]).astype(np.int32)
    edge_j = np.concatenate([j, [k - 1]]).astype(np.int32)
    edge_rel = np.concatenate([rel_noisy, lc_rel[None]])
    info = np.broadcast_to(np.eye(6, dtype=np.float32), (k, 6, 6)).copy()
    info[-1] *= 1e4

    res = optimize_pose_graph(
        jnp.asarray(np.stack(drifted), jnp.float32),
        jnp.asarray(edge_i),
        jnp.asarray(edge_j),
        jnp.asarray(edge_rel),
        jnp.asarray(info),
        PoseGraphConfig(max_iterations=20),
    )
    opt = np.asarray(res.poses, np.float64)
    drift1 = np.linalg.norm(opt[-1][:3, 3] - gt[-1][:3, 3])
    assert drift1 < 0.2 * drift0, (drift0, drift1)
    # gauge: pose 0 stays pinned
    np.testing.assert_allclose(opt[0], np.eye(4), atol=1e-4)
