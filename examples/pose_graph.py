#!/usr/bin/env python3
"""Pose-graph back-end: correct odometry drift with a loop closure.

Builds a noisy odometry chain, adds one loop-closure edge weighted by a
registration Hessian, and optimizes — the uncertainty consumer the
reference never had (its getFinalHessian is exposed but unused).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

from fast_gicp_tpu import optimize_pose_graph, se3
from fast_gicp_tpu.models.pose_graph import PoseGraphConfig, edges_from_odometry


def main():
    rng = np.random.default_rng(1)
    # ground-truth square-ish loop
    k = 16
    step = np.float32([0, 0, 2 * np.pi / k, 1.0, 0, 0])
    T = np.eye(4)
    gt = []
    for _ in range(k):
        gt.append(T.copy())
        T = T @ np.asarray(se3.se3_exp(jnp.asarray(step)), np.float64)

    # noisy odometry edges -> drifted chain
    i, j, rel = edges_from_odometry(gt)
    noise = rng.normal(scale=0.02, size=(k - 1, 6)).astype(np.float32)
    rel = np.stack(
        [r @ np.asarray(se3.se3_exp(jnp.asarray(n)), np.float32)
         for r, n in zip(rel, noise)]
    )
    drifted = [np.eye(4)]
    for r in rel:
        drifted.append(drifted[-1] @ r.astype(np.float64))
    print(f"drift before optimization: "
          f"{np.linalg.norm(drifted[-1][:3, 3] - gt[-1][:3, 3]):.3f} m")

    # loop closure 0 -> k-1 (in practice: a registration between revisited
    # scans, with its LsqResult.hessian as the information matrix)
    lc = (np.linalg.inv(gt[0]) @ gt[-1]).astype(np.float32)
    edge_i = np.concatenate([i, [0]]).astype(np.int32)
    edge_j = np.concatenate([j, [k - 1]]).astype(np.int32)
    edge_rel = np.concatenate([rel, lc[None]])
    info = np.broadcast_to(np.eye(6, dtype=np.float32), (k, 6, 6)).copy()
    info[-1] *= 1e4  # trust the closure much more than odometry

    res = optimize_pose_graph(
        jnp.asarray(np.stack(drifted), jnp.float32),
        jnp.asarray(edge_i), jnp.asarray(edge_j), jnp.asarray(edge_rel),
        jnp.asarray(info), PoseGraphConfig(max_iterations=20),
    )
    opt = np.asarray(res.poses, np.float64)
    print(f"drift after optimization:  "
          f"{np.linalg.norm(opt[-1][:3, 3] - gt[-1][:3, 3]):.3f} m "
          f"(error {float(res.error):.4f}, {int(res.iterations)} GN iters)")


def main_sparse():
    """Large-scale back-end: 1000 keyframes through the block-sparse
    solver (chain-Schur preconditioned CG) — the dense solver's Hessian
    would be 36M entries here."""
    import numpy as np
    import jax.numpy as jnp

    from fast_gicp_tpu import se3
    from fast_gicp_tpu.models.pose_graph import edges_from_odometry
    from fast_gicp_tpu.models.pose_graph_sparse import (
        SparsePGConfig, optimize_pose_graph_sparse,
    )

    rng = np.random.default_rng(1)
    k = 1000
    step = np.asarray(
        se3.se3_exp(jnp.asarray(np.float32([0, 0, 0.006, 1.0, 0, 0]))),
        np.float64,
    )
    T = np.eye(4)
    gt = []
    for _ in range(k):
        gt.append(T.copy())
        T = T @ step
    i, j, rel = edges_from_odometry(gt)
    noise = rng.normal(scale=0.004, size=(k - 1, 6)).astype(np.float32)
    rel_noisy = np.einsum(
        "eij,ejk->eik", rel,
        np.asarray(se3.se3_exp(jnp.asarray(noise)), np.float32),
    )
    drifted = [np.eye(4)]
    for r in rel_noisy:
        drifted.append(drifted[-1] @ r.astype(np.float64))
    # cross-loop closures (the chain curves ~6 rad, so early/late frames
    # revisit each other)
    lc_i = (np.arange(10) * 25).astype(np.int32)
    lc_j = (k - 1 - np.arange(10) * 25).astype(np.int32)
    lc_rel = np.stack([
        (np.linalg.inv(gt[a]) @ gt[b]).astype(np.float32)
        for a, b in zip(lc_i, lc_j)
    ])
    edge_i = np.concatenate([i, lc_i]).astype(np.int32)
    edge_j = np.concatenate([j, lc_j]).astype(np.int32)
    edge_rel = np.concatenate([rel_noisy, lc_rel])
    info = np.broadcast_to(
        np.eye(6, dtype=np.float32), (len(edge_i), 6, 6)
    ).copy()
    info[k - 1:] *= 1e4

    print(f"sparse back-end: {k} keyframes, {len(edge_i)} edges; drift "
          f"{np.linalg.norm(drifted[-1][:3, 3] - gt[-1][:3, 3]):.2f} m")
    res = optimize_pose_graph_sparse(
        jnp.asarray(np.stack(drifted), jnp.float32),
        jnp.asarray(edge_i), jnp.asarray(edge_j), jnp.asarray(edge_rel),
        jnp.asarray(info), config=SparsePGConfig(max_iterations=15),
    )
    opt = np.asarray(res.poses, np.float64)
    print(f"after sparse optimization: "
          f"{np.linalg.norm(opt[-1][:3, 3] - gt[-1][:3, 3]):.3f} m "
          f"({int(res.iterations)} LM iters)")


if __name__ == "__main__":
    main()
    main_sparse()
