"""Loop-closure detection for the mini-SLAM stack.

The reference has no SLAM back-end at all (it is a registration library;
scan-to-scan only, fast_vgicp_impl.hpp:66-70) — closure detection is new
TPU-native capability layered on this repo's own primitives: candidate
generation from the odometry trajectory (revisit proximity with a temporal
guard), geometric verification by coarse-to-fine registration (NDT D2D wide
basin -> VGICP refine, both jitted device solves), and a fitness gate.
Accepted closures carry the refine solve's final Hessian as the edge
information matrix, ready for `optimize_pose_graph[_sparse]`.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class LoopClosureConfig(NamedTuple):
    # candidate generation
    min_gap: int = 10          # frames between i and j (skip odometry edges)
    radius: float = 3.0        # m between poses to call it a revisit
    max_candidates: int = 8    # verify at most this many (nearest first)
    # geometric verification
    downsample: float = 0.25
    coarse_resolution: float = 4.0   # NDT D2D basin for drifted guesses
    refine_resolution: float = 1.0   # VGICP refine
    fitness_max: float = 0.5         # m^2 mean-NN-sq gate on the refined pose


class LoopClosure(NamedTuple):
    i: int
    j: int
    relative: np.ndarray     # 4x4, T_i^-1 T_j as measured by registration
    information: np.ndarray  # 6x6 (refine solve final Hessian)
    fitness: float


def find_loop_candidates(poses, config: LoopClosureConfig = LoopClosureConfig()):
    """Revisit candidates (i, j), i < j, from pose proximity.

    Host-side O(K^2) over keyframe translations (K is small — keyframes,
    not scans).  Greedy: for each j, only its NEAREST admissible i is
    proposed (one closure per revisit site is what the pose graph needs),
    candidates ordered by distance.
    """
    t = np.stack([np.asarray(p)[:3, 3] for p in poses])
    k = len(t)
    cands = []
    for j in range(k):
        lo = j - config.min_gap
        if lo <= 0:
            continue
        d = np.linalg.norm(t[:lo] - t[j], axis=1)
        i = int(np.argmin(d))
        if d[i] < config.radius:
            cands.append((float(d[i]), i, j))
    cands.sort()
    return [(i, j) for _, i, j in cands[: config.max_candidates]]


def verify_closure(
    scan_i,
    scan_j,
    guess,
    config: LoopClosureConfig = LoopClosureConfig(),
):
    """Geometric verification: register scan_j against scan_i coarse-to-fine
    from the (drifted) odometry guess.  Returns a LoopClosure-shaped tuple
    (relative, information, fitness, ok)."""
    import jax.numpy as jnp

    from ..models.metrics import fitness_score
    from ..models.ndt import NDTConfig, ndt_align
    from ..models.vgicp import VGICPConfig, vgicp_register
    from ..ops.voxelmap import auto_grid_dims
    from ..utils.downsample import voxel_downsample
    from ..utils.padding import pad_points

    ci = voxel_downsample(scan_i, config.downsample)
    cj = voxel_downsample(scan_j, config.downsample)
    sp, sm = map(jnp.asarray, pad_points(cj))
    tp, tm = map(jnp.asarray, pad_points(ci))
    g = jnp.asarray(np.asarray(guess, np.float32))
    coarse = ndt_align(
        sp, sm, tp, tm, g, NDTConfig(resolution=config.coarse_resolution)
    )
    refined = vgicp_register(
        sp, sm, tp, tm, coarse.transformation,
        VGICPConfig(
            resolution=config.refine_resolution,
            grid_dims=auto_grid_dims(ci, config.refine_resolution),
        ),
    )
    fit = float(fitness_score(refined.transformation, sp, sm, tp, tm))
    ok = bool(refined.converged) and fit <= config.fitness_max
    return (
        np.asarray(refined.transformation, np.float32),
        np.asarray(refined.hessian, np.float32),
        fit,
        ok,
    )


def detect_loop_closures(
    scans,
    poses,
    config: LoopClosureConfig = LoopClosureConfig(),
):
    """Find-and-verify: candidates from the trajectory, verification by
    registration.  Returns accepted `LoopClosure`s (possibly empty)."""
    closures = []
    for i, j in find_loop_candidates(poses, config):
        guess = np.linalg.inv(np.asarray(poses[i])) @ np.asarray(poses[j])
        rel, info, fit, ok = verify_closure(
            scans[i], scans[j], guess.astype(np.float32), config
        )
        if ok:
            closures.append(
                LoopClosure(i=i, j=j, relative=rel, information=info,
                            fitness=fit)
            )
    return closures
