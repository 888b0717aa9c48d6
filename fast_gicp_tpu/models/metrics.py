"""Registration quality metrics."""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from .. import se3
from ..ops.neighbors import nn_search
from ..precision import f32_matmuls


@partial(jax.jit, static_argnames=("max_range",))
@f32_matmuls
def fitness_score(T, source, source_mask, target, target_mask, max_range=math.inf):
    """PCL-style fitness: mean squared 1-NN distance of the transformed
    source within max_range (pcl::Registration::getFitnessScore), as used in
    the reference benchmarks (align.cpp:45, :101)."""
    p_t = se3.transform_points(T, source)
    _, sq_dist = nn_search(p_t, target, target_mask)
    ok = source_mask & (sq_dist <= max_range * max_range)
    n = jnp.maximum(jnp.sum(ok), 1)
    return jnp.sum(jnp.where(ok, sq_dist, 0.0)) / n


def pose_error(gt: jnp.ndarray, est: jnp.ndarray):
    """(translation err, rotation err rad) of est vs gt — the reference test
    metric delta = gt^-1 est (gicp_test.cpp:73-78)."""
    delta = jnp.linalg.inv(gt) @ est
    t_err = jnp.linalg.norm(delta[:3, 3])
    r_err = se3.rotation_angle(delta[:3, :3])
    return t_err, r_err
