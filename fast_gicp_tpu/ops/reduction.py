"""Fused Mahalanobis linearization reduction: (error, H, b) in one pass.

This is the hot loop of every algorithm — the TPU equivalent of the
reference's OpenMP per-thread accumulators (fast_gicp_impl.hpp:169-211) and
the CUDA fused `thrust::transform_reduce` (compute_derivatives.cu:151-184,
ndt_compute_derivatives.cu:187-231).  Per correspondence, with
A = skew(p) (p = transformed source mean), e = q - p, M = Mahalanobis:

    J        = [A | -I]                      (3 x 6)
    err_i    = w * e^T M e
    b        = w * [ -p x (M e) ; -M e ]     (J^T M e, using A^T = -A)
    H blocks = w * [[-A(MA),  A M], [-(MA)^T(?),  M]]   (J^T M J)

computed with batched einsums and reduced with a single weighted tensordot;
XLA fuses the whole thing into one pass over the correspondence arrays.
Invalid correspondences carry M = 0 and contribute exact zeros, mirroring
compute_derivatives.cu:54-55.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..se3 import skew


def linearize_reduce(p, q, M, w, valid):
    """Weighted (err, H, b) reduction over correspondences.

    Args:
      p: (N, 3) transformed source means.
      q: (N, 3) target means.
      M: (N, 3, 3) Mahalanobis matrices (frozen at the linearization point).
      w: (N,) per-correspondence weights (1, sqrt(voxel n), or robust).
      valid: (N,) bool; invalid rows contribute zero.

    Returns: (err (), H (6, 6), b (6,)).
    """
    wv = jnp.where(valid, w, 0.0)
    e = q - p
    Me = jnp.einsum("nij,nj->ni", M, e)
    err = jnp.dot(wv, jnp.einsum("ni,ni->n", e, Me))

    A = skew(p)  # (N, 3, 3)
    MA = jnp.einsum("nij,njk->nik", M, A)
    H11 = -jnp.einsum("nij,njk->nik", A, MA)  # A^T M A
    H12 = jnp.einsum("nij,njk->nik", A, M)  # A^T M (-I) = A M
    # Assemble (N, 6, 6) then weighted-sum; XLA fuses this into the reduce.
    top = jnp.concatenate([H11, H12], axis=-1)
    bot = jnp.concatenate([jnp.swapaxes(H12, -1, -2), M], axis=-1)
    Hn = jnp.concatenate([top, bot], axis=-2)
    H = jnp.tensordot(wv, Hn, axes=1)

    b_top = -jnp.cross(p, Me)  # A^T M e
    bn = jnp.concatenate([b_top, -Me], axis=-1)
    b = jnp.tensordot(wv, bn, axes=1)
    return err, H, b


def error_reduce(p, q, M, w, valid):
    """Error-only evaluation against frozen M (LM inner trials); the
    equivalent of the reference's compute_error (fast_gicp_impl.hpp:217-240,
    compute_derivatives.cu:106-135)."""
    wv = jnp.where(valid, w, 0.0)
    e = q - p
    Me = jnp.einsum("nij,nj->ni", M, e)
    return jnp.dot(wv, jnp.einsum("ni,ni->n", e, Me))
