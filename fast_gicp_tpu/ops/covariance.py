"""Per-point covariance estimation + regularization.

Covers all three covariance paths of the reference:
  * kNN covariance (CPU kdtree loop fast_gicp_impl.hpp:244-298 and CUDA
    covariance_estimation.cu:16-51): neighbors' second moment about their
    mean, divided by k.
  * RBF kernel-density covariance (covariance_estimation_rbf.cu:40-151, the
    reference's fastest config): weighted moments with w = exp(-kw * d^2)
    gated by d <= max_dist — on TPU this is a dense (N x N) @ (N x 13)
    moment matmul, a pure MXU shape.
  * Regularization modes NONE / PLANE / MIN_EIG / NORMALIZED_MIN_EIG /
    FROBENIUS (fast_gicp_impl.hpp:267-297, covariance_regularization.cu).
    PLANE (the default) uses the rank-1 identity
    V diag(1,1,1e-3) V^T == I - (1 - 1e-3) v_min v_min^T, so it only needs
    the smallest eigenvector — closed form, no SVD.

Covariances are (N, 3, 3); the reference's 4x4 carriers have zero last
row/col, so the 3x3 math is exactly equivalent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import linalg3, pallas_kernels
from .neighbors import _pick_chunk, knn_search

from ..precision import f32_matmuls

_PRECISION = jax.lax.Precision.HIGHEST

REGULARIZATION_METHODS = (
    "none",
    "plane",
    "min_eig",
    "normalized_min_eig",
    "frobenius",
)


def regularize_covariances(covs, method: str):
    """Apply a reference regularization mode to (N, 3, 3) covariances."""
    if method == "none":
        return covs
    if method == "frobenius":
        # fast_gicp_impl.hpp:269-274: ((C + 1e-3 I)^-1 / ||.||_F)^-1
        lam = 1e-3
        C = covs + lam * jnp.eye(3, dtype=covs.dtype)
        C_inv = linalg3.inv3(C)
        nrm = jnp.sqrt(jnp.sum(C_inv * C_inv, axis=(-2, -1), keepdims=True))
        return linalg3.inv3(C_inv / nrm)
    if method == "plane":
        # values (1, 1, 1e-3): flatten the normal direction only.
        covs = linalg3.symmetrize(covs)
        v = linalg3.smallest_eigenvector3(covs)
        eye = jnp.eye(3, dtype=covs.dtype)
        return eye - (1.0 - 1e-3) * v[..., :, None] * v[..., None, :]
    if method in ("min_eig", "normalized_min_eig"):
        covs = linalg3.symmetrize(covs)
        w, V = jnp.linalg.eigh(covs)  # ascending
        if method == "min_eig":
            vals = jnp.maximum(w, 1e-3)
        else:
            vals = jnp.maximum(w / w[..., 2:3], 1e-3)
        return jnp.einsum("...ij,...j,...kj->...ik", V, vals, V)
    raise ValueError(f"unknown regularization method: {method}")


@f32_matmuls
def knn_covariances(
    points,
    mask,
    k: int = 20,
    method: str = "plane",
    chunk_size: int = 1024,
    approx: bool = True,
):
    """kNN covariance per point (includes self like the reference kdtree).

    cov_i = sum_j (x_j - mu)(x_j - mu)^T / k over the k nearest neighbors
    (fast_gicp_impl.hpp:259-265), then regularized.  approx=True (default)
    uses the TPU-native approx_min_k neighbor search (~98% recall) — the
    covariance statistic is insensitive to the tail neighbors.
    """
    idx, sq = knn_search(
        points, points, mask, k=k, chunk_size=chunk_size, approx=approx
    )
    # Clouds with fewer than k valid points return masked sentinels (huge
    # distances) among the k; weight them out or the zero padding they
    # index would drag every covariance toward the origin.
    w = (sq < 1e17).astype(points.dtype)  # (N, k)
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    nbrs = points[idx]  # (N, k, 3)
    mean = jnp.einsum("nk,nki->ni", w, nbrs) / cnt[:, None]
    centered = (nbrs - mean[:, None, :]) * w[:, :, None]
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / cnt[:, None, None]
    return regularize_covariances(cov, method)


@f32_matmuls
def rbf_covariances(
    points,
    mask,
    kernel_width: float = 0.5,
    max_dist: float = 3.0,
    method: str = "plane",
    chunk_size: int = 2048,
):
    """RBF kernel-density covariances — the dense-matmul covariance path.

    For each query q: w_j = exp(-kernel_width * |q - x_j|^2) if
    |q - x_j| <= max_dist else 0; mean = sum w x / sum w;
    cov = (sum w x x^T - mean (sum w x)^T) / sum w
    (covariance_estimation_rbf.cu:40-84).  Defaults match
    fast_vgicp_cuda_impl.hpp:24-31 (kernel_width=0.5, max_dist=3.0).

    Phrased as one (chunk, N) weight tile times an (N, 13) moment feature
    matrix [1 | x | x outer x] so the accumulation runs on the MXU.  On TPU
    the whole moment pass runs as one fused Pallas kernel (distance tiles
    never leave VMEM, ~3.5x faster); the chunked-XLA path below is the
    fallback for CPU tests and odd sizes.
    """
    n = points.shape[0]
    if pallas_kernels.supported(n):
        moments = pallas_kernels.rbf_moments_pallas(
            points, mask, kernel_width, max_dist
        )
        sum_w = jnp.maximum(moments[:, 0:1], 1e-12)
        sum_wx = moments[:, 1:4]
        sum_wxx = moments[:, 4:13].reshape(n, 3, 3)
        mean = sum_wx / sum_w
        cov = (sum_wxx - mean[:, :, None] * sum_wx[:, None, :]) / sum_w[..., None]
        return regularize_covariances(linalg3.symmetrize(cov), method)
    chunk_size = _pick_chunk(n, chunk_size)
    x = points
    # Moment features: [1, x, vec(x x^T)] -> 13 columns.
    outer = (x[:, :, None] * x[:, None, :]).reshape(n, 9)
    feats = jnp.concatenate([jnp.ones((n, 1), x.dtype), x, outer], axis=1)
    x_sq = jnp.sum(x * x, axis=-1)
    max_dist_sq = max_dist * max_dist
    valid = mask.astype(x.dtype)

    def body(q):
        d = (
            jnp.sum(q * q, axis=-1)[:, None]
            - 2.0 * jnp.dot(q, x.T, precision=_PRECISION)
            + x_sq[None, :]
        )
        w = jnp.exp(-kernel_width * d)
        w = jnp.where(d <= max_dist_sq, w, 0.0) * valid[None, :]
        return jnp.dot(w, feats, precision=_PRECISION)  # (chunk, 13)

    moments = jax.lax.map(body, x.reshape(-1, chunk_size, 3)).reshape(n, 13)
    sum_w = moments[:, 0:1]
    sum_wx = moments[:, 1:4]
    sum_wxx = moments[:, 4:13].reshape(n, 3, 3)
    safe_w = jnp.maximum(sum_w, 1e-12)
    mean = sum_wx / safe_w
    cov = (sum_wxx - mean[:, :, None] * sum_wx[:, None, :]) / safe_w[..., None]
    return regularize_covariances(cov, method)


@f32_matmuls
def covariances_from_neighbors(points, neighbor_idx, method: str = "plane"):
    """Covariances from externally supplied kNN indices (N, k) — the device
    half of the reference's CPU_PARALLEL_KDTREE path: host kd-tree feeds a
    flat neighbor array, device does moments + regularization
    (fast_vgicp_cuda_impl.hpp:152-167 + covariance_estimation.cu:16-51)."""
    k = neighbor_idx.shape[1]
    nbrs = points[neighbor_idx]
    mean = jnp.mean(nbrs, axis=1)
    centered = nbrs - mean[:, None, :]
    cov = jnp.einsum("nki,nkj->nij", centered, centered) / k
    return regularize_covariances(cov, method)


# Pre-jitted entry points for the class API: covariance estimation is called
# from host code per cloud; without jit every op dispatches eagerly through
# the runtime (observed ~100x slowdown on the TPU tunnel).
knn_covariances_jit = jax.jit(
    knn_covariances, static_argnames=("k", "method", "chunk_size", "approx")
)
rbf_covariances_jit = jax.jit(
    rbf_covariances, static_argnames=("method", "chunk_size")
)
covariances_from_neighbors_jit = jax.jit(
    covariances_from_neighbors, static_argnames=("method",)
)
