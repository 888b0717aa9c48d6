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

from . import linalg3, pallas_kernels, soa
from .neighbors import _pick_chunk, knn_search, knn_search_culled

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
        # Closed-form eigenvalue clamp in sym-6 column layout
        # (soa.clamp_eigs_cols) — jnp.linalg.eigh's iterative LAPACK path
        # costs ~13 ms per 18k AoS covariances on the v5e vs ~0.2 ms here;
        # this regularization runs on every NDT voxel-map build
        # (ndt_cuda.cu:120-140).
        covs = linalg3.symmetrize(covs)
        C6 = soa.sym_cols_from_covs(covs)
        if method == "min_eig":
            out6 = soa.clamp_eigs_cols(C6, 1e-3)
        else:
            # V max(w / w_big, eps) V^T  ==  clamp(A / e_big, eps)
            _, _, e_big = soa.eigvals_sym_cols(C6)
            nrm = jnp.maximum(jnp.abs(e_big), 1e-30)[..., None, :]
            out6 = soa.clamp_eigs_cols(C6 / nrm, 1e-3)
        return soa.sym_cols_to_rows9(out6).reshape(covs.shape)
    raise ValueError(f"unknown regularization method: {method}")


def estimate_covariance_cols(
    points,
    mask,
    method: str,
    k: int = 20,
    regularization: str = "plane",
    kernel_width: float = 0.5,
    kernel_max_dist: float = 3.0,
):
    """In-graph covariance estimation selector, sym-6 columns (6, N).

    The traceable twin of `models.base.estimate_covariances` for the
    one-dispatch fresh-registration paths ("kdtree" needs the host and is
    excluded): on the remote-TPU tunnel every separate jit call costs
    ~1.5 ms of dispatch, so fresh class-API aligns fuse estimation + align
    into ONE call (gicp_register_fresh / vgicp_register_fresh)."""
    if method == "knn":
        return knn_covariance_cols(points, mask, k=k, method=regularization)
    if method == "rbf":
        return rbf_covariance_cols(
            points, mask, kernel_width=kernel_width,
            max_dist=kernel_max_dist, method=regularization,
        )
    if method == "adaptive":
        return adaptive_radius_covariance_cols(
            points, mask, k=k, method=regularization
        )
    raise ValueError(f"no in-graph estimator for method: {method}")


def _knn_moment_cols_fused(points, mask, k, cand_tile=128, cand_tiles=16,
                           interpret=False):
    """Raw kNN moment rows (10, N) + k-th distances via the fused
    selection+moments kernel (pallas_kernels.knn_moments_pallas): the
    (N, k) index array, its HBM gather, and the AoS moment epilogue never
    exist.  Returns (mom, kth_sq, excluded_sq) — mom rows are
    [count, sum y (3), sym-6 sum yy^T] about per-tile local origins
    (center-invariant covariance finalize only)."""
    from .neighbors import _masked_target, select_candidate_tiles

    n = points.shape[0]
    Q = n // pallas_kernels._KNN_TILE
    T = n // cand_tile
    tgt = _masked_target(points, mask)
    cidx, excluded_sq = select_candidate_tiles(
        points.reshape(Q, pallas_kernels._KNN_TILE, 3),
        tgt.reshape(T, cand_tile, 3),
        min(cand_tiles, T),
    )
    mom, kth = pallas_kernels.knn_moments_pallas(
        points, jnp.ones(n, bool), points, mask, cidx, k,
        cand_tile=cand_tile, interpret=interpret,
    )
    return mom, kth, excluded_sq


def _finalize_mom_cols(mom):
    """(10, N) raw moment rows -> (6, N) sym covariance columns (divides
    by the valid-neighbor count like the gather epilogue; the reference
    divides by k, identical whenever the cloud has >= k valid points)."""
    cnt = jnp.maximum(mom[0], 1.0)
    inv = 1.0 / cnt
    mean = mom[1:4] * inv
    return jnp.stack(
        [
            mom[4] * inv - mean[0] * mean[0],
            mom[5] * inv - mean[0] * mean[1],
            mom[6] * inv - mean[0] * mean[2],
            mom[7] * inv - mean[1] * mean[1],
            mom[8] * inv - mean[1] * mean[2],
            mom[9] * inv - mean[2] * mean[2],
        ],
        axis=0,
    )


@f32_matmuls
def knn_covariance_cols(
    points,
    mask,
    k: int = 20,
    method: str = "plane",
    chunk_size: int = 1024,
    approx: bool = True,
):
    """kNN covariances as SYM-6 COLUMNS (6, N) — the fast path of
    `knn_covariances` (same statistic, no (N, 3, 3) AoS intermediate:
    each AoS elementwise op pads to (N, 8, 128) tiles on TPU, and the AoS
    plane regularization alone costs ~1.3 ms at 16k points vs ~0.1 in
    columns).

    approx=True on tile-aligned TPU clouds runs the fused
    selection+moments kernel (`pallas_kernels.knn_moments_pallas`) over
    bbox-culled candidate slabs; CPU tile-aligned clouds take the
    tile-culled candidate search (`neighbors.knn_search_culled`); other
    shapes fall back to the blocked full search.  See `knn_covariances`
    for the exactness contract.
    """
    import os

    n = points.shape[0]
    if (
        approx
        and n % 256 == 0
        and n >= 512
        and jax.default_backend() == "tpu"
        and not os.environ.get("FAST_GICP_TPU_NO_FUSED")  # kernel kill switch
        and method in ("plane", "none")
    ):
        mom, kth, excl = _knn_moment_cols_fused(points, mask, k)
        if os.environ.get("FAST_GICP_TPU_KNN_CERT"):
            # Advisor round-4: the fused path has no per-point exactness
            # certificate surfaced by default — opt-in observability so
            # recall regressions on unusual clouds are visible.  A point
            # is CERTIFIED exact when its k-th kept distance is <= the
            # nearest excluded candidate tile's bound.
            tile = kth.shape[0] // excl.shape[0]
            cert = kth.reshape(excl.shape[0], tile) <= excl[:, None]
            frac = jnp.sum(
                (cert.reshape(-1) & mask).astype(jnp.float32)
            ) / jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
            jax.debug.print(
                "knn_covariance_cols certificate fraction: {f:.4f} "
                "(n={n}, k={k})", f=frac, n=points.shape[0], k=k,
            )
        cov6 = _finalize_mom_cols(mom)
        if method == "plane":
            return soa.plane_covs_cols(cov6)
        return cov6
    if approx and n % 256 == 0 and n >= 512:
        idx, sq, _cert = knn_search_culled(points, points, mask, k=k)
    elif approx and n >= 4096:
        import warnings

        warnings.warn(
            f"knn covariance on a non-256-multiple cloud ({n} points): "
            "falling back to approx_min_k (~98% recall, no exactness "
            "certificate). Pad to a 256 multiple for the culled path or "
            "pass approx=False for the exact search.",
            RuntimeWarning,
            stacklevel=2,
        )
        idx, sq = knn_search(
            points, points, mask, k=k, chunk_size=chunk_size, approx=True
        )
    else:
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
    c = (nbrs - mean[:, None, :]) * w[:, :, None]
    c0, c1, c2 = c[..., 0], c[..., 1], c[..., 2]
    inv = 1.0 / cnt
    cov6 = jnp.stack(
        [
            jnp.sum(c0 * c0, axis=-1) * inv,
            jnp.sum(c0 * c1, axis=-1) * inv,
            jnp.sum(c0 * c2, axis=-1) * inv,
            jnp.sum(c1 * c1, axis=-1) * inv,
            jnp.sum(c1 * c2, axis=-1) * inv,
            jnp.sum(c2 * c2, axis=-1) * inv,
        ],
        axis=0,
    )
    if method == "plane":
        return soa.plane_covs_cols(cov6)
    if method == "none":
        return cov6
    covs = soa.sym_cols_to_rows9(cov6).reshape(n, 3, 3)
    return soa.sym_cols_from_covs(regularize_covariances(covs, method))


@f32_matmuls
def knn_covariances(
    points,
    mask,
    k: int = 20,
    method: str = "plane",
    chunk_size: int = 1024,
    approx: bool = True,
):
    """kNN covariance per point, (N, 3, 3) AoS (includes self like the
    reference kdtree).

    cov_i = sum_j (x_j - mu)(x_j - mu)^T / k over the k nearest neighbors
    (fast_gicp_impl.hpp:259-265), then regularized.

    EXACTNESS CONTRACT (the reference kd-tree path is exact,
    fast_gicp_impl.hpp:257; the TPU default trades tail-neighbor recall
    for ~3x speed — see README "Exact vs approximate kNN"):

    * ``approx=False``: exact k-NN via the full blocked dense search on
      every shape/backend.  Reference-parity statistic.
    * ``approx=True`` (default), 256-multiple clouds of >= 512 points:
      the bbox-culled candidate path.  On TPU the fused
      selection+moments kernel searches the 16 nearest candidate tiles
      and breaks distance ties at 2^-11 relative quantization; off-TPU
      the slab search with a per-query exactness certificate
      (`neighbors.knn_search_culled`: certified queries provably have
      the exact neighbor set; ~96-97%% of realistic LiDAR queries,
      misses are sparse far-range tails).  Measured end-to-end
      registration (t_err/fitness on the bundled pair) is unchanged vs
      exact.
    * ``approx=True`` on any other shape: `lax.approx_min_k` full-row
      search (~98%% recall, no certificate); large clouds emit a
      RuntimeWarning at trace time so the degradation is never silent.

    The compute runs in sym-6 columns (`knn_covariance_cols`); prefer
    that entry point in device-resident pipelines.
    """
    cols = knn_covariance_cols(
        points, mask, k=k, method=method, chunk_size=chunk_size,
        approx=approx,
    )
    return soa.sym_cols_to_rows9(cols).reshape(points.shape[0], 3, 3)


def _rbf_moments_T(points, mask, kernel_width, max_dist, chunk_size=2048):
    """(13, N) raw RBF moment rows [sum_w, sum_wx (3), sum_wxx (9)] —
    fused Pallas on TPU, chunked XLA elsewhere."""
    n = points.shape[0]
    if pallas_kernels.supported(n):
        return pallas_kernels.rbf_moments_T(
            points, mask, kernel_width, max_dist
        )[:13]
    chunk_size = _pick_chunk(n, chunk_size)
    x = points
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

    return jax.lax.map(body, x.reshape(-1, chunk_size, 3)).reshape(n, 13).T


@f32_matmuls
def rbf_covariance_cols(
    points,
    mask,
    kernel_width: float = 0.5,
    max_dist: float = 3.0,
    method: str = "plane",
    chunk_size: int = 2048,
):
    """RBF kernel-density covariances as SYM-6 COLUMNS (6, N) — the fully
    SoA odometry hot path (same math as `rbf_covariances`; no (N, 3, 3)
    intermediate ever exists, which on TPU would pad to (N, 8, 128) tiles
    and dominate the epilogue cost).

    On the Pallas path the moments stay CENTERED on the cloud mean —
    covariances are translation-invariant, so the de-centering pass is
    skipped entirely (it only matters for callers that need raw moments).
    """
    from . import soa

    n = points.shape[0]
    if pallas_kernels.supported(n):
        m, _c = pallas_kernels.rbf_moments_centered_T(
            points, mask, kernel_width, max_dist
        )
    else:
        # Center before the fallback moment pass: the |q|^2-2qt distance
        # form and the xx^T moments both lose all precision at
        # survey-frame offsets (f32 eps x 1e8 at 1e4 m); the covariance
        # finalize below is center-invariant.
        mvalid = mask.astype(points.dtype)
        center = jnp.sum(points * mvalid[:, None], axis=0) / jnp.maximum(
            jnp.sum(mvalid), 1.0
        )
        m = _rbf_moments_T(
            points - center, mask, kernel_width, max_dist, chunk_size
        )
    inv_w = 1.0 / jnp.maximum(m[0], 1e-12)
    mean = [m[1] * inv_w, m[2] * inv_w, m[3] * inv_w]
    # sym-6 of the row-major 9: rows 4(xx) 5(xy) 6(xz) 8(yy) 9(yz) 12(zz);
    # symmetrized like the AoS path (bf16 products are pairwise identical,
    # but the chunked fallback's MXU accumulation is not exactly symmetric).
    cov6 = jnp.stack(
        [
            m[4] * inv_w - mean[0] * mean[0],
            0.5 * (m[5] + m[7]) * inv_w - mean[0] * mean[1],
            0.5 * (m[6] + m[10]) * inv_w - mean[0] * mean[2],
            m[8] * inv_w - mean[1] * mean[1],
            0.5 * (m[9] + m[11]) * inv_w - mean[1] * mean[2],
            m[12] * inv_w - mean[2] * mean[2],
        ],
        axis=0,
    )
    if method == "plane":
        return soa.plane_covs_cols(cov6)
    if method == "none":
        return cov6
    # cold regularization modes: go through the AoS machinery
    covs = soa.sym_cols_to_rows9(cov6).reshape(points.shape[0], 3, 3)
    return soa.sym_cols_from_covs(regularize_covariances(covs, method))


@f32_matmuls
def rbf_covariance_cols_vs(
    query,
    qmask,
    target,
    tmask,
    center,
    kernel_width: float = 0.5,
    max_dist: float = 3.0,
    chunk_size: int = 1024,
):
    """Cross-cloud RBF covariances as sym-6 columns (6, Nq): each QUERY
    point's kernel-density covariance over the TARGET cloud — the building
    block of the query-sharded multi-device covariance path (each device
    evaluates its N/D queries against the full gathered cloud: O(N^2/D)
    per device).  `center` must be the full cloud's mean (consistent
    across shards); covariances are center-invariant."""
    from . import soa

    nq = query.shape[0]
    nt = target.shape[0]
    if pallas_kernels.supported(nt) and nq % pallas_kernels._RQT == 0:
        m = pallas_kernels.rbf_cross_moments_centered_T(
            query, qmask, target, tmask, kernel_width, max_dist, center
        )
    else:
        # chunked XLA fallback (CPU mesh simulation)
        yq = query - center
        yt = (target - center) * tmask.astype(query.dtype)[:, None]
        t0, t1, t2 = yt[:, 0], yt[:, 1], yt[:, 2]
        feats = jnp.stack(
            [tmask.astype(query.dtype), t0, t1, t2,
             t0 * t0, t0 * t1, t0 * t2,
             t1 * t0, t1 * t1, t1 * t2,
             t2 * t0, t2 * t1, t2 * t2], axis=1,
        )  # (Nt, 13)
        md_sq = max_dist * max_dist
        chunk_size = _pick_chunk(nq, chunk_size)

        def body(q):
            d = jnp.sum(
                (q[:, None, :] - (target - center)[None, :, :]) ** 2, -1
            )
            w = jnp.where(
                (d <= md_sq) & tmask[None, :],
                jnp.exp(-kernel_width * d), 0.0,
            )
            return jnp.dot(w, feats, precision=_PRECISION)

        m = jax.lax.map(
            body, yq.reshape(-1, chunk_size, 3)
        ).reshape(nq, 13).T
    inv_w = 1.0 / jnp.maximum(m[0], 1e-12)
    mean = [m[1] * inv_w, m[2] * inv_w, m[3] * inv_w]
    cov6 = jnp.stack(
        [
            m[4] * inv_w - mean[0] * mean[0],
            0.5 * (m[5] + m[7]) * inv_w - mean[0] * mean[1],
            0.5 * (m[6] + m[10]) * inv_w - mean[0] * mean[2],
            m[8] * inv_w - mean[1] * mean[1],
            0.5 * (m[9] + m[11]) * inv_w - mean[1] * mean[2],
            m[12] * inv_w - mean[2] * mean[2],
        ],
        axis=0,
    )
    return soa.plane_covs_cols(cov6)


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
    never leave VMEM, ~3.5x faster); the chunked-XLA path is the fallback
    for CPU tests and odd sizes.  plane/none (the hot methods) run fully
    SoA via `rbf_covariance_cols`; only the final (N, 3, 3) product is AoS.
    """
    from . import soa

    n = points.shape[0]
    if method in ("plane", "none"):
        cols = rbf_covariance_cols(
            points, mask, kernel_width, max_dist, method, chunk_size
        )
        return soa.sym_cols_to_rows9(cols).reshape(n, 3, 3)
    # Cold regularization modes: center before the moment pass (the
    # E[xx^T] - mu mu^T finalize cancels catastrophically at survey-frame
    # offsets; covariances are translation-invariant).
    mvalid = mask.astype(points.dtype)
    center = jnp.sum(points * mvalid[:, None], axis=0) / jnp.maximum(
        jnp.sum(mvalid), 1.0
    )
    m = _rbf_moments_T(
        points - center, mask, kernel_width, max_dist, chunk_size
    )
    moments = m.T  # (N, 13)
    sum_w = jnp.maximum(moments[:, 0:1], 1e-12)
    sum_wx = moments[:, 1:4]
    sum_wxx = moments[:, 4:13].reshape(n, 3, 3)
    mean = sum_wx / sum_w
    cov = (sum_wxx - mean[:, :, None] * sum_wx[:, None, :]) / sum_w[..., None]
    return regularize_covariances(linalg3.symmetrize(cov), method)


def default_radius_ladder(r0: float = 0.04, ratio: float = 1.3,
                          num: int = 20):
    """Squared-radius ladder for the adaptive-radius estimator: geometric
    radii r0 * ratio^l (0.04 m .. ~5.9 m by default — spans dense indoor
    to sparse long-range LiDAR neighborhoods)."""
    import numpy as np

    r = r0 * ratio ** np.arange(num)
    return (r * r).astype(np.float32)


def _radius_window_moments_xla(points, mask, r2_ladder, k, center,
                               chunk_size=1024):
    """Chunked-XLA fallback with the exact ladder semantics of
    `pallas_kernels.radius_window_moments_T` (CPU tests / odd sizes)."""
    n = points.shape[0]
    L = r2_ladder.shape[0]
    f32 = points.dtype
    tvalid = mask.astype(f32)
    y = points - center
    yt = jnp.where(mask[:, None], y, 1.0e9)
    t0, t1, t2 = (y[:, i] * tvalid for i in range(3))
    zero = jnp.zeros((n,), f32)
    feats = jnp.stack(
        [tvalid, t0, t1, t2,
         t0 * t0, t0 * t1, t0 * t2,
         t1 * t0, t1 * t1, t1 * t2,
         t2 * t0, t2 * t1, t2 * t2,
         zero, zero, zero], axis=1,
    )  # (N, 16)
    chunk_size = _pick_chunk(n, chunk_size)

    def body(q):
        d = jnp.sum((q[:, None, :] - yt[None, :, :]) ** 2, -1)  # (c, N)
        cnt = jnp.stack(
            [jnp.sum((d <= r2_ladder[l]).astype(f32), axis=1)
             for l in range(L)], axis=0,
        )  # (L, c)
        enough = cnt >= jnp.asarray(k, f32)
        first = jnp.argmax(enough, axis=0)
        rung = jnp.where(jnp.any(enough, axis=0), first, L - 1)
        iota = jnp.arange(L, dtype=rung.dtype)[:, None]
        r2_q = jnp.sum(
            jnp.where(iota == rung[None, :], r2_ladder[:, None], 0.0), axis=0
        )
        w = (d <= r2_q[:, None]).astype(f32)
        return jnp.dot(w, feats, precision=_PRECISION)  # (c, 16)

    return jax.lax.map(body, y.reshape(-1, chunk_size, 3)).reshape(n, 16).T


@f32_matmuls
def adaptive_radius_covariance_cols(
    points,
    mask,
    k: int = 20,
    method: str = "plane",
    ladder=None,
):
    """k-th-NN windowed covariances as sym-6 columns (6, N) — the fast
    TPU-native replacement for `knn_covariances`.

    Instead of a top-k over every distance row (the reference kd-tree's
    nearestKSearch, fast_gicp_impl.hpp:257, or approx_min_k here), each
    point's k-th-neighbor distance is bracketed on a geometric radius
    ladder with a fused count kernel, and the covariance is the moment sum
    over ALL points inside that radius (count in [k, ~1.7k)).  Same spirit
    as the reference's own density-estimation covariance mode
    (covariance_estimation_rbf.cu) with a hard top-k-calibrated window;
    registration-grade equivalent to kNN covariances (the downstream
    plane regularization keeps only eigenvectors) at ~5x the speed.
    """
    from . import soa

    n = points.shape[0]
    r2 = jnp.asarray(
        default_radius_ladder() if ladder is None else ladder, jnp.float32
    )
    mvalid = mask.astype(points.dtype)
    center = jnp.sum(points * mvalid[:, None], axis=0) / jnp.maximum(
        jnp.sum(mvalid), 1.0
    )
    if pallas_kernels.supported(n):
        m = pallas_kernels.radius_window_moments_T(
            points, mask, points, mask, r2, k, center
        )
    else:
        m = _radius_window_moments_xla(points, mask, r2, k, center)
    inv_w = 1.0 / jnp.maximum(m[0], 1.0)
    mean = [m[1] * inv_w, m[2] * inv_w, m[3] * inv_w]
    cov6 = jnp.stack(
        [
            m[4] * inv_w - mean[0] * mean[0],
            0.5 * (m[5] + m[7]) * inv_w - mean[0] * mean[1],
            0.5 * (m[6] + m[10]) * inv_w - mean[0] * mean[2],
            m[8] * inv_w - mean[1] * mean[1],
            0.5 * (m[9] + m[11]) * inv_w - mean[1] * mean[2],
            m[12] * inv_w - mean[2] * mean[2],
        ],
        axis=0,
    )
    if method == "plane":
        return soa.plane_covs_cols(cov6)
    if method == "none":
        return cov6
    covs = soa.sym_cols_to_rows9(cov6).reshape(n, 3, 3)
    return soa.sym_cols_from_covs(regularize_covariances(covs, method))


@f32_matmuls
def adaptive_radius_covariances(
    points, mask, k: int = 20, method: str = "plane", ladder=None,
):
    """(N, 3, 3) AoS view of `adaptive_radius_covariance_cols`."""
    from . import soa

    cols = adaptive_radius_covariance_cols(points, mask, k, method, ladder)
    return soa.sym_cols_to_rows9(cols).reshape(points.shape[0], 3, 3)


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
knn_covariance_cols_jit = jax.jit(
    knn_covariance_cols,
    static_argnames=("k", "method", "chunk_size", "approx"),
)
rbf_covariances_jit = jax.jit(
    rbf_covariances, static_argnames=("method", "chunk_size")
)
rbf_covariance_cols_jit = jax.jit(
    rbf_covariance_cols, static_argnames=("method", "chunk_size")
)
covariances_from_neighbors_jit = jax.jit(
    covariances_from_neighbors, static_argnames=("method",)
)
adaptive_radius_covariances_jit = jax.jit(
    adaptive_radius_covariances, static_argnames=("k", "method")
)
