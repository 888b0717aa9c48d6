"""Unit tests for neighbor search, 3x3 linalg, covariance, reduction ops."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_gicp_tpu.ops import linalg3
from fast_gicp_tpu.ops.covariance import (
    knn_covariances,
    rbf_covariances,
    regularize_covariances,
)
from fast_gicp_tpu.ops.neighbors import knn_search, nn_search
from fast_gicp_tpu.ops.reduction import linearize_reduce


def _random_cloud(rng, n=512, pad=128):
    pts = rng.normal(size=(n, 3)).astype(np.float32) * 10.0
    padded = np.zeros((n + pad, 3), np.float32)
    padded[:n] = pts
    mask = np.zeros(n + pad, bool)
    mask[:n] = True
    return jnp.asarray(padded), jnp.asarray(mask), pts


def test_nn_search_matches_bruteforce(rng):
    q, qm, q_np = _random_cloud(rng, 256, 0)
    t, tm, t_np = _random_cloud(rng, 512, 128)
    idx, sqd = nn_search(q, t, tm, chunk_size=64)
    d = ((q_np[:, None, :] - t_np[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(idx), d.argmin(1))
    np.testing.assert_allclose(np.asarray(sqd), d.min(1), rtol=1e-3, atol=1e-3)


def test_nn_search_never_selects_padding(rng):
    t, tm, _ = _random_cloud(rng, 100, 28)
    q = jnp.asarray(rng.normal(size=(128, 3)).astype(np.float32) * 10)
    idx, _ = nn_search(q, t, tm, chunk_size=128)
    assert int(np.asarray(idx).max()) < 100


def test_knn_search_sorted_and_exact(rng):
    q, _, q_np = _random_cloud(rng, 128, 0)
    t, tm, t_np = _random_cloud(rng, 256, 0)
    idx, sqd = knn_search(q, t, tm, k=5, chunk_size=128)
    d = ((q_np[:, None, :] - t_np[None, :, :]) ** 2).sum(-1)
    expect = np.sort(d, axis=1)[:, :5]
    np.testing.assert_allclose(np.asarray(sqd), expect, rtol=1e-3, atol=1e-3)
    assert np.all(np.diff(np.asarray(sqd), axis=1) >= -1e-4)


def _voxel_sorted_cloud(rng, n, extent=20.0, res=0.5):
    """Cloud in voxel-key sorted order — the layout utils.downsample
    emits and the tile-culled search assumes for tight tile bboxes."""
    pts = (rng.random((n, 3)) * extent).astype(np.float32)
    keys = np.floor(pts / res).astype(np.int64)
    order = np.lexsort((keys[:, 2], keys[:, 1], keys[:, 0]))
    return pts[order]


def test_knn_search_culled_recall_and_certificate(rng):
    from fast_gicp_tpu.ops.neighbors import knn_search_culled

    n, k = 4096, 10
    pts = _voxel_sorted_cloud(rng, n)
    m = np.ones(n, bool)
    m[-100:] = False  # padded tail, targets masked
    p, mask = jnp.asarray(pts), jnp.asarray(m)
    idx_c, sq_c, cert = knn_search_culled(
        p, p, mask, k=k, cand_tiles=6, recall_target=1.0
    )
    idx_e, sq_e = knn_search(p, p, mask, k=k, approx=False)
    ic, ie = np.asarray(idx_c), np.asarray(idx_e)
    cert = np.asarray(cert)
    recalls = np.array([
        len(np.intersect1d(ic[i], ie[i])) / k
        for i in range(0, n - 100)
    ])
    assert recalls.mean() > 0.985, recalls.mean()
    # certified queries are EXACT: every true neighbor found
    certified_idx = np.nonzero(cert[: n - 100])[0]
    assert len(certified_idx) > 100
    assert recalls[certified_idx].min() == 1.0
    # distances are consistent with indices (squared distance recompute)
    i0 = 37
    d0 = ((pts[i0] - pts[ic[i0]]) ** 2).sum(-1)
    np.testing.assert_allclose(
        np.sort(np.asarray(sq_c)[i0]), np.sort(d0), rtol=1e-3, atol=1e-4
    )


def test_knn_slab_pallas_matches_xla_slab(rng):
    # interpret mode pins the TPU slab kernel's semantics against the
    # XLA candidate-slab path every CI run
    from fast_gicp_tpu.ops import pallas_kernels
    from fast_gicp_tpu.ops.neighbors import (
        _masked_target, knn_search_culled, select_candidate_tiles,
    )

    n, k, tile, C = 2048, 8, 256, 4
    pts = _voxel_sorted_cloud(rng, n, extent=15.0)
    m = np.ones(n, bool)
    m[-60:] = False
    p, mask = jnp.asarray(pts), jnp.asarray(m)
    qt = p.reshape(-1, tile, 3)
    tt = _masked_target(p, mask).reshape(-1, tile, 3)
    cidx, _ = select_candidate_tiles(qt, tt, C)
    idx_k, sq_k = pallas_kernels.knn_slab_pallas(
        p, jnp.ones(n, bool), p, mask, cidx, k, interpret=True
    )
    idx_x, sq_x, _ = knn_search_culled(
        p, p, mask, k=k, cand_tiles=C, recall_target=1.0
    )
    # same neighbor sets and distances (ordering may differ; the XLA path
    # computes |q|^2 - 2qt + |t|^2 whose cancellation carries ~eps*|q|^2
    # absolute noise vs the kernel's exact-relative (q-t)^2 form)
    np.testing.assert_allclose(
        np.asarray(sq_k), np.sort(np.asarray(sq_x), axis=1),
        rtol=1e-3, atol=1e-3,
    )
    ik, ix = np.asarray(idx_k), np.asarray(idx_x)
    mism = sum(
        len(np.setdiff1d(ik[i], ix[i])) for i in range(0, n - 60, 7)
    )
    assert mism == 0, mism
    # ascending output order (the kernel's contract)
    assert np.all(np.diff(np.asarray(sq_k), axis=1) >= -1e-6)

    # cand_tile=128 variant (finer candidate tiles, same query tiling):
    # full coverage (C = T) must reproduce the exact search
    CT = 128
    tt2 = _masked_target(p, mask).reshape(-1, CT, 3)
    cidx2, _ = select_candidate_tiles(qt, tt2, tt2.shape[0])
    idx_f, sq_f = pallas_kernels.knn_slab_pallas(
        p, jnp.ones(n, bool), p, mask, cidx2, k, cand_tile=CT,
        interpret=True,
    )
    from fast_gicp_tpu.ops.neighbors import knn_search

    idx_e, sq_e = knn_search(p, p, mask, k=k, approx=False)
    np.testing.assert_allclose(
        np.asarray(sq_f), np.asarray(sq_e), rtol=1e-3, atol=1e-3
    )


def test_select_candidate_tiles_exact_gaps(rng):
    # Regression: the bbox gap term `tlo - qhi` was paired on the wrong
    # axis (tlo[None,:,:] - qhi[None,:,:]) — with Q == T it silently used
    # target tile t's QUERY bbox, corrupting candidate ranking and the
    # exactness certificate.  Pin against a brute-force numpy gap, with
    # Q != T so the wrong pairing cannot even broadcast.
    from fast_gicp_tpu.ops.neighbors import select_candidate_tiles

    n, qtile, ttile, C = 1024, 256, 128, 3
    pts = _voxel_sorted_cloud(rng, n, extent=12.0)
    qt = jnp.asarray(pts).reshape(-1, qtile, 3)
    tt = jnp.asarray(pts).reshape(-1, ttile, 3)
    cidx, excluded_sq = select_candidate_tiles(qt, tt, C)

    qlo, qhi = pts.reshape(-1, qtile, 3).min(1), pts.reshape(-1, qtile, 3).max(1)
    tlo, thi = pts.reshape(-1, ttile, 3).min(1), pts.reshape(-1, ttile, 3).max(1)
    gap = np.maximum(
        0.0,
        np.maximum(qlo[:, None, :] - thi[None, :, :],
                   tlo[None, :, :] - qhi[:, None, :]),
    )
    gap_sq = (gap * gap).sum(-1)  # (Q, T)
    order = np.argsort(gap_sq, axis=1, kind="stable")
    got = np.sort(np.take_along_axis(gap_sq, np.asarray(cidx), 1), axis=1)
    want = np.sort(np.take_along_axis(gap_sq, order[:, :C], 1), axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(excluded_sq),
        np.take_along_axis(gap_sq, order[:, C : C + 1], 1)[:, 0],
        rtol=1e-5, atol=1e-6,
    )


def test_knn_moments_pallas_matches_packed_key_reference(rng):
    # interpret mode pins the fused selection+moments kernel against a
    # numpy emulation of its packed-key semantics (f32 distance bits with
    # the low 12 bits replaced by the slab lane index; k smallest keys).
    from fast_gicp_tpu.ops import covariance, pallas_kernels
    from fast_gicp_tpu.ops.neighbors import (
        _masked_target, select_candidate_tiles,
    )

    n, k, CT, C = 1024, 10, 128, 4
    pts = _voxel_sorted_cloud(rng, n, extent=10.0)
    m = np.ones(n, bool)
    m[-50:] = False
    p, mask = jnp.asarray(pts), jnp.asarray(m)
    Q, T = n // 256, n // CT
    tgt = _masked_target(p, mask)
    cidx, _ = select_candidate_tiles(
        p.reshape(Q, 256, 3), tgt.reshape(T, CT, 3), C
    )
    mom, kth = pallas_kernels.knn_moments_pallas(
        p, jnp.ones(n, bool), p, mask, cidx, k, cand_tile=CT,
        interpret=True,
    )

    # numpy reference with identical f32 distance arithmetic + key rule
    tgt_np = np.asarray(tgt, np.float32)
    valid_np = m.astype(np.float32)
    cidx_np = np.asarray(cidx)
    for i in range(0, n - 50, 29):
        qt_i = i // 256
        cand_ids = np.concatenate(
            [np.arange(c * CT, (c + 1) * CT) for c in cidx_np[qt_i]]
        )
        cand = tgt_np[cand_ids]
        d = np.float32(0)
        for a in range(3):
            dd = np.float32(pts[i, a]) - cand[:, a]
            d = d + dd * dd
        keys = (d.view(np.int32) & np.int32(-4096)) | np.arange(
            len(cand), dtype=np.int32
        )
        sel = np.argsort(keys, kind="stable")[:k]
        kth_ref = (keys[sel[-1]] & np.int32(-4096)).view(np.float32)
        np.testing.assert_allclose(float(kth[i]), max(kth_ref, 0.0),
                                   rtol=1e-6, atol=0)
        origin = pts[qt_i * 256].astype(np.float64)
        y = (cand[sel].astype(np.float64) - origin) * valid_np[
            cand_ids[sel], None
        ]
        v = valid_np[cand_ids[sel]]
        ref = np.array(
            [v.sum(), y[:, 0].sum(), y[:, 1].sum(), y[:, 2].sum(),
             (y[:, 0] * y[:, 0]).sum(), (y[:, 0] * y[:, 1]).sum(),
             (y[:, 0] * y[:, 2]).sum(), (y[:, 1] * y[:, 1]).sum(),
             (y[:, 1] * y[:, 2]).sum(), (y[:, 2] * y[:, 2]).sum()]
        )
        np.testing.assert_allclose(
            np.asarray(mom[:, i]), ref, rtol=1e-4, atol=1e-4
        )


def test_knn_moment_cols_fused_covariances_close_to_exact(rng):
    # End statistic check: fused-path covariances (interpret mode) agree
    # with the exact-kNN epilogue on all but the near-tie neighbor swaps.
    from fast_gicp_tpu.ops import covariance, soa

    n, k = 1024, 12
    pts = _voxel_sorted_cloud(rng, n, extent=10.0)
    p, mask = jnp.asarray(pts), jnp.ones(n, bool)
    mom, _kth, _excl = covariance._knn_moment_cols_fused(
        p, mask, k, cand_tile=128, cand_tiles=n // 128, interpret=True
    )
    got = covariance._finalize_mom_cols(mom)
    exact = soa.sym_cols_from_covs(
        knn_covariances(p, mask, k=k, method="none", approx=False)
    )
    diff = np.abs(np.asarray(got) - np.asarray(exact))
    # <2% of points may differ (quantized tie-breaking); the rest match
    frac = (diff.max(0) > 1e-3).mean()
    assert frac < 0.02, frac


def test_knn_exactness_contract(rng):
    """The documented exact-vs-approx contract (reference is exact,
    fast_gicp_impl.hpp:257): approx=False is exact on ANY shape;
    tile-aligned approx clouds take the certified culled path silently;
    large non-aligned approx clouds warn about the recall fallback."""
    import warnings

    from fast_gicp_tpu.ops.covariance import knn_covariances

    # exact path on a deliberately non-aligned shape
    n = 700
    pts = _voxel_sorted_cloud(rng, n, extent=8.0)
    p, mask = jnp.asarray(pts), jnp.ones(n, bool)
    got = np.asarray(knn_covariances(p, mask, k=8, method="none",
                                     approx=False))
    d = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d, axis=1, kind="stable")[:, :8]
    nbrs = pts[idx]
    mean = nbrs.mean(1)
    c = nbrs - mean[:, None, :]
    want = np.einsum("nki,nkj->nij", c, c) / 8
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    # large non-aligned cloud with approx=True warns (never silent)
    n2 = 4200
    pts2 = _voxel_sorted_cloud(rng, n2, extent=12.0)
    with pytest.warns(RuntimeWarning, match="approx_min_k"):
        knn_covariances(jnp.asarray(pts2), jnp.ones(n2, bool), k=8)

    # tile-aligned cloud: certified culled path, no warning
    n3 = 4096
    pts3 = _voxel_sorted_cloud(rng, n3, extent=12.0)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        knn_covariances(jnp.asarray(pts3), jnp.ones(n3, bool), k=8)


def test_knn_search_culled_dense_when_few_tiles(rng):
    # cand_tiles >= tile count -> identical to the exact dense search
    from fast_gicp_tpu.ops.neighbors import knn_search_culled

    n, k = 1024, 8
    pts = _voxel_sorted_cloud(rng, n, extent=8.0)
    p, mask = jnp.asarray(pts), jnp.ones(n, bool)
    idx_c, sq_c, cert = knn_search_culled(
        p, p, mask, k=k, cand_tiles=64, recall_target=1.0
    )
    idx_e, sq_e = knn_search(p, p, mask, k=k, approx=False)
    np.testing.assert_allclose(
        np.sort(np.asarray(sq_c), axis=1), np.asarray(sq_e),
        rtol=1e-3, atol=1e-4,
    )
    assert bool(np.all(np.asarray(cert)))


def test_inv3_and_det3(rng):
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    A = A @ A.transpose(0, 2, 1) + np.eye(3, dtype=np.float32) * 0.5
    inv = np.asarray(linalg3.inv3(jnp.asarray(A)))
    np.testing.assert_allclose(inv @ A, np.broadcast_to(np.eye(3), A.shape),
                               atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(linalg3.det3(jnp.asarray(A))), np.linalg.det(A), rtol=1e-3
    )


def test_eigvalsh3_matches_numpy(rng):
    A = rng.normal(size=(128, 3, 3)).astype(np.float32)
    A = (A + A.transpose(0, 2, 1)) / 2
    got = np.asarray(linalg3.eigvalsh3(jnp.asarray(A)))
    expect = np.linalg.eigvalsh(A.astype(np.float64))
    np.testing.assert_allclose(got, expect, rtol=1e-3, atol=1e-3)


def test_eigvalsh3_isotropic():
    A = jnp.broadcast_to(2.5 * jnp.eye(3), (4, 3, 3))
    np.testing.assert_allclose(np.asarray(linalg3.eigvalsh3(A)), 2.5, atol=1e-6)


def test_smallest_eigenvector(rng):
    # Build matrices with known smallest eigenvector.
    for _ in range(10):
        Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        evals = np.sort(rng.uniform(0.1, 5.0, size=3))
        A = (Q * evals) @ Q.T
        v = np.asarray(
            linalg3.smallest_eigenvector3(jnp.asarray(A.astype(np.float32)))
        )
        v_ref = Q[:, np.argsort(evals)[0]]
        assert abs(abs(v @ v_ref) - 1.0) < 1e-3


def test_regularize_plane(rng):
    A = rng.normal(size=(32, 3, 3)).astype(np.float32)
    covs = A @ A.transpose(0, 2, 1)
    out = np.asarray(regularize_covariances(jnp.asarray(covs), "plane"))
    w = np.linalg.eigvalsh(out)
    np.testing.assert_allclose(w[:, 0], 1e-3, rtol=1e-2)
    np.testing.assert_allclose(w[:, 1:], 1.0, rtol=1e-2)


def test_regularize_min_eig(rng):
    Q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    evals = np.array([1e-6, 0.5, 2.0])
    covs = ((Q * evals) @ Q.T).astype(np.float32)[None]
    out = np.asarray(regularize_covariances(jnp.asarray(covs), "min_eig"))
    w = np.linalg.eigvalsh(out[0])
    np.testing.assert_allclose(np.sort(w), [1e-3, 0.5, 2.0], rtol=1e-2, atol=1e-5)


def test_regularize_frobenius_spd(rng):
    A = rng.normal(size=(16, 3, 3)).astype(np.float32)
    covs = A @ A.transpose(0, 2, 1)
    out = np.asarray(regularize_covariances(jnp.asarray(covs), "frobenius"))
    assert np.all(np.linalg.eigvalsh(out) > 0)


def test_knn_covariances_plane_on_plane(rng):
    # Points on z=0 plane: PLANE regularization must give normal ~ z.
    pts = np.zeros((256, 3), np.float32)
    pts[:, :2] = rng.normal(size=(256, 2)) * 5
    p, m, _ = jnp.asarray(pts), jnp.ones(256, bool), None
    covs = np.asarray(knn_covariances(p, m, k=10, method="plane", chunk_size=128))
    # normal direction (z) should carry eigenvalue 1e-3
    np.testing.assert_allclose(covs[:, 2, 2], 1e-3, atol=1e-4)
    np.testing.assert_allclose(covs[:, 0, 0], 1.0, atol=1e-3)


def test_knn_covariances_match_numpy_reference(rng):
    # exact path vs a direct numpy transcription of the statistic
    # (fast_gicp_impl.hpp:259-265): moments about the neighbor mean / k,
    # then plane regularization; pins the cols-native compute path.
    from fast_gicp_tpu.ops import soa
    from fast_gicp_tpu.ops.covariance import knn_covariance_cols

    k = 8
    p, m, pts = _random_cloud(rng, 192, 64)
    cols = knn_covariance_cols(p, m, k=k, method="none", approx=False)
    got = np.asarray(soa.sym_cols_to_rows9(cols).reshape(-1, 3, 3))[:192]
    d = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    nn = np.argsort(d, axis=1)[:, :k]
    for i in range(0, 192, 17):
        nbrs = pts[nn[i]]
        mu = nbrs.mean(0)
        ref = (nbrs - mu).T @ (nbrs - mu) / k
        np.testing.assert_allclose(got[i], ref, rtol=1e-4, atol=1e-5)


def test_rbf_covariances_finite_and_plane(rng):
    pts = np.zeros((256, 3), np.float32)
    pts[:, :2] = rng.normal(size=(256, 2)) * 2
    covs = np.asarray(
        rbf_covariances(
            jnp.asarray(pts), jnp.ones(256, bool), method="plane", chunk_size=128
        )
    )
    assert np.isfinite(covs).all()
    np.testing.assert_allclose(covs[:, 2, 2], 1e-3, atol=1e-4)


def test_linearize_reduce_matches_loop(rng):
    n = 64
    p = rng.normal(size=(n, 3)).astype(np.float32)
    q = rng.normal(size=(n, 3)).astype(np.float32)
    A = rng.normal(size=(n, 3, 3)).astype(np.float32)
    M = A @ A.transpose(0, 2, 1)
    w = rng.uniform(0.5, 2.0, size=n).astype(np.float32)
    valid = rng.uniform(size=n) > 0.3

    err, H, b = linearize_reduce(
        jnp.asarray(p), jnp.asarray(q), jnp.asarray(M), jnp.asarray(w),
        jnp.asarray(valid),
    )

    def skew(v):
        return np.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])

    err_ref, H_ref, b_ref = 0.0, np.zeros((6, 6)), np.zeros(6)
    for i in range(n):
        if not valid[i]:
            continue
        e = q[i] - p[i]
        J = np.hstack([skew(p[i]), -np.eye(3)])
        err_ref += w[i] * e @ M[i] @ e
        H_ref += w[i] * J.T @ M[i] @ J
        b_ref += w[i] * J.T @ M[i] @ e
    np.testing.assert_allclose(float(err), err_ref, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(H), H_ref, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(b), b_ref, rtol=1e-3, atol=1e-3)
