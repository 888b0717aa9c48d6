"""Unit tests for neighbor search, 3x3 linalg, covariance, reduction ops."""

import jax.numpy as jnp
import numpy as np

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
