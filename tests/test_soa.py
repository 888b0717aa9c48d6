"""SoA (n-last) kernels must agree with the AoS reference ops exactly."""

import jax.numpy as jnp
import numpy as np

from fast_gicp_tpu import se3
from fast_gicp_tpu.ops import linalg3, soa
from fast_gicp_tpu.ops.reduction import error_reduce, linearize_reduce


def _rand_spd(rng, n):
    A = rng.normal(size=(n, 3, 3)).astype(np.float32)
    return (A @ np.swapaxes(A, 1, 2) + 0.5 * np.eye(3, dtype=np.float32)).astype(
        np.float32
    )


def _setup(rng, n=257):
    p = rng.normal(size=(n, 3)).astype(np.float32) * 5
    q = rng.normal(size=(n, 3)).astype(np.float32) * 5
    M = _rand_spd(rng, n)
    w = rng.uniform(0.5, 2.0, size=n).astype(np.float32)
    valid = rng.uniform(size=n) > 0.3
    return (jnp.asarray(a) for a in (p, q, M, w, valid))


def test_transform_cols(rng):
    p = rng.normal(size=(64, 3)).astype(np.float32)
    T = np.asarray(se3.se3_exp(jnp.asarray([0.1, -0.2, 0.3, 1.0, -2.0, 0.5])))
    aos = np.asarray(se3.transform_points(jnp.asarray(T), jnp.asarray(p)))
    cols = np.asarray(soa.transform_cols(jnp.asarray(T), soa.cols_from_points(jnp.asarray(p))))
    np.testing.assert_allclose(cols.T, aos, rtol=1e-6, atol=1e-6)


def test_rotate_sym_cols(rng):
    C = _rand_spd(rng, 33)
    T = np.asarray(se3.se3_exp(jnp.asarray([0.3, 0.1, -0.4, 0, 0, 0])))
    R = jnp.asarray(T[:3, :3])
    aos = np.asarray(se3.rotate_covs(R, jnp.asarray(C)))
    got = np.asarray(soa.rotate_sym_cols(R, soa.sym_cols_from_covs(jnp.asarray(C))))
    exp = soa.sym_cols_from_covs(jnp.asarray(aos))
    np.testing.assert_allclose(got, np.asarray(exp), rtol=1e-5, atol=1e-6)


def test_inv_sym_cols(rng):
    C = _rand_spd(rng, 65)
    aos = np.asarray(linalg3.inv3(jnp.asarray(C)))
    got = np.asarray(soa.inv_sym_cols(soa.sym_cols_from_covs(jnp.asarray(C))))
    exp = np.asarray(soa.sym_cols_from_covs(jnp.asarray(aos)))
    np.testing.assert_allclose(got, exp, rtol=1e-4, atol=1e-5)


def test_error_cols_matches_aos(rng):
    p, q, M, w, valid = _setup(rng)
    aos = np.asarray(error_reduce(p, q, M, w, valid))
    got = np.asarray(
        soa.error_cols(
            soa.cols_from_points(p),
            soa.cols_from_points(q),
            soa.sym_cols_from_covs(M),
            w,
            valid,
        )
    )
    np.testing.assert_allclose(got, aos, rtol=1e-5)


def test_linearize_cols_matches_aos(rng):
    p, q, M, w, valid = _setup(rng)
    err_a, H_a, b_a = (np.asarray(x) for x in linearize_reduce(p, q, M, w, valid))
    err_s, H_s, b_s = (
        np.asarray(x)
        for x in soa.linearize_cols(
            soa.cols_from_points(p),
            soa.cols_from_points(q),
            soa.sym_cols_from_covs(M),
            w,
            valid,
        )
    )
    # f32 accumulation order differs between the stacked row-sum and the
    # AoS tensordot; bound the drift rather than demand bit equality.
    np.testing.assert_allclose(err_s, err_a, rtol=1e-5)
    np.testing.assert_allclose(H_s, H_a, rtol=2e-3, atol=1e-2)
    np.testing.assert_allclose(b_s, b_a, rtol=2e-3, atol=1e-2)
    np.testing.assert_allclose(H_s, H_s.T, rtol=1e-5, atol=1e-2)  # symmetric


def test_sym_cols_from_packed(rng):
    mean = rng.normal(size=(17, 3)).astype(np.float32)
    cov = _rand_spd(rng, 17)
    count = rng.integers(1, 9, size=17).astype(np.float32)
    rows = np.concatenate(
        [mean, cov.reshape(17, 9), count[:, None], np.zeros((17, 3), np.float32)],
        axis=1,
    )
    m, c, n = soa.sym_cols_from_packed(jnp.asarray(rows))
    np.testing.assert_allclose(np.asarray(m).T, mean)
    np.testing.assert_allclose(
        np.asarray(c), np.asarray(soa.sym_cols_from_covs(jnp.asarray(cov)))
    )
    np.testing.assert_allclose(np.asarray(n), count)


def test_clamp_eigs_cols_matches_eigh(rng):
    """Closed-form MIN_EIG clamp (clamp_eigs_cols) vs the eigh reference,
    including every degenerate shape: zero, isotropic, rank-1, rank-2,
    near-repeated eigenvalues above and below the clamp."""
    eps = 1e-3
    mats = [np.zeros((3, 3), np.float32)]
    mats.append(np.eye(3, dtype=np.float32) * 2.0)  # isotropic above eps
    mats.append(np.eye(3, dtype=np.float32) * 1e-5)  # isotropic below eps
    v = np.float32([1.0, 2.0, -1.0]); v /= np.linalg.norm(v)
    mats.append(np.outer(v, v).astype(np.float32))  # rank-1
    u = np.float32([0.0, 1.0, 2.0]); u -= u @ v * v; u /= np.linalg.norm(u)
    mats.append((np.outer(v, v) + 1e-6 * np.outer(u, u)).astype(np.float32))
    mats.append((np.outer(v, v) + (1.0 + 1e-6) * np.outer(u, u)).astype(np.float32))
    mats.extend(_rand_spd(np.random.default_rng(5), 64) * 1e-4)  # all clamp
    mats.extend(_rand_spd(np.random.default_rng(6), 64))  # none clamp
    A = np.stack(mats)
    C6 = soa.sym_cols_from_covs(jnp.asarray(A))
    got = np.asarray(soa.sym_cols_to_rows9(soa.clamp_eigs_cols(C6, eps))).reshape(
        -1, 3, 3
    )
    w, V = np.linalg.eigh(A.astype(np.float64))
    want = np.einsum("nij,nj,nkj->nik", V, np.maximum(w, eps), V)
    np.testing.assert_allclose(got, want, atol=5e-5)
