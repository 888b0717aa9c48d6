"""Fused Pallas linearize/error vs the SoA reference (runs on TPU only;
the CPU suite exercises the SoA fallback everywhere else)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="Pallas TPU kernels"
)


def test_fused_matches_soa(rng):
    from fast_gicp_tpu.ops import pallas_linearize, soa

    n = 2048
    p = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5)
    q = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5)
    A = rng.normal(size=(n, 3, 3)).astype(np.float32)
    covs_a = jnp.asarray(A @ np.swapaxes(A, 1, 2) + 0.3 * np.eye(3, dtype=np.float32))
    B = rng.normal(size=(n, 3, 3)).astype(np.float32)
    covs_b = jnp.asarray(B @ np.swapaxes(B, 1, 2) + 0.3 * np.eye(3, dtype=np.float32))
    counts = jnp.asarray(rng.integers(1, 20, n).astype(np.float32))
    valid = jnp.asarray(rng.uniform(size=n) > 0.25)
    from fast_gicp_tpu import se3

    x = se3.se3_exp(jnp.asarray(np.float32([0.1, -0.2, 0.05, 0.5, 1.0, -0.3])))
    R = x[:3, :3]

    # SoA reference
    P = soa.cols_from_points(p)
    CA = soa.sym_cols_from_covs(covs_a)
    CB = soa.sym_cols_from_covs(covs_b)
    M = soa.inv_sym_cols(CB + soa.rotate_sym_cols(R, CA)) * valid[None, :]
    w = jnp.sqrt(counts)
    Q = soa.cols_from_points(q)
    err_s, H_s, b_s = soa.linearize_cols(P, Q, M, w, valid)

    # fused kernel
    rows = jnp.concatenate(
        [q, np.asarray(covs_b).reshape(n, 9), counts[:, None],
         jnp.zeros((n, 3), jnp.float32)], axis=1
    )
    pad8 = lambda a: jnp.concatenate([a, jnp.zeros((8 - a.shape[0], n), a.dtype)])
    cr = soa.rotate_sym_cols(R, CA)
    err_f, H_f, b_f, aux = pallas_linearize.linearize_pallas(
        pad8(P), pad8(cr), rows.T,
        pad8(valid[None, :].astype(jnp.float32)),
    )
    np.testing.assert_allclose(float(err_f), float(err_s), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(H_f), np.asarray(H_s),
                               rtol=3e-3, atol=0.5)
    np.testing.assert_allclose(np.asarray(b_f), np.asarray(b_s),
                               rtol=3e-3, atol=0.5)

    # error kernel vs SoA error at a different pose
    x2 = se3.se3_exp(jnp.asarray(np.float32([0.02, 0.01, -0.03, 0.1, 0.2, 0])))
    P2 = soa.transform_cols(x2, P)
    e_soa = soa.error_cols(P2, Q, M, w, valid)
    e_fused = pallas_linearize.error_pallas(pad8(P2), aux)
    np.testing.assert_allclose(float(e_fused), float(e_soa), rtol=1e-4)
