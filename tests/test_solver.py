"""LM/GN driver tests on a synthetic point-to-point objective with a known
optimum (the solver is algorithm-agnostic; models plug in linearize/error)."""

import jax
import jax.numpy as jnp
import numpy as np

from fast_gicp_tpu import se3
from fast_gicp_tpu.solver import LsqConfig, lsq_solve
from fast_gicp_tpu.ops.reduction import error_reduce, linearize_reduce


def make_point_objective(source, target):
    """Point-to-point least squares (M = I): e_i = q_i - T p_i."""
    n = source.shape[0]
    M = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    w = jnp.ones(n, jnp.float32)
    valid = jnp.ones(n, bool)

    def linearize(x):
        p_t = se3.transform_points(x, source)
        err, H, b = linearize_reduce(p_t, target, M, w, valid)
        return err, H, b, ()

    def error(x, _aux):
        p_t = se3.transform_points(x, source)
        return error_reduce(p_t, target, M, w, valid)

    return linearize, error


def _setup(rng, n=256, twist_scale=0.2):
    src = rng.normal(size=(n, 3)).astype(np.float32) * 5.0
    xi = (rng.normal(size=6) * twist_scale).astype(np.float32)
    T_true = se3.se3_exp(jnp.asarray(xi))
    tgt = se3.transform_points(T_true, jnp.asarray(src))
    return jnp.asarray(src), tgt, np.asarray(T_true)


def test_lm_recovers_pose(rng):
    src, tgt, T_true = _setup(rng)
    lin, err = make_point_objective(src, tgt)
    res = lsq_solve(lin, err, jnp.eye(4, dtype=jnp.float32), LsqConfig())
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.transformation), T_true, atol=2e-4)
    assert float(res.error) >= 0


def test_gn_recovers_pose(rng):
    src, tgt, T_true = _setup(rng)
    lin, err = make_point_objective(src, tgt)
    res = lsq_solve(
        lin, err, jnp.eye(4, dtype=jnp.float32), LsqConfig(optimizer="gn")
    )
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.transformation), T_true, atol=2e-4)


def test_solver_is_jittable(rng):
    src, tgt, _ = _setup(rng)
    lin, err = make_point_objective(src, tgt)

    @jax.jit
    def run(guess):
        return lsq_solve(lin, err, guess, LsqConfig())

    res = run(jnp.eye(4, dtype=jnp.float32))
    assert bool(res.converged)
    assert int(res.iterations) < 64


def test_lm_from_far_guess(rng):
    src, tgt, T_true = _setup(rng, twist_scale=0.5)
    lin, err = make_point_objective(src, tgt)
    guess = se3.se3_exp(jnp.asarray(np.float32([0.1, -0.1, 0.2, 1.0, 0.5, -0.5])))
    res = lsq_solve(lin, err, guess, LsqConfig())
    assert bool(res.converged)
    np.testing.assert_allclose(np.asarray(res.transformation), T_true, atol=5e-4)


def test_hessian_is_spd_at_optimum(rng):
    src, tgt, _ = _setup(rng)
    lin, err = make_point_objective(src, tgt)
    res = lsq_solve(lin, err, jnp.eye(4, dtype=jnp.float32), LsqConfig())
    H = np.asarray(res.hessian)
    np.testing.assert_allclose(H, H.T, rtol=1e-4, atol=1e-3)
    assert np.all(np.linalg.eigvalsh(H) > 0)


def test_lm_trial_pallas_matches_xla():
    """The fused trial-step kernel (interpret mode on CPU) against the
    solver's XLA math: refined Cholesky solve, se3_exp (incl. the Taylor
    small-angle branch), compose, and the rho denominator.

    Local fixed rng (NOT the session fixture): the 1e-5 pose tolerance
    sits close to f32 noise, and the shared sequential stream made the
    draw depend on which other tests ran first."""
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(1234)

    from fast_gicp_tpu import se3
    from fast_gicp_tpu.ops import pallas_solver
    from fast_gicp_tpu.ops import linalg3
    from fast_gicp_tpu.solver import _solve_refined

    for scale, lam in ((1.0, 0.37), (1e-8, 0.0), (50.0, 3.0)):
        A = rng.normal(size=(6, 6)).astype(np.float32)
        H = jnp.asarray(A @ A.T + 2.0 * np.eye(6, dtype=np.float32))
        b = jnp.asarray(rng.normal(size=6).astype(np.float32) * scale)
        x = jnp.asarray(np.asarray(
            se3.se3_exp(jnp.asarray(
                rng.normal(size=6).astype(np.float32) * 0.3))))
        lamj = jnp.asarray(lam, jnp.float32)

        d_ref = _solve_refined(H + lamj * jnp.eye(6, dtype=jnp.float32), -b)
        delta_ref = se3.se3_exp(d_ref)
        xi_ref = delta_ref @ x
        denom_ref = jnp.dot(d_ref, lamj * d_ref - b)

        xi, delta, d, denom = pallas_solver.lm_trial_pallas(
            H, b, lamj, x, interpret=True
        )
        np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref),
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(delta), np.asarray(delta_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(xi), np.asarray(xi_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(denom), float(denom_ref),
                                   rtol=1e-4, atol=1e-10)
