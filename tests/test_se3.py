"""Unit tests for SE(3)/SO(3) math vs closed forms (scipy-free)."""

import numpy as np
import jax.numpy as jnp

from fast_gicp_tpu import se3


def rodrigues(omega):
    theta = np.linalg.norm(omega)
    if theta < 1e-12:
        return np.eye(3)
    k = omega / theta
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(theta) * K + (1 - np.cos(theta)) * K @ K


def test_skew_cross(rng):
    v = rng.normal(size=3).astype(np.float32)
    x = rng.normal(size=3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(se3.skew(v) @ x), np.cross(v, x), rtol=1e-5, atol=1e-6
    )


def test_so3_exp_matches_rodrigues(rng):
    for scale in (1e-8, 1e-4, 0.1, 1.0, 3.0):
        omega = (rng.normal(size=3) * scale).astype(np.float32)
        R = np.asarray(se3.so3_exp(jnp.asarray(omega)))
        np.testing.assert_allclose(R, rodrigues(omega), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_se3_exp_properties(rng):
    xi = rng.normal(size=6).astype(np.float32) * 0.5
    T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    assert T.shape == (4, 4)
    np.testing.assert_allclose(T[3], [0, 0, 0, 1], atol=1e-7)
    np.testing.assert_allclose(T[:3, :3], rodrigues(xi[:3]), rtol=1e-4, atol=1e-5)
    # exp(xi) @ exp(-xi) == I for commuting (same-axis) twists
    T_inv = np.asarray(se3.se3_exp(jnp.asarray(-xi)))
    np.testing.assert_allclose(T @ T_inv, np.eye(4), atol=5e-4)


def test_se3_exp_small_angle(rng):
    xi = np.array([1e-9, -1e-9, 1e-9, 0.3, -0.2, 0.1], dtype=np.float32)
    T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    np.testing.assert_allclose(T[:3, 3], xi[3:], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)


def test_transform_points_and_inverse(rng):
    xi = rng.normal(size=6).astype(np.float32) * 0.3
    T = se3.se3_exp(jnp.asarray(xi))
    pts = jnp.asarray(rng.normal(size=(17, 3)).astype(np.float32))
    out = se3.transform_points(T, pts)
    back = se3.transform_points(se3.invert_transform(T), out)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)


def test_rotation_angle(rng):
    omega = np.array([0.0, 0.0, 0.7], dtype=np.float32)
    R = se3.so3_exp(jnp.asarray(omega))
    assert abs(float(se3.rotation_angle(R)) - 0.7) < 1e-5


def test_so3_log_roundtrip(rng):
    from fast_gicp_tpu.se3 import so3_exp, so3_log

    # random angles incl. tiny, moderate, near-pi
    axes = rng.normal(size=(64, 3)).astype(np.float32)
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    thetas = np.concatenate(
        [rng.uniform(1e-5, 3.0, 60), [1e-8, 3.1, 3.14, np.pi - 1e-4]]
    ).astype(np.float32)
    omega = axes * thetas[:, None]
    R = so3_exp(jnp.asarray(omega))
    back = np.asarray(so3_log(R))
    # compare rotations (axis sign ambiguity at pi): exp(back) == R.
    # f32 arccos near theta = pi is conditioned at sqrt(eps) ~ 7e-4; that
    # bound is intrinsic, not an implementation artifact.
    R2 = np.asarray(so3_exp(jnp.asarray(back)))
    np.testing.assert_allclose(R2, np.asarray(R), atol=1e-3)
    moderate = thetas < 2.8
    np.testing.assert_allclose(R2[moderate], np.asarray(R)[moderate], atol=2e-5)


def test_se3_log_roundtrip(rng):
    from fast_gicp_tpu.se3 import se3_exp, se3_log

    xi = rng.normal(size=(32, 6)).astype(np.float32)
    xi[:, :3] *= 0.8  # keep rotations well inside (0, pi)
    T = se3_exp(jnp.asarray(xi))
    back = np.asarray(se3_log(T))
    np.testing.assert_allclose(back, xi, rtol=1e-4, atol=1e-5)
    # and tiny twists
    xi2 = (rng.normal(size=(8, 6)) * 1e-7).astype(np.float32)
    back2 = np.asarray(se3_log(se3_exp(jnp.asarray(xi2))))
    np.testing.assert_allclose(back2, xi2, atol=1e-9)


def test_orthonormalize_fixed_point_and_projection(rng):
    from fast_gicp_tpu.se3 import orthonormalize, se3_exp

    T = np.asarray(se3_exp(jnp.asarray(np.float32([0.3, -0.2, 0.5, 1, 2, 3]))))
    np.testing.assert_allclose(np.asarray(orthonormalize(jnp.asarray(T))), T,
                               atol=1e-6)
    # perturbed rotation projects back to orthonormal, translation kept
    bad = T.copy()
    bad[:3, :3] *= 1.05
    bad[0, 1] += 0.03
    out = np.asarray(orthonormalize(jnp.asarray(bad)))
    R = out[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(out[:3, 3], T[:3, 3], atol=1e-7)


def test_se3_exp_reverse_mode_at_zero():
    """grad through se3_exp at the identity twist must be finite (the
    standard linearization point)."""
    import jax

    def f(xi):
        return jnp.sum(se3.se3_exp(xi) ** 2)

    g = jax.grad(f)(jnp.zeros(6, jnp.float32))
    assert np.isfinite(np.asarray(g)).all()
