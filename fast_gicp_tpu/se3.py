"""SE(3)/SO(3) math on JAX arrays.

TPU-native equivalent of the reference's SO3/SE3 layer
(/root/reference/include/fast_gicp/so3/so3.hpp:9-104): skew matrices,
quaternion-free Rodrigues `so3_exp` with the same small-angle Taylor switch
(theta^2 < 1e-10), and rotation-first `se3_exp` with the V-matrix applied to
the translation part.

Everything is branchless (`jnp.where`) so it traces cleanly under `jit`,
`vmap`, and `lax.while_loop`, and is dtype-polymorphic (f32 on the hot path).
Twist convention matches the reference: ``xi = [omega, rho]`` (rotation first).
"""

from __future__ import annotations

import jax.numpy as jnp

# Small-angle switch matching reference so3.hpp:64 (theta_sq < 1e-10).
_SMALL_ANGLE_SQ = 1e-10


def skew(v):
    """Skew-symmetric matrix of a 3-vector; batched over leading dims.

    skew(v) @ x == cross(v, x).  Reference: so3.hpp:9-31.
    """
    v = jnp.asarray(v)
    zero = jnp.zeros_like(v[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(omega):
    """Exponential map so(3) -> SO(3) returning a rotation matrix.

    Same numerics as the reference quaternion path (so3.hpp:58-77): for
    theta_sq < 1e-10 use the 4th-order Taylor expansions of sin(t/2)/t and
    cos(t/2), then convert the unit quaternion to a matrix.  Batched over
    leading dims.
    """
    omega = jnp.asarray(omega)
    theta_sq = jnp.sum(omega * omega, axis=-1)
    small = theta_sq < _SMALL_ANGLE_SQ
    # Guard sqrt(0) gradient and divides.
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    theta_quad = theta_sq * theta_sq

    imag_taylor = 0.5 - theta_sq / 48.0 + theta_quad / 3840.0
    real_taylor = 1.0 - theta_sq / 8.0 + theta_quad / 384.0
    half_theta = 0.5 * theta
    imag_exact = jnp.sin(half_theta) / theta
    real_exact = jnp.cos(half_theta)

    imag = jnp.where(small, imag_taylor, imag_exact)
    real = jnp.where(small, real_taylor, real_exact)

    qw = real
    qx = imag * omega[..., 0]
    qy = imag * omega[..., 1]
    qz = imag * omega[..., 2]
    return _quat_to_matrix(qw, qx, qy, qz)


def _quat_to_matrix(w, x, y, z):
    """Unit quaternion (w, x, y, z) to rotation matrix; batched."""
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    r00 = 1.0 - 2.0 * (yy + zz)
    r01 = 2.0 * (xy - wz)
    r02 = 2.0 * (xz + wy)
    r10 = 2.0 * (xy + wz)
    r11 = 1.0 - 2.0 * (xx + zz)
    r12 = 2.0 * (yz - wx)
    r20 = 2.0 * (xz - wy)
    r21 = 2.0 * (yz + wx)
    r22 = 1.0 - 2.0 * (xx + yy)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def se3_exp(xi):
    """Exponential map se(3) -> SE(3) as a 4x4 homogeneous matrix.

    Rotation-first twist ``xi = [omega(3), rho(3)]`` matching the reference
    (so3.hpp:80-104): R = so3_exp(omega), t = V @ rho with
    V = I + (1-cos)/t^2 * W + (t - sin)/t^3 * W^2, and V := R for tiny theta.
    Batched over leading dims.
    """
    xi = jnp.asarray(xi)
    omega = xi[..., :3]
    rho = xi[..., 3:6]

    theta_sq = jnp.sum(omega * omega, axis=-1)
    small = theta_sq < _SMALL_ANGLE_SQ
    # double-where: divide by the SANITIZED theta_sq so reverse-mode
    # gradients through the untaken exact branch stay finite at omega = 0
    # (the same discipline as so3_log/se3_log).
    ts_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(ts_safe)

    R = so3_exp(omega)
    W = skew(omega)
    W_sq = W @ W

    a = (1.0 - jnp.cos(theta)) / ts_safe
    b = (theta - jnp.sin(theta)) / (ts_safe * theta)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    V_exact = eye + a[..., None, None] * W + b[..., None, None] * W_sq
    V = jnp.where(small[..., None, None], R, V_exact)

    t = jnp.einsum("...ij,...j->...i", V, rho)
    return make_transform(R, t)


def so3_log(R):
    """Logarithm map SO(3) -> so(3) (rotation vector); batched.

    Inverse of `so3_exp` for theta in [0, pi).  Uses the antisymmetric part
    with a Taylor-guarded theta/sin(theta) factor; near theta = pi the
    antisymmetric part vanishes, so that branch recovers the axis from the
    symmetric part (R + I columns).
    """
    R = jnp.asarray(R)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # lower clip 1e-7 inside -1: keeps arccos' gradient finite at theta = pi
    # (value error ~5e-4 there, below the f32 arccos conditioning anyway)
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    # Differentiability: every branch input is sanitized with a dummy value
    # before the non-smooth op (arccos at 1, theta/sin at 0), or jacfwd/grad
    # through the UNTAKEN branch poisons the result with NaNs.
    small = cos_t > 1.0 - 5e-7  # theta < ~1e-3
    cos_safe = jnp.where(small, 0.0, cos_t)
    theta = jnp.where(small, 0.0, jnp.arccos(cos_safe))
    sin_t = jnp.sin(theta)
    # small branch: theta^2 ~ 2(1 - cos) = 3 - trace, a smooth function of R;
    # factor = 0.5 * theta/sin(theta) = 0.5 + theta^2/12 + O(theta^4)
    ts_small = jnp.maximum(3.0 - trace, 0.0)
    sin_safe = jnp.where(jnp.abs(sin_t) < 1e-10, 1.0, sin_t)
    factor = jnp.where(
        small, 0.5 + ts_small / 12.0, theta / (2.0 * sin_safe)
    )
    omega_main = v * factor[..., None]
    # theta ~ pi branch: the SYMMETRIC part (R + R^T)/2 - cos(theta) I
    # equals (1 - cos) a a^T exactly, free of the vanishing antisymmetric
    # term; its largest column is +-a scaled.
    S = 0.5 * (R + jnp.swapaxes(R, -1, -2)) - cos_t[..., None, None] * jnp.eye(
        3, dtype=R.dtype
    )
    col = jnp.argmax(
        jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1),
        axis=-1,
    )
    axis_raw = jnp.take_along_axis(S, col[..., None, None], axis=-1)[..., 0]
    nrm_sq = jnp.sum(axis_raw * axis_raw, axis=-1, keepdims=True)
    # sanitize before sqrt: at identity S = 0 and sqrt'(0) = inf would leak
    # NaNs through jacfwd even though this branch is untaken there
    nrm = jnp.sqrt(jnp.where(nrm_sq < 1e-24, 1.0, nrm_sq))
    axis = axis_raw / nrm
    # fix sign so axis agrees with the (possibly tiny) antisymmetric part
    sign = jnp.where(jnp.sum(axis * v, axis=-1, keepdims=True) < 0, -1.0, 1.0)
    omega_pi = axis * sign * theta[..., None]
    near_pi = theta > 3.0
    return jnp.where(near_pi[..., None], omega_pi, omega_main)


def se3_log(T):
    """Logarithm map SE(3) -> se(3), rotation-first twist [omega, rho];
    inverse of `se3_exp`: rho = V^-1 t with the closed-form V inverse
    V^-1 = I - W/2 + (1/theta^2 - (1+cos)/(2 theta sin)) W^2."""
    T = jnp.asarray(T)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    omega = so3_log(R)
    theta_sq = jnp.sum(omega * omega, axis=-1)
    small = theta_sq < _SMALL_ANGLE_SQ
    # double-where: the exact-branch expressions must see safe inputs or
    # their NaN derivatives at theta = 0 leak through jacfwd.
    ts_safe = jnp.where(small, 1.0, theta_sq)
    theta = jnp.sqrt(ts_safe)
    W = skew(omega)
    W_sq = W @ W
    sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
    sin_safe = jnp.where(jnp.abs(sin_t) < 1e-10, 1.0, sin_t)
    coef_exact = 1.0 / ts_safe - (1.0 + cos_t) / (2.0 * theta * sin_safe)
    coef = jnp.where(small, 1.0 / 12.0 + theta_sq / 720.0, coef_exact)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=T.dtype), W.shape)
    V_inv = eye - 0.5 * W + coef[..., None, None] * W_sq
    rho = jnp.einsum("...ij,...j->...i", V_inv, t)
    return jnp.concatenate([omega, rho], axis=-1)


def orthonormalize(T):
    """Project the rotation block of (..., 4, 4) back onto SO(3) via
    Gram-Schmidt (columns), keeping the translation.

    Feedback loops of the form delta <- inv(prev) @ align(prev @ delta)
    DOUBLE the rotation's orthonormality defect every iteration (the
    transpose-based rigid inverse is only an inverse for exact rotations),
    so the f32 rounding seed (~1e-7) walks to O(0.1) within ~20 frames.
    Re-projecting once per frame keeps the defect at rounding level.
    """
    T = jnp.asarray(T)
    R = T[..., :3, :3]
    c0 = R[..., :, 0]
    c0 = c0 / jnp.linalg.norm(c0, axis=-1, keepdims=True)
    c1 = R[..., :, 1]
    c1 = c1 - jnp.sum(c0 * c1, axis=-1, keepdims=True) * c0
    c1 = c1 / jnp.linalg.norm(c1, axis=-1, keepdims=True)
    c2 = jnp.cross(c0, c1)
    R_out = jnp.stack([c0, c1, c2], axis=-1)
    return make_transform(R_out, T[..., :3, 3])


def make_transform(R, t):
    """Assemble a 4x4 homogeneous transform from R (.., 3, 3) and t (.., 3)."""
    R = jnp.asarray(R)
    t = jnp.asarray(t)
    batch = R.shape[:-2]
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def transform_points(T, points):
    """Apply a 4x4 transform to (..., N, 3) points."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return points @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def rotate_covs(R, covs):
    """R C R^T for batched 3x3 covariances (N, 3, 3)."""
    return jnp.einsum("ij,njk,lk->nil", R, covs, R)


def invert_transform(T):
    """Inverse of a rigid 4x4 transform."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return make_transform(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def rotation_angle(R):
    """Angle (rad) of a rotation matrix, via trace."""
    cos = (jnp.trace(R, axis1=-2, axis2=-1) - 1.0) * 0.5
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


def conjugate_to_centered(x, c):
    """X' = T(-c) X T(c): the pose of clouds shifted by -c (both source
    and target), given the world pose X.  R' = R, t' = t - c + R c."""
    R = x[..., :3, :3]
    t = x[..., :3, 3]
    t_c = t - c + jnp.einsum("...ij,j->...i", R, c)
    return x.at[..., :3, 3].set(t_c)


def conjugate_from_centered(x_c, c):
    """Inverse of `conjugate_to_centered`: X = T(c) X' T(-c).
    R = R', t = t' + c - R' c."""
    R = x_c[..., :3, :3]
    t = x_c[..., :3, 3]
    t_w = t + c - jnp.einsum("...ij,j->...i", R, c)
    return x_c.at[..., :3, 3].set(t_w)


def adjoint_translation(c):
    """A (6x6): world rotation-first twist (omega, rho) -> the twist of
    the same increment expressed about clouds shifted by -c:
    exp(A xi) = T(-c) exp(xi) T(c)  =>  omega' = omega,
    rho' = rho - c x omega.  Used to report centered-frame normal
    equations in the world frame: H_world = A^T H' A, b_world = A^T b'."""
    A = jnp.eye(6, dtype=c.dtype)
    return A.at[3:6, 0:3].set(-skew(c))
