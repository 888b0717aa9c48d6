"""Closed-form batched 3x3 linear algebra (VPU-friendly, no iteration).

The reference leans on Eigen's `SelfAdjointEigenSolver::computeDirect` /
`JacobiSVD` on device (covariance_regularization.cu:15-125) and `.inverse()`
for 4x4 Mahalanobis matrices (fast_gicp_impl.hpp:149-153).  On TPU, batched
LAPACK-style decompositions are iterative and scalarize badly, so everything
here is closed-form and elementwise: adjugate inverses and the trigonometric
(Smith) symmetric eigenvalue solve.  All functions broadcast over leading
batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

_TWO_PI_3 = 2.0943951023931953  # 2*pi/3


def det3(A):
    """Determinant of (..., 3, 3)."""
    return (
        A[..., 0, 0] * (A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1])
        - A[..., 0, 1] * (A[..., 1, 0] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 0])
        + A[..., 0, 2] * (A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0])
    )


def inv3(A, eps: float = 0.0):
    """Adjugate inverse of (..., 3, 3); optionally Tikhonov-guarded det."""
    c00 = A[..., 1, 1] * A[..., 2, 2] - A[..., 1, 2] * A[..., 2, 1]
    c01 = A[..., 0, 2] * A[..., 2, 1] - A[..., 0, 1] * A[..., 2, 2]
    c02 = A[..., 0, 1] * A[..., 1, 2] - A[..., 0, 2] * A[..., 1, 1]
    c10 = A[..., 1, 2] * A[..., 2, 0] - A[..., 1, 0] * A[..., 2, 2]
    c11 = A[..., 0, 0] * A[..., 2, 2] - A[..., 0, 2] * A[..., 2, 0]
    c12 = A[..., 0, 2] * A[..., 1, 0] - A[..., 0, 0] * A[..., 1, 2]
    c20 = A[..., 1, 0] * A[..., 2, 1] - A[..., 1, 1] * A[..., 2, 0]
    c21 = A[..., 0, 1] * A[..., 2, 0] - A[..., 0, 0] * A[..., 2, 1]
    c22 = A[..., 0, 0] * A[..., 1, 1] - A[..., 0, 1] * A[..., 1, 0]
    det = A[..., 0, 0] * c00 + A[..., 0, 1] * c10 + A[..., 0, 2] * c20
    if eps:
        det = jnp.where(jnp.abs(det) < eps, jnp.where(det < 0, -eps, eps), det)
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            jnp.stack([c00, c01, c02], axis=-1),
            jnp.stack([c10, c11, c12], axis=-1),
            jnp.stack([c20, c21, c22], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def symmetrize(A):
    return 0.5 * (A + jnp.swapaxes(A, -1, -2))


def eigvalsh3(A):
    """Eigenvalues (ascending) of symmetric (..., 3, 3) via the
    trigonometric closed form (the TPU equivalent of Eigen computeDirect)."""
    q = (A[..., 0, 0] + A[..., 1, 1] + A[..., 2, 2]) / 3.0
    a01, a02, a12 = A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    d0 = A[..., 0, 0] - q
    d1 = A[..., 1, 1] - q
    d2 = A[..., 2, 2] - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    iso = p2 <= 1e-30  # (near-)isotropic: all eigenvalues == q
    p = jnp.sqrt(jnp.where(iso, 1.0, p2) / 6.0)
    B = (A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)) / p[..., None, None]
    r = jnp.clip(det3(B) * 0.5, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e_big = q + 2.0 * p * jnp.cos(phi)
    e_small = q + 2.0 * p * jnp.cos(phi + _TWO_PI_3)
    e_mid = 3.0 * q - e_big - e_small
    evals = jnp.stack([e_small, e_mid, e_big], axis=-1)
    return jnp.where(iso[..., None], q[..., None], evals)


def cholesky_solve(A, b):
    """Solve A x = b for small SPD A via fully unrolled Cholesky.

    XLA lowers `jnp.linalg.solve` on TPU to a scalar LU loop costing
    milliseconds even for 6x6; this unrolled LL^T factorization is pure
    vector ops (~100 flops for n=6) and costs microseconds.  Used for the
    (H + lambda I) d = -b solves in the LM driver (the reference uses Eigen
    LDLT, lsq_registration_impl.hpp:134).  Supports leading batch dims.
    """
    n = A.shape[-1]
    # Build L columns functionally (unrolled; n is static and small).
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[..., j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        # Guard: H + lambda I is SPD in exact arithmetic; clamp for safety.
        diag = jnp.sqrt(jnp.maximum(s, 1e-30))
        L[j][j] = diag
        inv_diag = 1.0 / diag
        for i in range(j + 1, n):
            s = A[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_diag
    # Forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # Back substitution L^T x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def smallest_eigenvector3(A, evals=None):
    """Unit eigenvector of the smallest eigenvalue of symmetric (..., 3, 3).

    Cayley-Hamilton: the columns of (A - l_big I)(A - l_mid I) span the
    smallest eigenspace; pick the largest column.  In degenerate cases any
    vector of the eigenspace is valid; fully isotropic matrices fall back to
    e_z (the reference's SVD basis is equally arbitrary there).
    """
    if evals is None:
        evals = eigvalsh3(A)
    eye = jnp.eye(3, dtype=A.dtype)
    l_mid = evals[..., 1][..., None, None]
    l_big = evals[..., 2][..., None, None]
    M = (A - l_big * eye) @ (A - l_mid * eye)
    norms_sq = jnp.sum(M * M, axis=-2)  # column squared norms (..., 3)
    col = jnp.argmax(norms_sq, axis=-1)
    v = jnp.take_along_axis(M, col[..., None, None], axis=-1)[..., 0]
    nrm = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True))
    scale = jnp.maximum(jnp.max(jnp.abs(evals), axis=-1, keepdims=True), 1e-30)
    ok = nrm > 1e-12 * scale * scale
    fallback = jnp.zeros_like(v).at[..., 2].set(1.0)
    return jnp.where(ok, v / jnp.where(ok, nrm, 1.0), fallback)
