"""Gauss-Newton / Levenberg-Marquardt driver over SE(3), fully on device.

TPU-native re-design of the reference's `LsqRegistration` optimization loop
(/root/reference/include/fast_gicp/gicp/impl/lsq_registration_impl.hpp:53-168):
the same outer-iteration / LM-inner-trial structure, but expressed as nested
`lax.while_loop`s so the whole solve — including the 6-dof state, the lambda
schedule and the convergence test — stays on device inside one `jit`.  The
host never sees an intermediate pose (the reference round-trips host<->device
every iteration; we don't).

Semantics preserved from the reference:
  * lambda init = lm_init_lambda_factor * max|diag H| (impl:128-130)
  * trial: solve (H + lambda I) d = -b; delta = se3_exp(d); xi = delta @ x0;
    rho = (y0 - yi) / (d . (lambda d - b)) (impl:133-141)
  * reject: if is_converged(delta) stop-as-converged (x0 unchanged);
    else lambda *= nu, nu *= 2 (impl:151-159)
  * accept: x0 = xi, lambda *= max(1/3, 1 - (2 rho - 1)^3) (impl:161-164)
  * 10 rejected trials in a row => "lm not converged" outer break (impl:133,167)
  * convergence: max(max|R - I| / rot_eps, max|t| / trans_eps) < 1 (impl:82-91)

`linearize_fn(x) -> (y0, H, b, aux)` must freeze whatever state the error
re-evaluations reuse (correspondences, Mahalanobis weights) into `aux`;
`error_fn(x, aux)` evaluates the objective at a trial pose against that frozen
state — exactly the reference's linearize/compute_error contract
(lsq_registration.hpp:68-69).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from . import se3
from .ops import linalg3


class LsqConfig(NamedTuple):
    """Optimizer settings; defaults match lsq_registration_impl.hpp:11-19.

    debug_print mirrors the reference's `setDebugPrint` LM table of
    (y0, yi, rho, lambda, |d|) per inner trial
    (lsq_registration_impl.hpp:143-149), emitted via jax.debug.print.
    """

    max_iterations: int = 64
    rotation_epsilon: float = 2e-3
    transformation_epsilon: float = 5e-4
    optimizer: str = "lm"  # "lm" | "gn"
    lm_max_iterations: int = 10
    lm_init_lambda_factor: float = 1e-9
    debug_print: bool = False


class LsqResult(NamedTuple):
    transformation: jax.Array  # (4, 4) final pose
    hessian: jax.Array  # (6, 6) H at last accepted linearization
    error: jax.Array  # objective at last linearization point
    converged: jax.Array  # bool
    iterations: jax.Array  # int32 outer iterations executed


def _solve_refined(A, rhs):
    """6x6 SPD solve (unrolled Cholesky) + one iterative-refinement step.

    The refinement recovers ~2 digits lost to f32 cancellation when H is
    ill-conditioned; total cost is still ~200 flops of pure vector ops.
    """
    d = linalg3.cholesky_solve(A, rhs)
    r = rhs - A @ d
    return d + linalg3.cholesky_solve(A, r)


def is_converged(delta, rotation_epsilon, transformation_epsilon):
    """Reference convergence test (lsq_registration_impl.hpp:82-91)."""
    R = delta[:3, :3] - jnp.eye(3, dtype=delta.dtype)
    t = delta[:3, 3]
    r_delta = jnp.max(jnp.abs(R)) / rotation_epsilon
    t_delta = jnp.max(jnp.abs(t)) / transformation_epsilon
    return jnp.maximum(r_delta, t_delta) < 1.0


def lsq_solve(
    linearize_fn: Callable,
    error_fn: Callable,
    x0: jax.Array,
    config: LsqConfig = LsqConfig(),
    with_aux: bool = False,
):
    """Run the GN/LM fixed-point solve from initial guess ``x0`` (4x4).

    With ``with_aux=True`` returns ``(LsqResult, aux)`` where ``aux`` is
    the frozen state of the LAST executed linearization (zeros-shaped if
    no iteration ran).  Two-phase solvers use it to seed their frozen
    phase from the final refresh-phase freeze instead of paying one more
    re-search (NDT-P2D: ~0.45 ms/align of gather + lane-pick at
    L = 114k correspondences)."""
    dtype = x0.dtype
    eye6 = jnp.eye(6, dtype=dtype)

    def converged_fn(delta):
        return is_converged(
            delta, config.rotation_epsilon, config.transformation_epsilon
        )

    from .ops import pallas_solver

    fused_trial = pallas_solver.supported()

    def trial(H, b, lam, x):
        """(xi, delta, d, denom) for one solve+exp+compose trial step —
        one Pallas launch on TPU (the XLA graph is ~50-60 scalar-sized
        fusions whose launch overhead dominates LM iterations)."""
        if fused_trial:
            return pallas_solver.lm_trial_pallas(H, b, lam, x)
        d = _solve_refined(H + lam * eye6, -b)
        delta = se3.se3_exp(d)
        return delta @ x, delta, d, jnp.dot(d, lam * d - b)

    def gn_step(x, lam):
        y0, H, b, aux = linearize_fn(x)
        xi, delta, _d, _denom = trial(H, b, jnp.zeros((), dtype), x)
        return xi, lam, delta, H, y0, jnp.array(True), aux

    def lm_step(x, lam):
        y0, H, b, aux = linearize_fn(x)
        lam = jnp.where(
            lam < 0.0,
            config.lm_init_lambda_factor * jnp.max(jnp.abs(jnp.diag(H))),
            lam,
        )

        def inner_cond(s):
            j, _lam, _nu, _x, _delta, accepted, conv_reject, _rho = s
            return (j < config.lm_max_iterations) & ~accepted & ~conv_reject

        def inner_body(s):
            j, lam, nu, x_cur, _delta, _acc, _cr, _rho = s
            xi, delta, d, denom = trial(H, b, lam, x_cur)
            yi = error_fn(xi, aux)
            rho = (y0 - yi) / denom

            if config.debug_print:
                jax.debug.print(
                    "lm trial {j}: y0={y0} yi={yi} rho={rho} lambda={lam} "
                    "|d|={dn}",
                    j=j, y0=y0, yi=yi, rho=rho, lam=lam,
                    dn=jnp.linalg.norm(d),
                )

            # NaN-safe accept: a degenerate objective (rank-deficient
            # covariances, zero valid correspondences, f32 blow-ups) can
            # make yi/rho NaN; `rho < 0` is False for NaN, which would
            # ACCEPT the poisoned pose.  Accept only a provably-improving
            # finite trial; everything else is a rejection (the pose
            # stays at the last finite iterate and the align reports
            # converged=False via the lm-not-converged path).
            reject = ~(rho >= 0.0)  # == (rho < 0) for finite rho
            conv_reject = reject & converged_fn(delta)
            accept = ~reject

            new_lam = jnp.where(
                accept,
                lam
                * jnp.maximum(1.0 / 3.0, 1.0 - (2.0 * rho - 1.0) ** 3),
                jnp.where(conv_reject, lam, nu * lam),
            )
            new_nu = jnp.where(reject & ~conv_reject, 2.0 * nu, nu)
            new_x = jnp.where(accept, xi, x_cur)
            return (j + 1, new_lam, new_nu, new_x, delta, accept, conv_reject, rho)

        init = (
            jnp.int32(0),
            lam,
            jnp.asarray(2.0, dtype),
            x,
            jnp.eye(4, dtype=dtype),
            jnp.array(False),
            jnp.array(False),
            jnp.asarray(0.0, dtype),
        )
        j, lam, _nu, x_new, delta, accepted, conv_reject, _rho = jax.lax.while_loop(
            inner_cond, inner_body, init
        )
        success = accepted | conv_reject
        return x_new, lam, delta, H, y0, success, aux

    step = lm_step if config.optimizer == "lm" else gn_step

    def outer_cond(s):
        i = s[0]
        converged, failed = s[3], s[4]
        return (i < config.max_iterations) & ~converged & ~failed

    def outer_body(s):
        i, x, lam, _conv, _failed, H_prev, _y_prev = s[:7]
        x_new, lam, delta, H, y0, success, aux = step(x, lam)
        converged = converged_fn(delta) & success
        # final_hessian_ only updates on a successful step (impl:117, :163).
        H_out = jnp.where(success, H, H_prev)
        out = (i + 1, x_new, lam, converged, ~success, H_out, y0)
        # the aux carry exists only when requested — other callers keep
        # the round-4 carry (no chance of an extra while-carry copy)
        return out + (aux,) if with_aux else out

    init = (
        jnp.int32(0),
        x0.astype(dtype),
        jnp.asarray(-1.0, dtype),
        jnp.array(False),
        jnp.array(False),
        jnp.eye(6, dtype=dtype),
        jnp.asarray(0.0, dtype),
    )
    if with_aux:
        aux0 = jax.tree_util.tree_map(
            lambda sh: jnp.zeros(sh.shape, sh.dtype),
            jax.eval_shape(lambda x: linearize_fn(x)[3], x0),
        )
        init = init + (aux0,)
    out = jax.lax.while_loop(outer_cond, outer_body, init)
    i, x, _lam, converged, _failed, H, y = out[:7]
    res = LsqResult(
        transformation=x, hessian=H, error=y, converged=converged, iterations=i
    )
    return (res, out[7]) if with_aux else res
