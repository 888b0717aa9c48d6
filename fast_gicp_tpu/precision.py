"""Matmul precision control.

TPU matmuls default to bf16 passes; for geometry (metre-scale coordinates,
Mahalanobis algebra, 6x6 solves) that injects ~0.4% relative error into
every transform and normal-equation entry — observed as 5x more LM
iterations and corrupted fitness scores.  Every public entry point wraps its
trace in `f32_matmuls` so all dots/einsums inside run at full float32
precision; the few genuinely hot N^2 matmuls already request HIGHEST
explicitly.
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    """Decorator: trace `fn` under default_matmul_precision('float32')."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("float32"):
            return fn(*args, **kwargs)

    return wrapper
