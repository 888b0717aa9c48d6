"""User-facing Registration base class (the pcl::Registration-shaped API).

Mirrors the surface the reference inherits from PCL plus its additions
(lsq_registration.hpp:16-85, fast_gicp.hpp:42-73): set_input_source/target,
align(guess), get_final_transformation/hessian, has_converged,
get_fitness_score, set_max_correspondence_distance, swap_source_and_target /
clear_source / clear_target with covariance reuse for odometry loops.

Clouds are padded to static bucket sizes on ingestion so repeated aligns hit
the jit cache; per-cloud state (points, mask, covariances) lives on device
and is swapped by reference — `swap_source_and_target` is free, matching the
reference's pointer swap (fast_gicp_impl.hpp:50-57).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import se3
from ..solver import LsqConfig
from ..utils.padding import DEFAULT_BUCKET, pad_points
from .metrics import fitness_score


def centered_frame_align(run, source, target, target_mask, guess):
    """Run an align in the TARGET-CENTROID frame, report world results.

    The GICP-family Jacobian J = [skew(T p) | -I] puts |p|^2-scale
    entries in the f32-accumulated normal equations; at survey-frame
    coordinates (UTM-style 1e4 m offsets) the rotation block reaches
    ~1e14 and f32 accumulation error (~1e7 absolute) swamps the
    small-signal translation blocks — measured: even an f64 solve of the
    f32-accumulated H cannot recover a 0.2 m shift.  Registering about
    the target centroid bounds lever arms by the cloud extent; the pose
    conjugates back exactly (X = T(c) X' T(-c)) and the reported 6x6
    returns to world twists through the translation adjoint
    (H = A^T H' A with A = adjoint_translation(c)).

    `run(source_c, target_c, guess_c) -> LsqResult` is the uncentered
    align body; covariances are translation-invariant and pass through
    outside this wrapper.
    """
    valid = target_mask.astype(target.dtype)
    c = jnp.sum(target * valid[:, None], axis=0) / jnp.maximum(
        jnp.sum(valid), 1.0
    )
    res = run(
        source - c,
        target - c,
        se3.conjugate_to_centered(guess.astype(target.dtype), c),
    )
    A = se3.adjoint_translation(c)
    return res._replace(
        transformation=se3.conjugate_from_centered(res.transformation, c),
        hessian=A.T @ res.hessian @ A,
    )


def centered_frame_evaluate(run, source, target, target_mask, pose):
    """`centered_frame_align`'s twin for the evaluate_cost surface:
    `run(source_c, target_c, pose_c) -> (err, H', b')` evaluates the
    objective in the target-centroid frame; the returned (err, H, b) are
    world-frame (err is frame-invariant; H/b return through the
    translation adjoint), consistent with the aligns' reported Hessian.
    """
    valid = target_mask.astype(target.dtype)
    c = jnp.sum(target * valid[:, None], axis=0) / jnp.maximum(
        jnp.sum(valid), 1.0
    )
    err, H, b = run(
        source - c,
        target - c,
        se3.conjugate_to_centered(pose.astype(target.dtype), c),
    )
    A = se3.adjoint_translation(c)
    return err, A.T @ H @ A, A.T @ b


@dataclass
class Cloud:
    """Padded device-side cloud + lazily computed per-point covariances.

    `channels` carries an optional (M, C) per-point payload (intensity /
    RGB / normals — the reference's PointXYZI/PointXYZRGB/PointNormal
    template instantiations, fast_gicp.cpp:1-6).  Registration math uses
    xyz only, exactly like the reference; the payload rides through
    ingestion and back out via `Registration.aligned_source()`."""

    points: jax.Array  # (M, 3) f32
    mask: jax.Array  # (M,) bool
    size: int  # true point count
    covs: Optional[jax.Array] = None  # (M, 3, 3) f32
    host_points: Optional[np.ndarray] = None  # (M, 3) f32 (native paths)
    channels: Optional[np.ndarray] = None  # (M, C) payload (host-side)
    # NDT per-cloud state cache: (key, voxel map, compact source stats) —
    # the reference keeps both voxelmaps alive across aligns and swaps
    # them with the clouds (ndt_cuda.cu:70-93); swapping Cloud objects
    # carries this cache exactly like the covariance cache.
    ndt_cache: Optional[tuple] = None
    # cached host-side extent (lo, hi) of the real points — auto grid
    # sizing reads it instead of re-reducing 17k x 3 host floats per
    # align (~1.3 ms/align of the pipelined class-API loop)
    _extent: Optional[tuple] = None

    def extent(self):
        """Cached (lo, hi) numpy extent over the real (unpadded) points."""
        if self._extent is None:
            pts = self.host_points[: self.size]
            self._extent = (pts.min(axis=0), pts.max(axis=0))
        return self._extent


_EYE4 = None


def _identity_guess():
    """Cached identity-guess device array: creating `jnp.eye(4)` anew per
    align costs a ~2 ms device round trip on the remote-TPU tunnel
    (measured) — a pure per-align tax in pipelined loops."""
    global _EYE4
    if _EYE4 is None:
        _EYE4 = jnp.eye(4, dtype=jnp.float32)
    return _EYE4


def estimate_covariances(
    cloud: "Cloud",
    method: str,
    k: int,
    regularization: str,
    kernel_width: float = 0.5,
    kernel_max_dist: float = 3.0,
) -> None:
    """Populate cloud.covs via the selected estimator (lazily, cached).

    The selector mirrors the CUDA variant's NearestNeighborMethod
    (fast_vgicp_cuda.hpp:21): "knn" = on-device brute force
    (GPU_BRUTEFORCE), "rbf" = GPU_RBF_KERNEL (fastest), "kdtree" =
    CPU_PARALLEL_KDTREE (native host kd-tree feeding the device).
    """
    if cloud.covs is not None:
        return
    from ..ops.covariance import (
        adaptive_radius_covariances_jit,
        covariances_from_neighbors_jit,
        knn_covariances_jit,
        rbf_covariances_jit,
    )

    if method == "kdtree":
        from .. import native

        # Tree over the real points only (padding sits at the origin and
        # must not pollute neighborhoods); padded queries yield garbage
        # covariances that downstream masks drop.
        idx, _ = native.knn_search(
            cloud.host_points[: cloud.size], cloud.host_points, k
        )
        cloud.covs = covariances_from_neighbors_jit(
            cloud.points, jnp.asarray(idx), method=regularization
        )
    elif method == "rbf":
        cloud.covs = rbf_covariances_jit(
            cloud.points,
            cloud.mask,
            kernel_width=kernel_width,
            max_dist=kernel_max_dist,
            method=regularization,
        )
    elif method == "knn":
        cloud.covs = knn_covariances_jit(
            cloud.points, cloud.mask, k=k, method=regularization
        )
    elif method == "adaptive":
        # TPU-native k-th-NN windowed estimator (no top-k; see
        # ops.covariance.adaptive_radius_covariance_cols) — beyond the
        # reference's selector, ~5x faster than "knn" on TPU.
        cloud.covs = adaptive_radius_covariances_jit(
            cloud.points, cloud.mask, k=k, method=regularization
        )
    else:
        raise ValueError(
            "covariance estimation must be 'knn', 'rbf', 'adaptive', "
            "or 'kdtree'"
        )


@dataclass
class Registration:
    """Base registration driver; subclasses implement `_compute`.

    Defaults follow lsq_registration_impl.hpp:11-19.
    """

    max_iterations: int = 64
    rotation_epsilon: float = 2e-3
    transformation_epsilon: float = 5e-4
    optimizer: str = "lm"
    lm_max_iterations: int = 10
    lm_init_lambda_factor: float = 1e-9
    max_correspondence_distance: float = math.inf
    lm_debug_print: bool = False
    bucket: int = DEFAULT_BUCKET

    _source: Optional[Cloud] = field(default=None, repr=False)
    _pending: Optional[object] = field(default=None, repr=False)
    _target: Optional[Cloud] = field(default=None, repr=False)
    _final_T: Optional[np.ndarray] = field(default=None, repr=False)
    _final_H: Optional[np.ndarray] = field(default=None, repr=False)
    _converged: bool = field(default=False, repr=False)
    _iterations: int = field(default=0, repr=False)

    # -- cloud management -------------------------------------------------
    def _ingest(self, points: np.ndarray, channels=None) -> Cloud:
        points = np.asarray(points)
        if channels is None and points.shape[1] > 3:
            # (N, 3 + C) convenience: trailing columns are the payload
            channels = points[:, 3:]
        padded, mask = pad_points(points[:, :3], self.bucket)
        ch = None
        if channels is not None:
            ch = np.zeros((padded.shape[0], channels.shape[1]), np.float32)
            ch[: len(channels)] = channels
        return Cloud(
            points=jnp.asarray(padded),
            mask=jnp.asarray(mask),
            size=int(mask.sum()),
            host_points=padded,
            channels=ch,
        )

    def set_input_source(self, points: np.ndarray, channels=None) -> None:
        self._source = self._ingest(points, channels)

    def set_input_target(self, points: np.ndarray, channels=None) -> None:
        self._target = self._ingest(points, channels)

    def swap_source_and_target(self) -> None:
        self._source, self._target = self._target, self._source

    def clear_source(self) -> None:
        self._source = None

    def clear_target(self) -> None:
        self._target = None

    def set_source_covariances(self, covs) -> None:
        self._require_source().covs = jnp.asarray(covs)

    def set_target_covariances(self, covs) -> None:
        self._require_target().covs = jnp.asarray(covs)

    def clear_covariances(self) -> None:
        """Drop cached covariances so the next align re-estimates them —
        the class-API analogue of constructing a fresh instance per align,
        which is what the reference benchmark's N-times loop does
        (align.cpp:56-76). Lets pipelined callers (`align_async`) benchmark
        full re-estimation without re-uploading the clouds."""
        if self._source is not None:
            self._source.covs = None
            self._source.ndt_cache = None
        if self._target is not None:
            self._target.covs = None
            self._target.ndt_cache = None

    def _require_source(self) -> Cloud:
        if self._source is None:
            raise RuntimeError("set_input_source has not been called")
        return self._source

    def _require_target(self) -> Cloud:
        if self._target is None:
            raise RuntimeError("set_input_target has not been called")
        return self._target

    # -- settings ---------------------------------------------------------
    def set_max_correspondence_distance(self, d: float) -> None:
        self.max_correspondence_distance = float(d)

    def set_max_iterations(self, n: int) -> None:
        self.max_iterations = int(n)

    def set_rotation_epsilon(self, eps: float) -> None:
        self.rotation_epsilon = float(eps)

    def set_transformation_epsilon(self, eps: float) -> None:
        self.transformation_epsilon = float(eps)

    def set_initial_lambda_factor(self, f: float) -> None:
        self.lm_init_lambda_factor = float(f)

    def set_optimizer_type(self, kind: str) -> None:
        if kind not in ("lm", "gn"):
            raise ValueError("optimizer must be 'lm' or 'gn'")
        self.optimizer = kind

    def set_debug_print(self, enabled: bool) -> None:
        """Per-LM-trial debug table, the reference's setDebugPrint
        (lsq_registration.hpp:41, impl:143-149)."""
        self.lm_debug_print = bool(enabled)

    def _lsq_config(self) -> LsqConfig:
        return LsqConfig(
            max_iterations=self.max_iterations,
            rotation_epsilon=self.rotation_epsilon,
            transformation_epsilon=self.transformation_epsilon,
            optimizer=self.optimizer,
            lm_max_iterations=self.lm_max_iterations,
            lm_init_lambda_factor=self.lm_init_lambda_factor,
            debug_print=self.lm_debug_print,
        )

    # -- alignment --------------------------------------------------------
    def align_async(self, initial_guess: Optional[np.ndarray] = None):
        """Enqueue the registration and return the DEVICE-side `LsqResult`
        without synchronizing.

        On a remote-device runtime every forced device->host transfer
        costs a full round trip (~35 ms on this TPU tunnel), which
        dominates `align()`'s wall time — pipelining callers (odometry
        loops, batch schedulers) should use this, chain the returned
        device arrays (e.g. feed `result.transformation` as the next
        align's guess), and synchronize once at the end.  Host-side
        getters (`get_final_transformation`, `has_converged`, ...) sync
        lazily on first access.
        """
        src, tgt = self._require_source(), self._require_target()
        guess = (
            _identity_guess()
            if initial_guess is None
            else jnp.asarray(initial_guess, dtype=jnp.float32)
        )
        result = self._compute(src, tgt, guess)
        self._pending = result
        self._final_T = None
        self._final_H = None
        return result

    def _sync_pending(self) -> None:
        result = getattr(self, "_pending", None)
        if result is None:
            return
        self._pending = None
        # One device->host transfer for everything (each forced transfer
        # costs a full runtime round trip).
        T, H, conv, iters = jax.device_get(
            (result.transformation, result.hessian, result.converged,
             result.iterations)
        )
        self._final_T = np.asarray(T, dtype=np.float64)
        self._final_H = np.asarray(H, dtype=np.float64)
        self._converged = bool(conv)
        self._iterations = int(iters)

    def align(self, initial_guess: Optional[np.ndarray] = None) -> np.ndarray:
        """Run registration; returns the final 4x4 transformation."""
        self.align_async(initial_guess)
        self._sync_pending()
        return self._final_T

    def _compute(self, source: Cloud, target: Cloud, guess: jax.Array):
        raise NotImplementedError

    def evaluate_cost(self, pose: np.ndarray, return_terms: bool = False):
        """Objective value (and optionally H, b) at an arbitrary pose — the
        reference's evaluateCost (lsq_registration.hpp:53,
        lsq_registration_impl.hpp:48-50)."""
        src, tgt = self._require_source(), self._require_target()
        err, H, b = jax.device_get(
            self._evaluate(src, tgt, jnp.asarray(pose, dtype=jnp.float32))
        )
        if return_terms:
            return float(err), np.asarray(H, np.float64), np.asarray(b, np.float64)
        return float(err)

    def _evaluate(self, source: Cloud, target: Cloud, pose: jax.Array):
        raise NotImplementedError

    # -- results ----------------------------------------------------------
    def aligned_source(self) -> np.ndarray:
        """The source cloud transformed by the final pose, payload columns
        appended — the reference's `align(output)` output cloud, where
        extra point fields ride along untouched (PointXYZI etc.)."""
        self._sync_pending()
        if self._final_T is None:
            raise RuntimeError("align() has not been run")
        src = self._require_source()
        pts = np.asarray(src.host_points[: src.size], np.float64)
        T = np.asarray(self._final_T, np.float64)
        out = (pts @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
        if src.channels is not None:
            out = np.concatenate([out, src.channels[: src.size]], axis=1)
        return out

    def get_final_transformation(self) -> np.ndarray:
        self._sync_pending()
        if self._final_T is None:
            raise RuntimeError("align has not been called")
        return self._final_T

    def get_final_hessian(self) -> np.ndarray:
        self._sync_pending()
        if self._final_H is None:
            raise RuntimeError("align has not been called")
        return self._final_H

    def has_converged(self) -> bool:
        self._sync_pending()
        return self._converged

    def get_num_iterations(self) -> int:
        self._sync_pending()
        return self._iterations

    def get_fitness_score(self, max_range: float = math.inf) -> float:
        src, tgt = self._require_source(), self._require_target()
        T = jnp.asarray(self.get_final_transformation(), dtype=jnp.float32)
        return float(
            fitness_score(
                T, src.points, src.mask, tgt.points, tgt.mask, max_range=max_range
            )
        )
