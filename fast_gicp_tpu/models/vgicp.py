"""FastVGICP-equivalent: voxelized GICP as one jitted LM solve.

Covers the reference's `FastVGICP` (fast_vgicp.hpp:24-81, impl) and the
objective of `FastVGICPCuda` (fast_vgicp_cuda.cu, compute_derivatives.cu):
a Gaussian voxel map built from the target cloud (additive / additive
weighted / multiplicative accumulation), correspondences = (source point x
every existing neighbor voxel) over DIRECT1/7/27/RADIUS offsets, per-pair
Mahalanobis (cov_voxel + R C_src R^T)^-1 frozen at each linearization, and
residual weight w = sqrt(voxel.num_points) (fast_vgicp_impl.hpp:149).

The covariance path is selectable like the CUDA variant's
NearestNeighborMethod (fast_vgicp_cuda.hpp:21): "knn" (CPU_PARALLEL_KDTREE /
GPU_BRUTEFORCE equivalents — same brute-force math here) or "rbf"
(GPU_RBF_KERNEL, the reference's fastest config and the most MXU-friendly).

The voxel map is rebuilt from the target on every align, matching the
reference's lazy rebuild semantics (fast_vgicp_impl.hpp:66-70, :120-123);
covariances are cached per cloud and survive swap_source_and_target.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import pallas_linearize, soa
from ..ops.voxelmap import (
    DenseRawGridMap,
    auto_grid_dims,
    build_raw_grid,
    build_voxelmap,
    lookup_raw_rows_cols,
    lookup_voxels_cols,
    neighbor_offsets,
)
from ..precision import f32_matmuls
from ..solver import LsqConfig, LsqResult, lsq_solve
from .base import (Cloud, Registration, centered_frame_align,
                   centered_frame_evaluate, estimate_covariances)
from .gicp import GICPConfig


class VGICPConfig(NamedTuple):
    """Defaults match fast_vgicp_impl.hpp:22-24.

    grid_dims: static (Dx, Dy, Dz) -> dense-grid voxel lookup (single
    gather, fastest); None -> open-addressing hash (unbounded scenes).
    The class API auto-sizes the grid from the target cloud's extent.
    """

    resolution: float = 1.0
    neighbor_search_method: str = "direct1"
    neighbor_search_radius: float = 1.5
    voxel_accumulation: str = "additive"
    k_correspondences: int = 20
    regularization: str = "plane"
    grid_dims: tuple | None = None
    # Two-phase solve: re-search voxel correspondences for the first
    # `refresh_iterations` LM iterations (the large-motion phase), then
    # FREEZE them and run the remaining iterations gather-free — the
    # voxel-map analogue of FastGICPSingleThread's skip-re-search anchor
    # trick (fast_gicp_st_impl.hpp:46-54).  After ~2 iterations the pose
    # moves sub-millimeter per step, so voxel assignments are static;
    # measured: saves ~75 us/iteration at 18k points with end-to-end pose
    # and fitness unchanged at the reference tolerances.  None = re-search
    # every iteration, exactly like FastVGICP (fast_vgicp_impl.hpp:119-180).
    refresh_iterations: int | None = None
    lsq: LsqConfig = LsqConfig()


def make_vgicp_objective(
    source,
    source_mask,
    source_covs,
    vmap,
    offsets,
    config: VGICPConfig,
    axis_name=None,
    with_freeze: bool = False,
):
    """(linearize_fn, error_fn) for the voxelized GICP objective.

    aux freezes (Mahalanobis, weights, voxel means, validity) across LM
    inner trials, matching voxel_correspondences_/voxel_mahalanobis_ reuse
    (fast_vgicp_impl.hpp:101-115 vs :183-204).

    With ``with_freeze=True`` returns (linearize, error, freeze,
    linearize_frozen): ``freeze(x)`` captures the voxel correspondences at
    pose x, and ``linearize_frozen(x, frozen)`` re-linearizes against that
    frozen set without re-searching — the voxel-map analogue of
    FastGICPSingleThread's skip-re-search anchor trick
    (fast_gicp_st_impl.hpp:46-54), used by the two-phase solve in
    `vgicp_align` (config.refresh_iterations).

    All per-correspondence math runs in SoA (n-last) layout — points as
    (3, N) columns, symmetric matrices as (6, N) coefficient rows, offsets
    leading as (K, ..., N) — keeping the big axis in TPU lanes (ops/soa.py).
    """
    n = source.shape[0]
    k = offsets.shape[0]
    P = soa.cols_from_points(source)  # (3, N)
    # source covariances arrive as (N, 3, 3) AoS or (6, N) sym columns
    # (the SoA covariance pipeline's native format)
    C_A = (
        source_covs
        if (source_covs.ndim == 2 and source_covs.shape[0] == 6)
        else soa.sym_cols_from_covs(source_covs)
    )
    offs = offsets.T[:, :, None]  # (3, K, 1)
    raw_grid = isinstance(vmap, DenseRawGridMap)
    use_fused = pallas_linearize.supported(n * k)

    def _psum(v):
        return v if axis_name is None else jax.lax.psum(v, axis_name)

    def _query_coords(p_t):
        coords = jnp.floor(p_t / vmap.resolution - 0.5).astype(jnp.int32)
        qx = coords[0][None, :] + offs[0]  # (K, N)
        qy = coords[1][None, :] + offs[1]
        qz = coords[2][None, :] + offs[2]
        return qx, qy, qz

    def correspondences(x):
        p_t = soa.transform_cols(x, P)  # (3, N)
        qx, qy, qz = _query_coords(p_t)
        vids = lookup_voxels_cols(vmap, qx, qy, qz)  # (K, N)
        valid = (vids >= 0) & source_mask[None, :]
        return p_t, jnp.maximum(vids, 0), valid

    def correspondences_raw(x):
        """DenseRawGridMap path: ONE f32 row gather, no vid indirection
        (the int32 grid gather lowers to a scalar-core kernel ~5x slower
        than a row gather — measured 160 us/LM iteration at 22k points)."""
        p_t = soa.transform_cols(x, P)
        qx, qy, qz = _query_coords(p_t)
        rows = lookup_raw_rows_cols(vmap, config.grid_dims, qx, qy, qz)
        return p_t, rows  # rows (K, N, 16); count==0 rows are misses

    def _flatten_pt(p_t):
        """(3, N) -> padded (8, K*N) matching the k-major row flattening."""
        p_b = jnp.broadcast_to(p_t[None], (k, 3, n))
        cols = jnp.swapaxes(p_b, 0, 1).reshape(3, k * n)
        return jnp.concatenate([cols, jnp.zeros((5, k * n), cols.dtype)])

    def _flatten_ca(cr):
        return jnp.concatenate(
            [
                jnp.broadcast_to(cr[:, None, :], (6, k, n)).reshape(6, k * n),
                jnp.zeros((2, k * n), cr.dtype),
            ]
        )

    def _ret(linearize, error, freeze, linearize_frozen):
        if with_freeze:
            return linearize, error, freeze, linearize_frozen
        return linearize, error

    if use_fused:
        # Fused Pallas path: the rigid transform and the R C_A R^T rotation
        # run IN-KERNEL against loop-invariant flattened operands, so the
        # only per-iteration XLA-side work is the voxel-row gather; the SoA
        # math otherwise lowers to ~10 XLA kernels whose launches dominate.
        P_flat = _flatten_pt(P)
        CA_flat = _flatten_ca(C_A)
        kernel = (
            pallas_linearize.linearize_raw_pallas
            if raw_grid
            else pallas_linearize.linearize_pallas
        )
        mask_row = jnp.broadcast_to(
            source_mask[None, :], (k, n)
        ).reshape(1, k * n).astype(source.dtype)
        mask_f = jnp.concatenate(
            [mask_row, jnp.zeros((7, k * n), source.dtype)]
        )

        if raw_grid:
            # raw rows carry their own count==0 miss marker; validity is
            # just the (loop-invariant) source mask
            def freeze(x):
                _p_t, rows = correspondences_raw(x)
                return rows.reshape(k * n, 16).T, mask_f  # (16, K*N)
        else:
            def freeze(x):
                _p_t, vids, valid = correspondences(x)
                rows_t = vmap.packed[vids].reshape(k * n, 16).T
                valid_f = jnp.concatenate(
                    [
                        valid.reshape(1, k * n).astype(source.dtype),
                        jnp.zeros((7, k * n), source.dtype),
                    ]
                )
                return rows_t, valid_f

        def linearize_frozen(x, frozen):
            rows_t, valid_f = frozen
            err, H, b, aux = kernel(P_flat, CA_flat, x, rows_t, valid_f)
            return _psum(err), _psum(H), _psum(b), aux

        def linearize(x):
            return linearize_frozen(x, freeze(x))

        def error(x, aux):
            return _psum(pallas_linearize.error_pallas(P_flat, aux, x))

        return _ret(linearize, error, freeze, linearize_frozen)

    if raw_grid:

        def freeze(x):
            _p_t, rows = correspondences_raw(x)
            return rows

        def linearize_frozen(x, rows):
            R = x[:3, :3]
            p_t = soa.transform_cols(x, P)
            mu_B, cov_B, n_B = soa.sym_cols_from_raw(rows)
            valid = (n_B > 0) & source_mask[None, :]

            cov_rot = soa.rotate_sym_cols(R, C_A)  # (6, N)
            M = soa.inv_sym_cols(cov_B + cov_rot[None]) * valid[:, None, :]
            w = jnp.sqrt(n_B)

            p_b = jnp.broadcast_to(p_t[None], (k, 3, n))
            err, H, b = soa.linearize_cols(p_b, mu_B, M, w, valid)
            aux = (valid, M, w, mu_B)
            return (
                _psum(jnp.sum(err, 0)),
                _psum(jnp.sum(H, 0)),
                _psum(jnp.sum(b, 0)),
                aux,
            )

        def linearize(x):
            return linearize_frozen(x, freeze(x))

        def error(x, aux):
            valid, M, w, mu_B = aux
            p_t = soa.transform_cols(x, P)
            p_b = jnp.broadcast_to(p_t[None], (k, 3, n))
            return _psum(jnp.sum(soa.error_cols(p_b, mu_B, M, w, valid), 0))

        return _ret(linearize, error, freeze, linearize_frozen)

    def freeze(x):
        _p_t, vids, valid = correspondences(x)
        return vmap.packed[vids], valid  # (K, N, 16), one row-gather

    def linearize_frozen(x, frozen):
        rows, valid = frozen
        R = x[:3, :3]
        p_t = soa.transform_cols(x, P)
        mu_B, cov_B, n_B = soa.sym_cols_from_packed(rows)

        cov_rot = soa.rotate_sym_cols(R, C_A)  # (6, N)
        M = soa.inv_sym_cols(cov_B + cov_rot[None]) * valid[:, None, :]
        w = jnp.sqrt(n_B)  # sqrt(#points) weight, fast_vgicp_impl.hpp:149

        p_b = jnp.broadcast_to(p_t[None], (k, 3, n))
        err, H, b = soa.linearize_cols(p_b, mu_B, M, w, valid)
        aux = (valid, M, w, mu_B)
        return (
            _psum(jnp.sum(err, 0)),
            _psum(jnp.sum(H, 0)),
            _psum(jnp.sum(b, 0)),
            aux,
        )

    def linearize(x):
        return linearize_frozen(x, freeze(x))

    def error(x, aux):
        valid, M, w, mu_B = aux
        p_t = soa.transform_cols(x, P)
        p_b = jnp.broadcast_to(p_t[None], (k, 3, n))
        return _psum(jnp.sum(soa.error_cols(p_b, mu_B, M, w, valid), 0))

    return _ret(linearize, error, freeze, linearize_frozen)


@partial(jax.jit, static_argnames=("config",))
@f32_matmuls
def vgicp_align(
    source,
    source_mask,
    source_covs,
    target,
    target_mask,
    target_covs,
    guess,
    config: VGICPConfig = VGICPConfig(),
) -> LsqResult:
    """Single-device voxelized-GICP align (voxel map built in-graph).

    With static grid_dims and additive accumulation (the default and the
    benchmark config) the target map is a `DenseRawGridMap`: one
    scatter-add build, one row-gather lookup per LM iteration.

    With config.refresh_iterations = R the solve is two-phase: R normal
    iterations (per-iteration voxel re-search, fast_vgicp_impl.hpp:119-180),
    then the correspondence set is frozen at the phase-1 pose and the
    remaining iterations run against it gather-free (see
    make_vgicp_objective's freeze contract).

    Runs in the target-centroid frame (see base.centered_frame_align);
    the returned pose and Hessian are world-frame."""

    def run(src_c, tgt_c, g):
        vmap = _build_target_map(tgt_c, target_mask, target_covs, config)
        offsets = jnp.asarray(
            neighbor_offsets(
                config.neighbor_search_method, config.neighbor_search_radius
            )
        )
        x0 = g.astype(src_c.dtype)
        R = config.refresh_iterations
        if not R or R >= config.lsq.max_iterations:
            linearize, error = make_vgicp_objective(
                src_c, source_mask, source_covs, vmap, offsets, config
            )
            return lsq_solve(linearize, error, x0, config.lsq)

        linearize, error, freeze, linearize_frozen = make_vgicp_objective(
            src_c, source_mask, source_covs, vmap, offsets, config,
            with_freeze=True,
        )
        p1 = lsq_solve(
            linearize, error, x0, config.lsq._replace(max_iterations=R)
        )
        frozen = freeze(p1.transformation)
        p2 = lsq_solve(
            lambda x: linearize_frozen(x, frozen),
            error,
            p1.transformation,
            config.lsq._replace(max_iterations=config.lsq.max_iterations - R),
        )
        return LsqResult(
            transformation=p2.transformation,
            hessian=p2.hessian,
            error=p2.error,
            converged=p2.converged,
            iterations=p1.iterations + p2.iterations,
        )

    return centered_frame_align(run, source, target, target_mask, guess)


def _build_target_map(target, target_mask, target_covs, config: VGICPConfig):
    if config.grid_dims is not None and config.voxel_accumulation in (
        "additive",
        "additive_weighted",
    ):
        return build_raw_grid(
            target, target_mask, config.resolution, target_covs,
            config.grid_dims,
        )
    covs = target_covs
    if covs is not None and covs.ndim == 2:  # (6, N) sym columns -> AoS
        covs = soa.sym_cols_to_rows9(covs).reshape(-1, 3, 3)
    return build_voxelmap(
        target,
        target_mask,
        config.resolution,
        covs=covs,
        mode=config.voxel_accumulation,
        grid_dims=config.grid_dims,
    )


@partial(jax.jit, static_argnames=("config",))
@f32_matmuls
def vgicp_mahalanobis(
    source, source_mask, source_covs, target, target_mask, target_covs,
    pose, config: VGICPConfig = VGICPConfig(),
):
    """Per-correspondence Mahalanobis matrices at `pose` — the debug surface
    of the reference's compute_mahalanobis (compute_mahalanobis.cu:10-72,
    which dumps to /tmp/vgicp_cuda_mahalanobis.txt).  Returns
    (M (K, 6, N) symmetric-6 columns, valid (K, N)); dump to disk yourself
    if you want the reference's text file."""
    vmap = build_voxelmap(
        target,
        target_mask,
        config.resolution,
        covs=target_covs,
        mode=config.voxel_accumulation,
        grid_dims=config.grid_dims,
    )
    offsets = jnp.asarray(
        neighbor_offsets(
            config.neighbor_search_method, config.neighbor_search_radius
        )
    )
    x = pose.astype(source.dtype)
    R = x[:3, :3]
    P = soa.cols_from_points(source)
    p_t = soa.transform_cols(x, P)
    coords = jnp.floor(p_t / vmap.resolution - 0.5).astype(jnp.int32)
    offs = offsets.T[:, :, None]
    vids = lookup_voxels_cols(
        vmap,
        coords[0][None, :] + offs[0],
        coords[1][None, :] + offs[1],
        coords[2][None, :] + offs[2],
    )
    valid = (vids >= 0) & source_mask[None, :]
    rows = vmap.packed[jnp.maximum(vids, 0)]
    _mu, cov_B, _n = soa.sym_cols_from_packed(rows)
    cov_rot = soa.rotate_sym_cols(R, soa.sym_cols_from_covs(source_covs))
    M = soa.inv_sym_cols(cov_B + cov_rot[None]) * valid[:, None, :]
    return M, valid


@partial(jax.jit, static_argnames=("config",))
@f32_matmuls
def vgicp_evaluate(
    source, source_mask, source_covs, target, target_mask, target_covs,
    pose, config: VGICPConfig = VGICPConfig(),
):
    """(error, H, b) of the VGICP objective at an arbitrary pose — the
    functional form of the reference's evaluateCost
    (lsq_registration_impl.hpp:48-50).  Evaluated in the target-centroid
    frame and reported world-frame (see base.centered_frame_evaluate)."""

    def run(src_c, tgt_c, p):
        vmap = _build_target_map(tgt_c, target_mask, target_covs, config)
        offsets = jnp.asarray(
            neighbor_offsets(
                config.neighbor_search_method, config.neighbor_search_radius
            )
        )
        linearize, _ = make_vgicp_objective(
            src_c, source_mask, source_covs, vmap, offsets, config
        )
        err, H, b, _aux = linearize(p)
        return err, H, b

    return centered_frame_evaluate(run, source, target, target_mask, pose)


@partial(jax.jit, static_argnames=("config", "kernel_width", "kernel_max_dist"))
@f32_matmuls
def vgicp_register(
    source,
    source_mask,
    target,
    target_mask,
    guess,
    config: VGICPConfig = VGICPConfig(),
    kernel_width: float = 0.5,
    kernel_max_dist: float = 3.0,
) -> LsqResult:
    """One-graph full registration: RBF covariances for BOTH clouds + align.

    The single-jit equivalent of the reference's per-align covariance
    re-estimation path (the `gicp_align` "100times" protocol,
    align.cpp:56-76) — no host round trips between covariance estimation,
    voxel-map build and the LM solve, so XLA overlaps them freely.
    """
    from ..ops.covariance import rbf_covariances

    scovs = rbf_covariances(
        source, source_mask, kernel_width=kernel_width, max_dist=kernel_max_dist
    )
    tcovs = rbf_covariances(
        target, target_mask, kernel_width=kernel_width, max_dist=kernel_max_dist
    )
    return vgicp_align(
        source, source_mask, scovs, target, target_mask, tcovs, guess, config
    )


@partial(jax.jit, static_argnames=(
    "config", "method", "k", "regularization", "kernel_width",
    "kernel_max_dist",
))
@f32_matmuls
def vgicp_register_fresh(
    source,
    source_mask,
    target,
    target_mask,
    guess,
    config: VGICPConfig = VGICPConfig(),
    method: str = "knn",
    k: int = 20,
    regularization: str = "plane",
    kernel_width: float = 0.5,
    kernel_max_dist: float = 3.0,
):
    """ONE-dispatch fresh class-API registration: covariance estimation
    for BOTH clouds (selected estimator, in-graph) + the full align.

    Returns (LsqResult, source_cov6, target_cov6) — the covariances come
    back as device-side sym-6 columns so the class API can cache them for
    the swap/reuse protocol with zero extra transfers.  Motivation: each
    separate jit call costs ~1.5 ms of dispatch on the remote-TPU tunnel,
    so the 3-call fresh path (2 estimations + align) paid ~4.5 ms/align
    before any device work (apps/align.py pipelined rows)."""
    from ..ops.covariance import estimate_covariance_cols

    scovs = estimate_covariance_cols(
        source, source_mask, method, k=k, regularization=regularization,
        kernel_width=kernel_width, kernel_max_dist=kernel_max_dist,
    )
    tcovs = estimate_covariance_cols(
        target, target_mask, method, k=k, regularization=regularization,
        kernel_width=kernel_width, kernel_max_dist=kernel_max_dist,
    )
    res = vgicp_align(
        source, source_mask, scovs, target, target_mask, tcovs, guess,
        config,
    )
    return res, scovs, tcovs


def vgicp_align_multires(
    source,
    source_mask,
    source_covs,
    target,
    target_mask,
    target_covs,
    guess,
    resolutions=(4.0, 1.0),
    config: VGICPConfig = VGICPConfig(),
) -> LsqResult:
    """Coarse-to-fine VGICP: run the align at each resolution in order,
    feeding each level's pose to the next.

    Single-resolution VGICP at r converges from guesses within roughly one
    voxel (~r meters); chaining a coarse level first widens the basin to the
    coarsest resolution — the standard recipe for loop closures and
    relocalization where the initial guess can be meters off.  Each level is
    the ordinary jitted `vgicp_align` (one compile per distinct resolution).
    """
    result = None
    x = guess
    for r in resolutions:
        level = config._replace(resolution=float(r))
        result = vgicp_align(
            source, source_mask, source_covs,
            target, target_mask, target_covs, x, level,
        )
        x = result.transformation
    return result


@dataclass
class FastVGICP(Registration):
    """Class-API VGICP; also hosts the CUDA variant's covariance selector
    (`set_nearest_neighbor_method("rbf")` == GPU_RBF_KERNEL,
    fast_vgicp_cuda.hpp:21-26) and kernel parameters
    (`set_kernel_params`, fast_vgicp_cuda_impl.hpp:44-50)."""

    resolution: float = 1.0
    neighbor_search_method: str = "direct1"
    neighbor_search_radius: float = 1.5
    voxel_accumulation: str = "additive"
    k_correspondences: int = 20
    regularization: str = "plane"
    covariance_estimation: str = "knn"  # "knn"|"rbf"|"adaptive"
    kernel_width: float = 0.5
    kernel_max_dist: float = 3.0
    # "auto": dense grid sized from the target extent (fastest); None: hash
    # map (unbounded scenes); or explicit static (Dx, Dy, Dz).
    grid_dims: object = "auto"

    def set_resolution(self, r: float) -> None:
        self.resolution = float(r)

    def set_neighbor_search_method(self, method: str, radius: float = None) -> None:
        # accept the reference's uppercase enum spellings ("DIRECT7", ...)
        self.neighbor_search_method = method.lower()
        if radius is not None:
            self.neighbor_search_radius = float(radius)

    def set_voxel_accumulation_mode(self, mode: str) -> None:
        self.voxel_accumulation = mode

    def set_correspondence_randomness(self, k: int) -> None:
        self.k_correspondences = int(k)

    def set_regularization_method(self, method: str) -> None:
        self.regularization = method

    def set_num_threads(self, n: int) -> None:  # API parity no-op
        del n

    def set_nearest_neighbor_method(self, method: str) -> None:
        # "knn" = GPU_BRUTEFORCE equivalent (on-device brute force),
        # "rbf" = GPU_RBF_KERNEL, "kdtree" = CPU_PARALLEL_KDTREE (native
        # host kd-tree feeding device covariance) — fast_vgicp_cuda.hpp:21.
        if method not in ("knn", "rbf", "kdtree"):
            raise ValueError(
                "covariance estimation must be 'knn', 'rbf', or 'kdtree'"
            )
        self.covariance_estimation = method

    def set_kernel_params(self, width: float, max_dist: float = None) -> None:
        # Default max_dist = 5 * width like fast_vgicp_cuda_impl.hpp:46-50.
        self.kernel_width = float(width)
        self.kernel_max_dist = (
            float(max_dist) if max_dist is not None else 5.0 * float(width)
        )

    def _ensure_covariances(self, cloud: Cloud) -> None:
        estimate_covariances(
            cloud,
            self.covariance_estimation,
            self.k_correspondences,
            self.regularization,
            kernel_width=self.kernel_width,
            kernel_max_dist=self.kernel_max_dist,
        )

    def set_grid_dims(self, dims) -> None:
        self.grid_dims = tuple(dims) if dims not in (None, "auto") else dims

    def _grid_dims(self, target: Cloud):
        if self.grid_dims == "auto":
            from ..ops.voxelmap import auto_grid_dims_from_extent

            lo, hi = target.extent()  # cached per cloud
            return auto_grid_dims_from_extent(lo, hi, self.resolution)
        return self.grid_dims

    def _config(self, grid_dims=None) -> VGICPConfig:
        return VGICPConfig(
            resolution=self.resolution,
            neighbor_search_method=self.neighbor_search_method,
            neighbor_search_radius=self.neighbor_search_radius,
            voxel_accumulation=self.voxel_accumulation,
            k_correspondences=self.k_correspondences,
            regularization=self.regularization,
            grid_dims=grid_dims,
            lsq=self._lsq_config(),
        )

    def _compute(self, source: Cloud, target: Cloud, guess):
        if (
            source.covs is None
            and target.covs is None
            and self.covariance_estimation in ("knn", "rbf", "adaptive")
        ):
            # fresh align = ONE dispatch (see vgicp_register_fresh); the
            # returned device-side covariances populate the cache so the
            # swap/reuse protocol behaves exactly as before
            res, scovs, tcovs = vgicp_register_fresh(
                source.points, source.mask, target.points, target.mask,
                guess, self._config(grid_dims=self._grid_dims(target)),
                method=self.covariance_estimation,
                k=self.k_correspondences,
                regularization=self.regularization,
                kernel_width=self.kernel_width,
                kernel_max_dist=self.kernel_max_dist,
            )
            source.covs, target.covs = scovs, tcovs
            return res
        self._ensure_covariances(source)
        self._ensure_covariances(target)
        return vgicp_align(
            source.points,
            source.mask,
            source.covs,
            target.points,
            target.mask,
            target.covs,
            guess,
            self._config(grid_dims=self._grid_dims(target)),
        )

    def _evaluate(self, source: Cloud, target: Cloud, pose):
        self._ensure_covariances(source)
        self._ensure_covariances(target)
        return vgicp_evaluate(
            source.points,
            source.mask,
            source.covs,
            target.points,
            target.mask,
            target.covs,
            pose,
            self._config(grid_dims=self._grid_dims(target)),
        )


# Alias mirroring the reference's CUDA class name: same objective, the
# "device" here is the TPU itself.
FastVGICPCuda = FastVGICP
