"""NDT (P2D / D2D) registration — the NDTCuda-equivalent.

Re-designs the reference's `NDTCuda` (ndt_cuda.hpp:22-71, ndt_cuda.cu:13-181,
ndt_compute_derivatives.cu): voxel maps built from RAW points with NDT
finalization cov = E[x x^T] - mu mu^T plus MIN_EIG regularization; P2D scores
raw source points against target voxel Gaussians (M = cov_B^-1), D2D scores
source voxel Gaussians against target voxels with
M = (cov_B + R_eval C_A R_eval^T)^-1; both use the Cauchy robust weight
w = c^2 / (c^2 + |e|^2) with c = voxel_resolution
(ndt_compute_derivatives.cu:15-18, :78, :150) and skip voxels with <= 6
points (:61-63, :132-134).

Key LM subtlety preserved: M is frozen at the linearization point (R_eval)
but the Cauchy weight depends on the TRIAL error — inner LM trials recompute
w from the trial pose, exactly like the reference's fused kernels which
evaluate w inline per call.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import se3
from ..ops import pallas_linearize, soa
from ..ops.voxelmap import (
    NdtGridMap,
    RawNdtGrid,
    build_ndt_grid_compact,
    build_ndt_raw_grid,
    build_voxelmap,
    lookup_ndt_cols,
    lookup_voxels_cols,
    neighbor_offsets,
)
from ..precision import f32_matmuls
from ..solver import LsqConfig, LsqResult, lsq_solve
from .base import (Cloud, Registration, centered_frame_align,
                   centered_frame_evaluate)

_MIN_VOXEL_POINTS = 6  # voxels with <= 6 points are skipped


class _FinPack(NamedTuple):
    """Finalized (16, L) frozen pack [mu, M, valid] rebuilt from a
    linearize aux (P2D two-phase fast path) — the pytree type tells the
    fused `linearize_frozen` to use the finalized kernel even on a raw
    map."""

    pack: jax.Array


class NDTConfig(NamedTuple):
    """Defaults match ndt_cuda.cu:21-22 (D2D, DIRECT7, resolution 1.0)."""

    resolution: float = 1.0
    distance_mode: str = "d2d"  # "p2d" | "d2d"
    neighbor_search_method: str = "direct7"
    neighbor_search_radius: float = 1.5
    grid_dims: tuple | None = None
    # D2D iterates the SOURCE voxel distributions every LM iteration; the
    # dense-grid build stores one candidate row per grid cell, of which only
    # a few percent are occupied at LiDAR densities.  Occupied voxels are
    # compacted into this static row budget before the solve (overflowing
    # voxels are dropped for the align — the reference's GPU hash similarly
    # drops on bucket overflow, gaussian_voxelmap.cu:37-52).
    max_source_voxels: int = 4096
    # Compact-finalize budget for the TARGET map's occupied voxels (see
    # voxelmap.build_ndt_grid_compact): occupied target voxels beyond it
    # are dropped (miss at lookup).  Only used on the grid_dims fast path.
    max_target_voxels: int = 8192
    # Two-phase solve like VGICPConfig.refresh_iterations: re-search voxel
    # correspondences for the first R LM iterations, then freeze the
    # gathered voxel rows and run the rest gather-free (M still re-frozen
    # from the current R_eval each linearization, weights still trial-pose
    # Cauchy).  None/>=max_iterations = re-search every iteration.
    refresh_iterations: int | None = None
    lsq: LsqConfig = LsqConfig()


def _ndt_voxelmap(points, mask, resolution, grid_dims=None):
    """NDT voxel map: raw-point statistics + MIN_EIG regularization
    (gaussian_voxelmap.cu ndt_finalize_voxels_kernel + ndt_cuda.cu:120-140).

    The eigenvalue clamp runs cols-native (sym-6 rows straight to the
    packed rows9 layout) — `regularize_covariances` would symmetrize and
    round-trip (N, 3, 3) AoS, whose elementwise ops pad to (N, 8, 128)
    tiles; this build runs twice per D2D align."""
    vm = build_voxelmap(points, mask, resolution, mode="raw", grid_dims=grid_dims)
    C6 = soa.sym_cols_from_covs(vm.covs)
    rows9 = soa.sym_cols_to_rows9(soa.clamp_eigs_cols(C6, 1e-3))
    packed = vm.packed.at[:, 3:12].set(rows9)
    return vm._replace(covs=rows9.reshape(-1, 3, 3), packed=packed)


def _cauchy_weight(resolution, e_norm_sq):
    c_sq = resolution * resolution
    return c_sq / (c_sq + e_norm_sq)


def _gather_voxel_rows(vmap, qx, qy, qz):
    """Gathered packed rows (..., 16) + found mask for either map type.

    NdtGridMap misses resolve to the all-zero sentinel row (count 0), so
    `found` is None — the `n_B > _MIN_VOXEL_POINTS` gate already covers
    them with no extra select."""
    if isinstance(vmap, NdtGridMap):
        return vmap.packed[lookup_ndt_cols(vmap, qx, qy, qz)], None
    vids = lookup_voxels_cols(vmap, qx, qy, qz)
    return vmap.packed[jnp.maximum(vids, 0)], vids >= 0


def _raw_finalized_cols(vmap: RawNdtGrid, qx, qy, qz, invert: bool):
    """Gather RAW rows for coord queries and finalize to
    (mu (..., 3, N), cov6-or-M (..., 6, N), count (..., N)) — the SoA
    twin of the fused kernel's in-kernel finalize (_ndt_raw_finalize):
    corner-relative moments divided out, MIN_EIG clamp, optional invert
    (P2D pre-inverts like the finalized freeze)."""
    rows = vmap.rows[lookup_ndt_cols(vmap, qx, qy, qz)]  # (..., 16)
    cnt = rows[..., 0]
    dtype = rows.dtype
    inv_n = jnp.where(cnt > 0, 1.0 / jnp.maximum(cnt, 1.0), 0.0)
    dmu = jnp.swapaxes(rows[..., 1:4], -1, -2) * inv_n[..., None, :]
    o = (jnp.stack([qx, qy, qz], axis=-2).astype(dtype) + 1.0) * (
        vmap.resolution
    )
    mu = o + dmu
    E6 = jnp.swapaxes(rows[..., 4:10], -1, -2) * inv_n[..., None, :]
    C6 = E6 - jnp.stack(
        [dmu[..., 0, :] * dmu[..., 0, :],
         dmu[..., 0, :] * dmu[..., 1, :],
         dmu[..., 0, :] * dmu[..., 2, :],
         dmu[..., 1, :] * dmu[..., 1, :],
         dmu[..., 1, :] * dmu[..., 2, :],
         dmu[..., 2, :] * dmu[..., 2, :]],
        axis=-2,
    )
    C6 = soa.clamp_eigs_cols(C6, 1e-3)
    if invert:
        C6 = soa.inv_sym_cols(C6)
    return mu, C6, cnt


def make_ndt_objective(
    src_means,
    src_mask,
    src_covs,  # None for P2D
    vmap,  # VoxelMap or GridVoxelMap
    offsets,
    config: NDTConfig,
    axis_name=None,
    with_freeze: bool = False,
):
    """(linearize_fn, error_fn) for P2D/D2D NDT, in SoA (n-last) layout
    (see ops/soa.py).

    With ``with_freeze=True`` returns (linearize, error, freeze,
    linearize_frozen, pack_from_aux): ``freeze(x)`` captures the gathered
    voxel rows (means, covariances, validity) at pose x;
    ``linearize_frozen(x, frozen)`` re-linearizes against them without
    re-searching — M is still re-frozen from the CURRENT linearization
    rotation (D2D) and the Cauchy weight still tracks the trial pose, so
    only the voxel assignment is pinned.  ``pack_from_aux`` (P2D only,
    else None) rebuilds the frozen state from a linearize's aux — M is
    pose-independent for P2D, so the two-phase solve can seed its frozen
    phase from the LAST refresh iteration's aux instead of paying one
    more re-search (~0.45 ms at L = 114k).  Used by `ndt_align`
    (config.refresh_iterations)."""
    n = src_means.shape[0]
    k = offsets.shape[0]
    P = soa.cols_from_points(src_means)  # (3, N)
    # source covariances arrive as (N, 3, 3) AoS or (6, N) sym columns
    # (the SoA covariance pipeline's native format), like make_vgicp_objective
    C_A = (
        None if src_covs is None
        else src_covs if (src_covs.ndim == 2 and src_covs.shape[0] == 6)
        else soa.sym_cols_from_covs(src_covs)
    )
    offs = offsets.T[:, :, None]  # (3, K, 1)

    def _psum(v):
        return v if axis_name is None else jax.lax.psum(v, axis_name)

    if pallas_linearize.supported(n * k):
        return _make_ndt_objective_fused(
            P, C_A, src_mask, vmap, offs, n, k, _psum, with_freeze
        )

    def weights(p_b, mu_B, valid):
        e_sq = jnp.sum((mu_B - p_b) ** 2, axis=-2)  # (K, N)
        return jnp.where(valid, _cauchy_weight(vmap.resolution, e_sq), 0.0)

    def freeze(x):
        p_t = soa.transform_cols(x, P)  # (3, N)
        coords = jnp.floor(p_t / vmap.resolution - 0.5).astype(jnp.int32)
        qx = coords[0][None, :] + offs[0]  # (K, N)
        qy = coords[1][None, :] + offs[1]
        qz = coords[2][None, :] + offs[2]
        if isinstance(vmap, RawNdtGrid):
            mu_B, cov_B, n_B = _raw_finalized_cols(
                vmap, qx, qy, qz, invert=C_A is None
            )
            return mu_B, cov_B, src_mask[None, :] & (
                n_B > _MIN_VOXEL_POINTS
            )
        rows, found = _gather_voxel_rows(vmap, qx, qy, qz)  # (K, N, 16)
        mu_B, cov_B, n_B = soa.sym_cols_from_packed(rows)
        # The voxel point count rides in the gathered packed rows — a
        # separate `counts[vids]` would be a 1-D int32 gather (scalar-core,
        # ~1 ms per refresh iteration at 7 x 16k queries).
        valid = src_mask[None, :] & (n_B > _MIN_VOXEL_POINTS)
        if found is not None:
            valid = valid & found
        if C_A is None:
            # P2D: M = cov_B^-1 is pose-independent — invert once at the
            # freeze instead of every frozen-phase linearization
            cov_B = soa.inv_sym_cols(cov_B)
        return mu_B, cov_B, valid

    def linearize_frozen(x, frozen):
        fin = isinstance(frozen, _FinPack)
        mu_B, cov_B, valid = frozen.pack if fin else frozen
        R = x[:3, :3]
        if fin or C_A is None:  # pack already holds M (P2D freeze, or a
            M = cov_B           # phase-2 state rebuilt from aux)
        else:  # D2D: M = (cov_B + R C_A R^T)^-1 at the linearization point
            M = soa.inv_sym_cols(cov_B + soa.rotate_sym_cols(R, C_A)[None])
        M = M * valid[:, None, :]
        p_t = soa.transform_cols(x, P)
        p_b = jnp.broadcast_to(p_t[None], (k, 3, n))
        w = weights(p_b, mu_B, valid)
        err, H, b = soa.linearize_cols(p_b, mu_B, M, w, valid)
        aux = (valid, M, mu_B)
        return (
            _psum(jnp.sum(err, 0)),
            _psum(jnp.sum(H, 0)),
            _psum(jnp.sum(b, 0)),
            aux,
        )

    def linearize(x):
        return linearize_frozen(x, freeze(x))

    def error(x, aux):
        valid, M, mu_B = aux
        p_t = soa.transform_cols(x, P)
        p_b = jnp.broadcast_to(p_t[None], (k, 3, n))
        w = weights(p_b, mu_B, valid)  # trial-pose Cauchy weight
        return _psum(jnp.sum(soa.error_cols(p_b, mu_B, M, w, valid), 0))

    def pack_from_aux(aux):
        valid, M, mu_B = aux
        return mu_B, M, valid  # P2D: M pose-independent == frozen cov_B^-1

    # pack_from_aux is P2D-only: for D2D it would anchor M at the last
    # refresh R_eval for the whole frozen phase, which lands 8 mm off the
    # full re-search solve on the coarse pair (test_ndt_two_phase_
    # refresh_matches_full) — D2D keeps the exact freeze(p1) re-search.
    if with_freeze:
        return (linearize, error, freeze, linearize_frozen,
                pack_from_aux if C_A is None else None)
    return linearize, error


def _make_ndt_objective_fused(P, C_A, src_mask, vmap, offs, n, k, _psum,
                              with_freeze, interpret=False):
    """Fused-kernel NDT objective: correspondences flattened to L = K*N
    lanes (offset-major, matching the lookup layout); each LM iteration
    is ONE voxel-row gather + one Pallas linearize launch, each inner
    trial one error launch.  The SoA path lowers to ~20 small XLA
    kernels per iteration, which dominates the solve at 2k source voxels
    (launch-bound; measured 1.8 ms of a 2.24 ms D2D align in the LM
    while_loop).  Semantics identical to the SoA path: M frozen at the
    linearization rotation, Cauchy weight from the trial pose
    (ndt_compute_derivatives.cu:75-78, :150)."""
    L = n * k
    raw = isinstance(vmap, RawNdtGrid)
    mode = ("p2d" if C_A is None else "d2d") + ("_raw" if raw else "")

    def _pad8(a):
        return jnp.concatenate([a, jnp.zeros((8 - a.shape[0], L), a.dtype)])

    P8 = _pad8(jnp.tile(P, (1, k)))  # (8, L) loop-invariant
    CA8 = (
        jnp.zeros((8, L), P.dtype) if C_A is None
        else _pad8(jnp.tile(C_A, (1, k)))
    )

    def freeze(x):
        p_t = soa.transform_cols(x, P)
        coords = jnp.floor(p_t / vmap.resolution - 0.5).astype(jnp.int32)
        qx = coords[0][None, :] + offs[0]  # (K, N)
        qy = coords[1][None, :] + offs[1]
        qz = coords[2][None, :] + offs[2]
        if raw:
            # RAW pack [o(3), cnt, sum d(3), sum dd(6), valid]: the voxel
            # corner comes from the QUERY coordinate (exact), and the
            # finalize + MIN_EIG clamp run inside the linearize kernel.
            # (A rows-major (L, 16) variant with the transpose in-kernel
            # was measured SLOWER on v5e — Mosaic's (2048, 16) block
            # transpose costs more than the XLA transpose, and the frozen
            # phase would re-transpose every iteration.)
            rows = vmap.rows[lookup_ndt_cols(vmap, qx, qy, qz)]
            ft = rows.reshape(L, 10).T  # one transpose per freeze
            valid = (
                jnp.tile(src_mask, k) & (ft[0] > _MIN_VOXEL_POINTS)
            ).astype(P.dtype)
            res = vmap.resolution
            o = jnp.stack(
                [(qx.reshape(L).astype(P.dtype) + 1.0) * res,
                 (qy.reshape(L).astype(P.dtype) + 1.0) * res,
                 (qz.reshape(L).astype(P.dtype) + 1.0) * res]
            )
            return jnp.concatenate(
                [o, ft[0:10], valid[None], jnp.zeros((2, L), P.dtype)]
            )  # (16, L)
        rows, found = _gather_voxel_rows(vmap, qx, qy, qz)  # (K, N, 16)
        ft = rows.reshape(L, 16).T  # one transpose per freeze
        valid = jnp.tile(src_mask, k) & (ft[12] > _MIN_VOXEL_POINTS)
        if found is not None:
            valid = valid & found.reshape(L)
        valid = valid.astype(P.dtype)
        cov6 = ft[jnp.array([3, 4, 5, 7, 8, 11])]
        if C_A is None:
            # P2D: M = cov_B^-1 is pose-independent — invert at the freeze
            cov6 = soa.inv_sym_cols(cov6)
        pack = jnp.concatenate(
            [ft[0:3], cov6, valid[None], jnp.zeros((6, L), P.dtype)]
        )  # (16, L): [mu, cov_B or M, valid]
        return pack

    def linearize_frozen(x, pack):
        # a _FinPack (rebuilt from aux) holds [mu, M, valid] with M
        # ALREADY inverted (frozen at the last refresh R_eval) — consume
        # it with the M-direct (p2d-style) kernel regardless of the
        # distance mode; pytree-type dispatch is trace-time
        fin = isinstance(pack, _FinPack)
        err, H, b, aux = pallas_linearize.ndt_linearize_pallas(
            P8, CA8, x, pack.pack if fin else pack, vmap.resolution,
            "p2d" if fin else mode, interpret=interpret
        )
        return _psum(err), _psum(H), _psum(b), aux

    def linearize(x):
        return linearize_frozen(x, freeze(x))

    def error(x, aux):
        return _psum(pallas_linearize.ndt_error_pallas(
            P8, aux, x, vmap.resolution, interpret=interpret
        ))

    def pack_from_aux(aux):
        # aux rows: [M (6), valid, mu (3), ...] -> M-direct pack
        # [mu, M, valid] (see linearize_frozen)
        return _FinPack(jnp.concatenate(
            [aux[7:10], aux[0:6], aux[6:7], jnp.zeros((6, L), P.dtype)]
        ))

    # P2D-only, like the SoA path: D2D's frozen phase must re-freeze M
    # from cov_B at each linearization (aux carries only M).
    if with_freeze:
        return (linearize, error, freeze, linearize_frozen,
                pack_from_aux if C_A is None else None)
    return linearize, error


@partial(jax.jit, static_argnames=("config",))
@f32_matmuls
def ndt_align(
    source,
    source_mask,
    target,
    target_mask,
    guess,
    config: NDTConfig = NDTConfig(),
) -> LsqResult:
    """Single-device NDT align; voxel maps built in-graph from raw points.

    With config.refresh_iterations = R the solve is two-phase like
    `vgicp_align`: R re-searching LM iterations, then the gathered voxel
    rows are frozen at the phase-1 pose and the rest run gather-free.

    Runs in the target-centroid frame (see base.centered_frame_align);
    the returned pose and Hessian are world-frame."""

    def run(src_c, tgt_c, g):
        x0 = g.astype(src_c.dtype)
        R = config.refresh_iterations
        if not R or R >= config.lsq.max_iterations:
            lin, err = _ndt_objective_for(
                src_c, source_mask, tgt_c, target_mask, config
            )
            return lsq_solve(lin, err, x0, config.lsq)

        lin, err, freeze, lin_frozen, pack_from_aux = _ndt_objective_for(
            src_c, source_mask, tgt_c, target_mask, config, with_freeze=True
        )
        return _two_phase_solve(
            lin, err, freeze, lin_frozen, pack_from_aux, x0, config
        )

    return centered_frame_align(run, source, target, target_mask, guess)


def _two_phase_solve(lin, err, freeze, lin_frozen, pack_from_aux, x0,
                     config: NDTConfig) -> LsqResult:
    """Refresh phase (R re-searching LM iterations) + frozen phase.

    P2D (pack_from_aux set): the frozen phase seeds from the LAST refresh
    iteration's aux — M is pose-independent, so that aux IS a valid
    frozen state and the extra re-search after phase 1 is deleted
    (~0.45 ms/align at L = 114k).  D2D re-freezes at the phase-1 pose
    (its frozen state carries cov_B, which aux does not)."""
    R = config.refresh_iterations
    cfg1 = config.lsq._replace(max_iterations=R)
    cfg2 = config.lsq._replace(
        max_iterations=config.lsq.max_iterations - R
    )
    if pack_from_aux is not None:
        p1, aux1 = lsq_solve(lin, err, x0, cfg1, with_aux=True)
        frozen = pack_from_aux(aux1)
    else:
        p1 = lsq_solve(lin, err, x0, cfg1)
        frozen = freeze(p1.transformation)
    p2 = lsq_solve(
        lambda x: lin_frozen(x, frozen), err, p1.transformation, cfg2
    )
    return LsqResult(
        transformation=p2.transformation,
        hessian=p2.hessian,
        error=p2.error,
        converged=p2.converged,
        iterations=p1.iterations + p2.iterations,
    )


def _compact_source_voxels(vm, max_voxels: int):
    """Gather occupied source voxels into a static-size compact row set.

    The dense-grid map stores one candidate row per cell; at LiDAR
    densities only a few percent are occupied, and D2D iterates every
    source row each LM iteration — compacting occupied voxels into
    `max_voxels` rows cuts that per-iteration cost ~capacity/occupied x.
    Occupied voxels beyond the budget are dropped for this align (cf. the
    reference GPU hash dropping on bucket-scan overflow,
    gaussian_voxelmap.cu:37-52)."""
    capacity = vm.means.shape[0]
    cap = min(max_voxels, capacity)
    occ = vm.counts > 0
    (idx,) = jnp.nonzero(occ, size=cap, fill_value=0)
    valid = jnp.arange(cap) < jnp.sum(occ.astype(jnp.int32))
    return vm.means[idx], valid, vm.covs[idx]


def _ndt_objective_for(
    source, source_mask, target, target_mask, config, with_freeze=False
):
    """Shared graph construction for align/evaluate."""
    if config.grid_dims is not None:
        # Fast path (round 5): the target map is the RAW claim + moment
        # accumulator only — finalize and MIN_EIG clamp run inside the
        # fused linearize kernel (or the SoA freeze), so the build is two
        # N-row scatter passes and nothing else.
        target_vm = build_ndt_raw_grid(
            target, target_mask, config.resolution, config.grid_dims
        )
    else:
        target_vm = _ndt_voxelmap(
            target, target_mask, config.resolution, grid_dims=None
        )
    if config.distance_mode == "p2d":
        return _ndt_objective_prebuilt(
            source, source_mask, None, target_vm, config,
            with_freeze=with_freeze,
        )
    if config.distance_mode == "d2d":
        if config.grid_dims is not None:
            _, stats = build_ndt_grid_compact(
                source, source_mask, config.resolution, config.grid_dims,
                budget=config.max_source_voxels,
                with_map=False, with_stats=True,
            )
            means, mask, covs = stats
        else:
            source_vm = _ndt_voxelmap(
                source, source_mask, config.resolution, grid_dims=None
            )
            means, mask, covs = _compact_source_voxels(
                source_vm, config.max_source_voxels
            )
        return _ndt_objective_prebuilt(
            source, source_mask, (means, mask, covs), target_vm, config,
            with_freeze=with_freeze,
        )
    raise ValueError(f"unknown NDT distance mode: {config.distance_mode}")


def _ndt_objective_prebuilt(
    source, source_mask, source_compact, target_vm, config,
    with_freeze=False,
):
    """Objective from PREBUILT per-cloud state: the target voxel map and
    (D2D) the compacted source voxel stats.  This is the reference's
    actual state model — NDTCudaCore keeps both voxelmaps alive across
    aligns and `swap_source_and_target` swaps them instead of rebuilding
    (ndt_cuda.cu:90-93) — so the class API caches these per Cloud."""
    offsets = jnp.asarray(
        neighbor_offsets(
            config.neighbor_search_method, config.neighbor_search_radius
        )
    )
    if source_compact is None:  # P2D: raw source points vs target voxels
        return make_ndt_objective(
            source, source_mask, None, target_vm, offsets, config,
            with_freeze=with_freeze,
        )
    means, mask, covs = source_compact
    return make_ndt_objective(
        means, mask, covs, target_vm, offsets, config,
        with_freeze=with_freeze,
    )


@partial(jax.jit, static_argnames=("config",))
def ndt_prepare_cloud(points, mask, config: NDTConfig):
    """Per-cloud NDT state: (voxel map, compacted source stats, centroid)
    — built once per cloud and cached by the class API (the reference
    builds voxelmaps at set_input_* time and swaps them,
    ndt_cuda.cu:70-93).  The map and stats are built in the CLOUD's
    centroid frame (survey-frame robustness, see
    base.centered_frame_align); `ndt_align_prebuilt` shifts frames at
    align time.  The compact stats exist only for D2D (P2D never
    consumes them; config is static, so the compaction traces away).

    Known quantization-level divergence from the functional `ndt_align`
    (advisor round-4): `ndt_align` voxelizes the source in the TARGET-
    centroid frame while this prepares each cloud in its OWN centroid
    frame, and floor(x/res - 0.5) binning is shift-dependent — so the
    class API and `ndt_align` can produce slightly different D2D source
    voxel SETS and thus slightly different (both valid) poses for the
    same inputs.  This mirrors the reference's own behavior (its voxel
    sets depend on the world frame the clouds arrive in); the divergence
    is pinned by tests/test_registration.py::
    test_ndt_class_api_matches_functional_within_quantization."""
    valid = mask.astype(points.dtype)
    c = jnp.sum(points * valid[:, None], axis=0) / jnp.maximum(
        jnp.sum(valid), 1.0
    )
    if config.grid_dims is not None:
        want_stats = config.distance_mode == "d2d"
        vm, compact = build_ndt_grid_compact(
            points - c, mask, config.resolution, config.grid_dims,
            budget=config.max_target_voxels, with_stats=want_stats,
        )
        if want_stats and config.max_source_voxels < config.max_target_voxels:
            # the class API serves BOTH roles from one cache entry; trim
            # the source stats to the source budget (drop tail rows)
            m, v, c6 = compact
            b = config.max_source_voxels
            compact = (m[:b], v[:b], c6[:, :b])
        return vm, compact, c
    vm = _ndt_voxelmap(
        points - c, mask, config.resolution, grid_dims=None
    )
    compact = (
        _compact_source_voxels(vm, config.max_source_voxels)
        if config.distance_mode == "d2d" else None
    )
    return vm, compact, c


@partial(jax.jit, static_argnames=("config",))
@f32_matmuls
def ndt_align_prebuilt(
    source,
    source_mask,
    source_compact,
    src_center,
    target_vm,
    tgt_center,
    guess,
    config: NDTConfig = NDTConfig(),
) -> LsqResult:
    """NDT align against prebuilt per-cloud state (see ndt_prepare_cloud);
    same two-phase refresh semantics as `ndt_align`.

    The solve runs in the TARGET-centroid frame (the target map is
    already built there); D2D source voxel means shift by
    (src_center - tgt_center), P2D raw points by -tgt_center, and the
    pose/Hessian conjugate back to world like base.centered_frame_align.
    """
    x0 = se3.conjugate_to_centered(guess.astype(source.dtype), tgt_center)
    src_c = source - tgt_center
    if config.distance_mode == "d2d":
        means, mask_c, covs = source_compact
        sc = (means + (src_center - tgt_center), mask_c, covs)
    else:
        sc = None
    R = config.refresh_iterations
    if not R or R >= config.lsq.max_iterations:
        lin, err = _ndt_objective_prebuilt(
            src_c, source_mask, sc, target_vm, config
        )
        res = lsq_solve(lin, err, x0, config.lsq)
    else:
        lin, err, freeze, lin_frozen, pack_from_aux = _ndt_objective_prebuilt(
            src_c, source_mask, sc, target_vm, config, with_freeze=True
        )
        res = _two_phase_solve(
            lin, err, freeze, lin_frozen, pack_from_aux, x0, config
        )
    A = se3.adjoint_translation(tgt_center)
    return res._replace(
        transformation=se3.conjugate_from_centered(
            res.transformation, tgt_center
        ),
        hessian=A.T @ res.hessian @ A,
    )


@partial(jax.jit, static_argnames=("config",))
@f32_matmuls
def ndt_register_fresh(
    source,
    source_mask,
    target,
    target_mask,
    guess,
    config: NDTConfig = NDTConfig(),
):
    """ONE-dispatch fresh class-API NDT registration: both clouds'
    per-cloud prepared state (ndt_prepare_cloud semantics — each in its
    OWN centroid frame, exactly what the class caches) + the prebuilt
    align, in a single jit call.

    Returns (LsqResult, target_state, source_state) where each state is
    the (voxel map, compact stats, centroid) tuple `_ensure_prepared`
    caches — the class API stores them device-side with zero extra
    dispatches.  Motivation: the 3-call fresh path (2 prepares + align)
    pays ~1.5 ms of tunnel dispatch per call (see
    vgicp.vgicp_register_fresh)."""
    tstate = ndt_prepare_cloud(target, target_mask, config)
    if config.distance_mode == "d2d":
        sstate = ndt_prepare_cloud(source, source_mask, config)
        res = ndt_align_prebuilt(
            source, source_mask, sstate[1], sstate[2],
            tstate[0], tstate[2], guess, config,
        )
    else:
        # P2D consumes raw source points only — no eager source prepare
        # (it would buy the swap protocol a cached map at ~0.45 ms of
        # extra device work EVERY fresh align; prepare lazily instead)
        sstate = None
        res = ndt_align_prebuilt(
            source, source_mask, None, tstate[2],
            tstate[0], tstate[2], guess, config,
        )
    return res, tstate, sstate


@partial(jax.jit, static_argnames=("config",))
@f32_matmuls
def ndt_evaluate(
    source, source_mask, target, target_mask, pose,
    config: NDTConfig = NDTConfig(),
):
    """(error, H, b) of the NDT objective at an arbitrary pose.
    Evaluated in the target-centroid frame and reported world-frame
    (see base.centered_frame_evaluate)."""

    def run(src_c, tgt_c, p):
        linearize, _ = _ndt_objective_for(
            src_c, source_mask, tgt_c, target_mask, config
        )
        err, H, b, _aux = linearize(p)
        return err, H, b

    return centered_frame_evaluate(run, source, target, target_mask, pose)


@dataclass
class NDTCuda(Registration):
    """Class-API NDT (name kept for reference parity; runs on TPU)."""

    resolution: float = 1.0
    distance_mode: str = "d2d"
    neighbor_search_method: str = "direct7"
    neighbor_search_radius: float = 1.5
    # "auto": dense grid sized from the clouds' extent; None: hash map.
    grid_dims: object = "auto"

    def set_resolution(self, r: float) -> None:
        self.resolution = float(r)

    def set_grid_dims(self, dims) -> None:
        self.grid_dims = tuple(dims) if dims not in (None, "auto") else dims

    def set_distance_mode(self, mode: str) -> None:
        mode = mode.lower()  # accept the reference's "P2D"/"D2D" spellings
        if mode not in ("p2d", "d2d"):
            raise ValueError("distance mode must be 'p2d' or 'd2d'")
        self.distance_mode = mode

    def set_neighbor_search_method(self, method: str, radius: float = None) -> None:
        # accept the reference's uppercase enum spellings ("DIRECT7", ...)
        self.neighbor_search_method = method.lower()
        if radius is not None:
            self.neighbor_search_radius = float(radius)

    def _config(self, grid_dims=None) -> NDTConfig:
        return NDTConfig(
            resolution=self.resolution,
            distance_mode=self.distance_mode,
            neighbor_search_method=self.neighbor_search_method,
            neighbor_search_radius=self.neighbor_search_radius,
            grid_dims=grid_dims,
            lsq=self._lsq_config(),
        )

    def _grid_dims(self, source: Cloud, target: Cloud):
        if self.grid_dims != "auto":
            return self.grid_dims
        import numpy as np

        from ..ops.voxelmap import auto_grid_dims_from_extent

        # Cover BOTH clouds (D2D builds a source voxel map too; grid-build
        # drops out-of-range voxels, so size for the union of extents).
        # Per-cloud extents are cached (Cloud.extent) — the union is pure
        # scalar arithmetic per align.
        slo, shi = source.extent()
        tlo, thi = target.extent()
        return auto_grid_dims_from_extent(
            np.minimum(slo, tlo), np.maximum(shi, thi), self.resolution
        )

    def _ensure_prepared(self, cloud: Cloud, config: NDTConfig):
        """Per-cloud voxel map + compact stats, cached on the Cloud (the
        reference builds voxelmaps at set_input_* and swaps them with the
        clouds, ndt_cuda.cu:70-93 — swap here moves the cache the same
        way).  Keyed by the map-shaping parameters plus the distance
        mode (P2D caches no compact stats; a later D2D align must not
        reuse that entry)."""
        key = (config.resolution, config.grid_dims,
               config.max_source_voxels, config.distance_mode)
        if cloud.ndt_cache is None or cloud.ndt_cache[0] != key:
            vm, compact, center = ndt_prepare_cloud(
                cloud.points, cloud.mask, config
            )
            cloud.ndt_cache = (key, vm, compact, center)
        return cloud.ndt_cache[1], cloud.ndt_cache[2], cloud.ndt_cache[3]

    def _compute(self, source: Cloud, target: Cloud, guess):
        config = self._config(grid_dims=self._grid_dims(source, target))
        key = (config.resolution, config.grid_dims,
               config.max_source_voxels, config.distance_mode)
        if (
            (source.ndt_cache is None or source.ndt_cache[0] != key)
            and (target.ndt_cache is None or target.ndt_cache[0] != key)
        ):
            # fresh align = ONE dispatch; the returned per-cloud states
            # populate both caches (see ndt_register_fresh)
            res, tstate, sstate = ndt_register_fresh(
                source.points, source.mask, target.points, target.mask,
                guess, config,
            )
            target.ndt_cache = (key,) + tuple(tstate)
            if sstate is not None:  # p2d prepares the source lazily
                source.ndt_cache = (key,) + tuple(sstate)
            return res
        target_vm, _, tgt_center = self._ensure_prepared(target, config)
        if self.distance_mode == "d2d":
            _, source_compact, src_center = self._ensure_prepared(
                source, config
            )
        else:
            source_compact = None
            src_center = tgt_center  # unused for p2d
        return ndt_align_prebuilt(
            source.points,
            source.mask,
            source_compact,
            src_center,
            target_vm,
            tgt_center,
            guess,
            config,
        )

    def _evaluate(self, source: Cloud, target: Cloud, pose):
        return ndt_evaluate(
            source.points,
            source.mask,
            target.points,
            target.mask,
            pose,
            self._config(grid_dims=self._grid_dims(source, target)),
        )


NDT = NDTCuda
