"""Fused Pallas linearize/error vs the SoA reference.

On CPU (the CI suite) the kernels run in Pallas interpret mode so a kernel
regression cannot land silently; on a real TPU the same tests exercise the
compiled Mosaic kernels.
"""

import jax
import jax.numpy as jnp
import numpy as np

# interpret=True executes the kernel body with jnp semantics on any backend.
INTERPRET = jax.default_backend() != "tpu"


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

    # SoA reference: the kernel applies the pose in-kernel (transform of
    # the source columns AND the R C_A R^T rotation), so the SoA side
    # transforms explicitly.
    P = soa.cols_from_points(p)
    P_t = soa.transform_cols(x, P)
    CA = soa.sym_cols_from_covs(covs_a)
    CB = soa.sym_cols_from_covs(covs_b)
    M = soa.inv_sym_cols(CB + soa.rotate_sym_cols(R, CA)) * valid[None, :]
    w = jnp.sqrt(counts)
    Q = soa.cols_from_points(q)
    err_s, H_s, b_s = soa.linearize_cols(P_t, Q, M, w, valid)

    # fused kernel
    rows = jnp.concatenate(
        [q, np.asarray(covs_b).reshape(n, 9), counts[:, None],
         jnp.zeros((n, 3), jnp.float32)], axis=1
    )
    pad8 = lambda a: jnp.concatenate([a, jnp.zeros((8 - a.shape[0], n), a.dtype)])
    err_f, H_f, b_f, aux = pallas_linearize.linearize_pallas(
        pad8(P), pad8(CA), x, rows.T,
        pad8(valid[None, :].astype(jnp.float32)),
        interpret=INTERPRET,
    )
    np.testing.assert_allclose(float(err_f), float(err_s), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(H_f), np.asarray(H_s),
                               rtol=3e-3, atol=0.5)
    np.testing.assert_allclose(np.asarray(b_f), np.asarray(b_s),
                               rtol=3e-3, atol=0.5)

    # error kernel vs SoA error at a different pose (the kernel applies
    # the trial pose in-kernel from the untransformed source columns)
    x2 = se3.se3_exp(jnp.asarray(np.float32([0.02, 0.01, -0.03, 0.1, 0.2, 0])))
    P2 = soa.transform_cols(x2, P)
    e_soa = soa.error_cols(P2, Q, M, w, valid)
    e_fused = pallas_linearize.error_pallas(pad8(P), aux, x2,
                                            interpret=INTERPRET)
    np.testing.assert_allclose(float(e_fused), float(e_soa), rtol=1e-4)


def test_nn_search_matches_xla(rng):
    from fast_gicp_tpu.ops import neighbors, pallas_kernels

    nq, nt = 512, 2048
    q = jnp.asarray(rng.normal(size=(nq, 3)).astype(np.float32) * 10)
    t = jnp.asarray(rng.normal(size=(nt, 3)).astype(np.float32) * 10)
    tmask = jnp.asarray(rng.uniform(size=nt) > 0.1)

    idx_p, sq_p = pallas_kernels.nn_search_pallas(q, t, tmask,
                                                  interpret=INTERPRET)
    idx_x, sq_x = neighbors.nn_search(q, t, tmask)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    # The XLA path computes |q|^2 - 2qt + |t|^2 (dot form); the kernel uses
    # exact squared differences — they agree only to f32 cancellation.
    np.testing.assert_allclose(np.asarray(sq_p), np.asarray(sq_x),
                               rtol=1e-3, atol=1e-3)


def test_nn_search_culling_edge_cases(rng):
    """The two-pass tile culling must stay EXACT when its pass-1 heuristic
    misses: query tiles entirely outside the target extent (no gap-0 tile
    -> BIG bound fallback), spatially sorted clouds (tight disjoint tile
    bboxes -> aggressive pass-2 culling), and heavily masked targets."""
    from fast_gicp_tpu.ops import neighbors, pallas_kernels

    nq, nt = 1024, 2048
    # sorted query cloud: two distant clusters, lexicographically ordered
    a = rng.normal(size=(nq // 2, 3)) * 2.0
    b = rng.normal(size=(nq // 2, 3)) * 2.0 + np.float32([200.0, 0, 0])
    q = np.concatenate([a, b]).astype(np.float32)
    q = q[np.lexsort(q.T[::-1])]
    # target covers only the FIRST cluster -> every far-cluster query tile
    # has gap > 0 to all target tiles and must take the fallback row
    t = (rng.normal(size=(nt, 3)) * 2.0).astype(np.float32)
    t = t[np.lexsort(t.T[::-1])]
    tmask = rng.uniform(size=nt) > 0.5  # heavy masking

    idx_p, sq_p = pallas_kernels.nn_search_pallas(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(tmask),
        interpret=INTERPRET)
    idx_x, sq_x = neighbors.nn_search(
        jnp.asarray(q), jnp.asarray(t), jnp.asarray(tmask))
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_allclose(np.asarray(sq_p), np.asarray(sq_x),
                               rtol=1e-3, atol=1e-3)


def test_radius_window_moments_matches_xla_fallback(rng):
    """Adaptive-radius covariance kernel (interpret) vs the chunked-XLA
    fallback: same ladder semantics, so counts/rungs must agree exactly and
    moments to bf16-split accumulation noise."""
    from fast_gicp_tpu.ops import covariance, pallas_kernels

    n = 2048
    pts = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32) * 5)
    mask = jnp.asarray(rng.uniform(size=n) > 0.1)
    r2 = jnp.asarray(covariance.default_radius_ladder())
    mvalid = mask.astype(jnp.float32)
    center = jnp.sum(pts * mvalid[:, None], 0) / jnp.sum(mvalid)

    m_k = pallas_kernels.radius_window_moments_T(
        pts, mask, pts, mask, r2, 20, center, interpret=INTERPRET)
    m_x = covariance._radius_window_moments_xla(pts, mask, r2, 20, center)
    # masked QUERY rows are garbage in both paths (the kernel parks them
    # at MASK_COORD, the fallback does not) — compare valid rows only
    v = np.asarray(mask)
    # counts are integers accumulated in f32 — exact
    np.testing.assert_array_equal(np.asarray(m_k[0])[v], np.asarray(m_x[0])[v])
    # full-f32 moment matmul (see _window_kernel): near-exact, only
    # summation order differs from the fallback
    np.testing.assert_allclose(np.asarray(m_k[:13])[:, v],
                               np.asarray(m_x[:13])[:, v],
                               rtol=2e-5, atol=1e-3)


def test_adaptive_radius_covariances_match_knn(rng):
    """The adaptive estimator's plane-regularized covariances must agree
    with the kNN estimator's on the dominant statistic (the plane normal):
    both describe the same local surface."""
    from fast_gicp_tpu.ops.covariance import (
        adaptive_radius_covariances, knn_covariances,
    )

    n = 2048
    # a bumpy surface — realistic neighborhood anisotropy
    xy = rng.uniform(-10, 10, size=(n, 2)).astype(np.float32)
    z = (0.3 * np.sin(xy[:, 0]) + 0.05 * rng.normal(size=n)).astype(np.float32)
    pts = jnp.asarray(np.column_stack([xy, z]))
    mask = jnp.ones(n, bool)

    c_a = np.asarray(adaptive_radius_covariances(pts, mask, k=20))
    c_k = np.asarray(knn_covariances(pts, mask, k=20, approx=False))
    # plane regularization -> covs are I - (1 - eps) n n^T; compare the
    # implied normals via the covariance difference norm
    # (identical normals -> identical matrices)
    diff = np.linalg.norm(c_a - c_k, axis=(1, 2))
    # allow a small tail of genuinely ambiguous neighborhoods
    assert np.quantile(diff, 0.9) < 0.35, np.quantile(diff, 0.9)
    assert np.median(diff) < 0.12, np.median(diff)


def _rbf_reference(points, mask, kernel_width, max_dist):
    """Dense f64 reference for the RBF raw moments."""
    x = np.asarray(points, np.float64)
    m = np.asarray(mask, bool)
    d = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    w = np.where((d <= max_dist**2) & m[None, :], np.exp(-kernel_width * d), 0.0)
    s_w = w.sum(1)
    s_wx = w @ x
    s_wxx = np.einsum("qt,ti,tj->qij", w, x, x)
    return s_w, s_wx, s_wxx


def test_rbf_moments_matches_reference(rng):
    from fast_gicp_tpu.ops import pallas_kernels

    n = 2048
    x = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
    mask = rng.uniform(size=n) > 0.1
    out = pallas_kernels.rbf_moments_pallas(
        jnp.asarray(x), jnp.asarray(mask), 0.5, 3.0, interpret=INTERPRET
    )
    s_w, s_wx, s_wxx = _rbf_reference(x, mask, 0.5, 3.0)
    # Masked QUERY rows are parked at MASK_COORD by the kernel (their
    # results are unused downstream); compare valid rows only.
    out = np.asarray(out)[mask]
    s_w, s_wx, s_wxx = s_w[mask], s_wx[mask], s_wxx[mask]
    nv = out.shape[0]
    np.testing.assert_allclose(out[:, 0], s_w, rtol=5e-3, atol=1e-4)
    np.testing.assert_allclose(out[:, 1:4], s_wx, rtol=5e-3, atol=2e-2)
    np.testing.assert_allclose(
        out[:, 4:13].reshape(nv, 3, 3), s_wxx, rtol=5e-3, atol=5e-2
    )


def test_rbf_covariance_far_from_origin(rng):
    """The advisor's regression case: a cloud offset ~80 m from the origin.
    Uncentered bf16 moments would corrupt the covariances by O(25 m^2);
    centered hi/lo moments must keep them within a few percent."""
    from fast_gicp_tpu.ops import pallas_kernels

    n = 2048
    local = rng.normal(size=(n, 3)).astype(np.float32)  # ~1 m clusters
    offset = np.float32([80.0, -55.0, 20.0])
    x = local + offset
    mask = np.ones(n, bool)

    out = np.asarray(
        pallas_kernels.rbf_moments_pallas(
            jnp.asarray(x), jnp.asarray(mask), 0.5, 3.0, interpret=INTERPRET
        )
    )
    _assert_cov_close(out, x, mask)


def test_rbf_covariance_wide_extent(rng):
    """LiDAR-scale INTERNAL extent (+-60 m clusters): centering does not
    help here, only the hi/lo feature split does.  Guards against the
    split degenerating to single bf16 (XLA elides an f32->bf16->f32
    round-trip under jit, which once silently produced 0.004|y|^2 ~ 14 m^2
    covariance errors on exactly this geometry)."""
    from fast_gicp_tpu.ops import pallas_kernels

    n = 2048
    centers = rng.uniform(-60, 60, (64, 3)).astype(np.float32)
    centers[:, 2] *= 0.05
    x = (centers[rng.integers(0, 64, n)]
         + rng.normal(size=(n, 3))).astype(np.float32)
    mask = np.ones(n, bool)

    out = np.asarray(
        pallas_kernels.rbf_moments_pallas(
            jnp.asarray(x), jnp.asarray(mask), 0.5, 3.0, interpret=INTERPRET
        )
    )
    _assert_cov_close(out, x, mask)


def _assert_cov_close(out, x, mask):
    """Covariances derived from kernel moments must match the f64
    reference (the cancellation-sensitive output)."""
    n = x.shape[0]
    s_w, s_wx, s_wxx = _rbf_reference(x, mask, 0.5, 3.0)

    def covs(sw, swx, swxx):
        sw = np.maximum(sw, 1e-9)
        mean = swx / sw[:, None]
        return swxx / sw[:, None, None] - np.einsum(
            "ni,nj->nij", mean, mean
        )

    c_ref = covs(s_w, s_wx, s_wxx)
    c_out = covs(out[:, 0], out[:, 1:4], out[:, 4:13].reshape(n, 3, 3))
    live = s_w > 1.0  # queries with a real neighborhood
    scale = np.abs(np.trace(c_ref[live], axis1=1, axis2=2) / 3).mean()
    err = np.abs(c_out - c_ref)[live].max()
    assert err < 0.05 * max(scale, 1.0), (err, scale)


def test_fused_model_paths_interpret(rng, monkeypatch):
    """Trace the MODEL-level fused closures (gicp.py / vgicp.py) with the
    Pallas kernels forced on in interpret mode.

    The fused branches only activate when `pallas_linearize.supported()`
    is true (TPU + tile-aligned n), so the CPU suite normally never traces
    them — a stale `error_pallas` call signature in gicp.py once survived
    a green CI run that way.  This test pins the model<->kernel contract
    (argument order, padding/layout conventions) on every backend, and
    checks the fused solve lands on the same pose as the XLA path."""
    from fast_gicp_tpu import se3
    from fast_gicp_tpu.models import gicp, vgicp
    from fast_gicp_tpu.ops import pallas_linearize

    n = pallas_linearize._NT  # one grid step per kernel launch
    base = rng.uniform(0.0, 12.0, (n, 3)).astype(np.float32)
    base[:, 2] *= 0.25
    x_true = se3.se3_exp(
        jnp.asarray(np.float32([0.01, -0.02, 0.015, 0.08, -0.05, 0.03]))
    )
    target = jnp.asarray(base)
    source = jnp.asarray(
        (base - np.asarray(x_true[:3, 3]))
        @ np.asarray(x_true[:3, :3])  # == R^-1 (p - t): exact inverse map
    )
    mask = jnp.ones(n, bool)
    covs = jnp.broadcast_to(0.05 * jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    guess = jnp.eye(4, dtype=jnp.float32)

    def _solve_all():
        poses = [
            gicp.gicp_align(source, mask, covs, target, mask, covs, guess).transformation
        ]
        for grid_dims in ((24, 24, 16), None):  # raw dense grid + hash map
            cfg = vgicp.VGICPConfig(resolution=0.5, grid_dims=grid_dims)
            poses.append(
                vgicp.vgicp_align(
                    source, mask, covs, target, mask, covs, guess, cfg
                ).transformation
            )
        return [np.asarray(p) for p in poses]

    xla_poses = _solve_all()

    monkeypatch.setattr(
        pallas_linearize, "supported",
        lambda m: m % pallas_linearize._NT == 0,
    )
    for name in ("linearize_pallas", "linearize_raw_pallas", "error_pallas"):
        orig = getattr(pallas_linearize, name)
        monkeypatch.setattr(
            pallas_linearize, name,
            (lambda o: lambda *a: o(*a, interpret=True))(orig),
        )
    fused_poses = _solve_all()

    for x_f, x_x in zip(fused_poses, xla_poses):
        np.testing.assert_allclose(x_f, np.asarray(x_true), atol=5e-3)
        np.testing.assert_allclose(x_f, x_x, atol=1e-3)


def test_fused_ndt_objective_matches_soa(rng):
    """The fused NDT linearize/error kernels (D2D and P2D) against the
    SoA objective on the same frozen state — M frozen at the
    linearization rotation, Cauchy weight from the (trial) pose."""
    import numpy as np

    from fast_gicp_tpu import se3
    from fast_gicp_tpu.models import ndt as ndt_mod
    from fast_gicp_tpu.ops import soa
    from fast_gicp_tpu.ops.voxelmap import auto_grid_dims, neighbor_offsets

    n = 2048
    pts_np = (rng.uniform(size=(n, 3)) * 16 - 8).astype(np.float32)
    src = jnp.asarray(pts_np + rng.normal(size=(n, 3)).astype(np.float32) * 0.05)
    mask = jnp.asarray(np.arange(n) < n - 100)
    tgt = jnp.asarray(pts_np)
    tmask = jnp.ones(n, bool)
    dims = auto_grid_dims(pts_np, 1.0)
    vm = ndt_mod._ndt_voxelmap(tgt, tmask, 1.0, grid_dims=dims)
    offsets = jnp.asarray(neighbor_offsets("direct7"))
    offs = offsets.T[:, :, None]
    x = se3.se3_exp(jnp.asarray(np.float32([0.02, -0.01, 0.03, 0.1, -0.2, 0.05])))
    x2 = se3.se3_exp(jnp.asarray(np.float32([-0.01, 0.02, 0.0, 0.05, 0.1, -0.1])))
    cfg = ndt_mod.NDTConfig(resolution=1.0, grid_dims=dims)

    A = rng.normal(size=(n, 3, 3)).astype(np.float32)
    covs_a = jnp.asarray(A @ np.swapaxes(A, 1, 2) + 0.1 * np.eye(3, dtype=np.float32))

    for mode_covs in (covs_a, None):  # d2d, p2d
        lin_s, err_s = ndt_mod.make_ndt_objective(
            src, mask, mode_covs, vm, offsets, cfg
        )
        P = soa.cols_from_points(src)
        C_A = None if mode_covs is None else soa.sym_cols_from_covs(mode_covs)
        lin_f, err_f = ndt_mod._make_ndt_objective_fused(
            P, C_A, mask, vm, offs, n, offsets.shape[0],
            lambda v: v, False, interpret=True,
        )
        e_s, H_s, b_s, aux_s = lin_s(x)
        e_f, H_f, b_f, aux_f = lin_f(x)
        np.testing.assert_allclose(float(e_f), float(e_s), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(H_f), np.asarray(H_s),
                                   rtol=3e-3, atol=0.3)
        np.testing.assert_allclose(np.asarray(b_f), np.asarray(b_s),
                                   rtol=3e-3, atol=0.3)
        # trial error at another pose against each frozen aux
        t_s = float(err_s(x2, aux_s))
        t_f = float(err_f(x2, aux_f))
        np.testing.assert_allclose(t_f, t_s, rtol=1e-4)


def test_fused_ndt_raw_objective_matches_soa(rng):
    """The round-5 RAW-map NDT kernels (in-kernel finalize + MIN_EIG
    clamp, voxel corner reconstructed from the query coordinate) against
    the SoA raw freeze AND against the finalized-map SoA objective —
    the raw path must reproduce the finalized statistics exactly
    (same moments, same clamp; only the evaluation site moves)."""
    import numpy as np

    from fast_gicp_tpu import se3
    from fast_gicp_tpu.models import ndt as ndt_mod
    from fast_gicp_tpu.ops import soa
    from fast_gicp_tpu.ops.voxelmap import (
        auto_grid_dims, build_ndt_raw_grid, neighbor_offsets,
    )

    n = 2048
    pts_np = (rng.uniform(size=(n, 3)) * 16 - 8).astype(np.float32)
    src = jnp.asarray(pts_np + rng.normal(size=(n, 3)).astype(np.float32) * 0.05)
    mask = jnp.asarray(np.arange(n) < n - 100)
    tgt = jnp.asarray(pts_np)
    tmask = jnp.ones(n, bool)
    dims = auto_grid_dims(pts_np, 1.0)
    raw_vm = build_ndt_raw_grid(tgt, tmask, 1.0, dims)
    fin_vm = ndt_mod._ndt_voxelmap(tgt, tmask, 1.0, grid_dims=dims)
    offsets = jnp.asarray(neighbor_offsets("direct7"))
    offs = offsets.T[:, :, None]
    x = se3.se3_exp(jnp.asarray(np.float32([0.02, -0.01, 0.03, 0.1, -0.2, 0.05])))
    x2 = se3.se3_exp(jnp.asarray(np.float32([-0.01, 0.02, 0.0, 0.05, 0.1, -0.1])))
    cfg = ndt_mod.NDTConfig(resolution=1.0, grid_dims=dims)

    A = rng.normal(size=(n, 3, 3)).astype(np.float32)
    covs_a = jnp.asarray(A @ np.swapaxes(A, 1, 2) + 0.1 * np.eye(3, dtype=np.float32))

    for mode_covs in (covs_a, None):  # d2d, p2d
        # SoA objective on the RAW map
        lin_r, err_r = ndt_mod.make_ndt_objective(
            src, mask, mode_covs, raw_vm, offsets, cfg
        )
        # SoA objective on the FINALIZED map (round-4 semantics)
        lin_s, err_s = ndt_mod.make_ndt_objective(
            src, mask, mode_covs, fin_vm, offsets, cfg
        )
        e_r, H_r, b_r, aux_r = lin_r(x)
        e_s, H_s, b_s, _ = lin_s(x)
        np.testing.assert_allclose(float(e_r), float(e_s), rtol=2e-4)
        np.testing.assert_allclose(np.asarray(H_r), np.asarray(H_s),
                                   rtol=3e-3, atol=0.3)
        np.testing.assert_allclose(np.asarray(b_r), np.asarray(b_s),
                                   rtol=3e-3, atol=0.3)

        # fused raw kernels (interpret mode) vs the SoA raw objective
        P = soa.cols_from_points(src)
        C_A = None if mode_covs is None else soa.sym_cols_from_covs(mode_covs)
        lin_f, err_f = ndt_mod._make_ndt_objective_fused(
            P, C_A, mask, raw_vm, offs, n, offsets.shape[0],
            lambda v: v, False, interpret=True,
        )
        e_f, H_f, b_f, aux_f = lin_f(x)
        np.testing.assert_allclose(float(e_f), float(e_r), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(H_f), np.asarray(H_r),
                                   rtol=3e-3, atol=0.3)
        np.testing.assert_allclose(np.asarray(b_f), np.asarray(b_r),
                                   rtol=3e-3, atol=0.3)
        t_r = float(err_r(x2, aux_r))
        t_f = float(err_f(x2, aux_f))
        np.testing.assert_allclose(t_f, t_r, rtol=1e-4)
