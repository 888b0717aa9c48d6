"""Degenerate-input robustness: the registration stack must stay finite
and well-behaved on inputs that would crash or poison a naive pipeline.

The reference inherits PCL's behavior here (kd-tree on < k points,
SelfAdjointEigenSolver on rank-deficient covariances); this TPU stack has
its own failure surfaces (masked sentinels at 1e9, closed-form eigen
clamps, det-clamped inverses, Cholesky clamps) — pin that each one
degrades gracefully instead of emitting NaN poses."""

import jax.numpy as jnp
import numpy as np
import pytest

from fast_gicp_tpu import FastGICP, FastVGICP
from fast_gicp_tpu.models.ndt import NDTCuda


def _finite_pose(est):
    assert np.isfinite(np.asarray(est)).all(), est


def _shifted(pts, d=(0.05, -0.03, 0.02)):
    return pts + np.float32(d)


def test_fewer_points_than_k():
    """Clouds with fewer points than k_correspondences=20: the kNN search
    returns masked sentinels among the k; covariance weighting must drop
    them (not drag covariances toward the padded zeros)."""
    rng = np.random.default_rng(0)
    pts = (rng.uniform(size=(12, 3)) * 4).astype(np.float32)
    reg = FastGICP()
    reg.set_input_target(pts)
    reg.set_input_source(_shifted(pts))
    est = reg.align()
    _finite_pose(est)
    # recovered translation is the shift (well-conditioned tiny problem)
    assert np.linalg.norm(est[:3, 3] - np.float32([-0.05, 0.03, -0.02])) < 0.05


def test_collinear_cloud_rank_deficient_covariances():
    """All points on a line: every neighborhood covariance is rank-1 and
    the plane regularization / Mahalanobis inverses hit their clamps; the
    solve must stay finite (accuracy on a line is unobservable sideways,
    only finiteness and convergence flags are contractual)."""
    t = np.linspace(0.0, 10.0, 300, dtype=np.float32)
    pts = np.stack([t, 2.0 * t, -t], axis=1)
    pts += np.random.default_rng(1).normal(
        size=pts.shape).astype(np.float32) * 1e-4
    for make in (FastGICP, FastVGICP):
        reg = make()
        reg.set_input_target(pts)
        reg.set_input_source(_shifted(pts, (0.02, 0.04, -0.02)))
        est = reg.align()
        _finite_pose(est)


def _residual(est, src, tgt):
    """Mean nearest-target distance of the aligned source (registration
    quality in cloud space — immune to the rotation-times-lever-arm pose
    ambiguity that dominates raw-translation comparisons on offset or
    degenerate clouds)."""
    aligned = src @ np.asarray(est)[:3, :3].T + np.asarray(est)[:3, 3]
    d = np.linalg.norm(aligned[:, None, :] - tgt[None, :, :], axis=-1)
    return float(d.min(axis=1).mean())


def test_coplanar_cloud():
    """A perfect plane: the z direction is degenerate (rank-2 world).
    GICP's point-to-point 1-NN correspondences recover the in-plane shift
    exactly; VGICP's voxel-mean correspondences carry an inherent
    quantization bias on sparse single-voxel-thick geometry (true of the
    reference's FastVGICP too) — it must stay finite and not diverge."""
    rng = np.random.default_rng(2)
    xy = (rng.uniform(size=(800, 2)) * 10).astype(np.float32)
    pts = np.concatenate([xy, np.zeros((800, 1), np.float32)], axis=1)
    src = _shifted(pts, (0.1, -0.05, 0.0))
    before = _residual(np.eye(4), src, pts)

    reg = FastGICP()
    reg.set_input_target(pts)
    reg.set_input_source(src)
    est = reg.align()
    _finite_pose(est)
    assert _residual(est, src, pts) < 1e-3  # exact in-plane recovery

    reg = FastVGICP()
    reg.set_input_target(pts)
    reg.set_input_source(src)
    est = reg.align()
    _finite_pose(est)
    assert _residual(est, src, pts) < before  # no divergence


def test_zero_overlap_clouds():
    """Disjoint clouds 100 m apart: with the default infinite
    correspondence distance the objective still pulls somewhere, but the
    pose must remain finite; with a gate, everything is invalid and the
    solve must not divide by zero."""
    rng = np.random.default_rng(3)
    a = (rng.uniform(size=(500, 3)) * 5).astype(np.float32)
    b = a + np.float32([100.0, 0.0, 0.0])
    reg = FastGICP()
    reg.set_max_correspondence_distance(1.0)  # gates out every pair
    reg.set_input_target(a)
    reg.set_input_source(b)
    est = reg.align()
    _finite_pose(est)

    reg2 = NDTCuda()
    reg2.set_input_target(a)
    reg2.set_input_source(b)
    _finite_pose(reg2.align())


def test_single_point_clouds():
    """One-point clouds: covariances are zero-rank, counts below the NDT
    voxel gate — nothing downstream may NaN."""
    a = np.float32([[1.0, 2.0, 3.0]])
    b = np.float32([[1.1, 2.0, 3.0]])
    for make in (FastGICP, FastVGICP):
        reg = make()
        reg.set_input_target(a)
        reg.set_input_source(b)
        _finite_pose(reg.align())


def test_duplicate_points():
    """Exact duplicates: zero-distance neighbors (distance ties at 0) and
    zero-variance neighborhoods must not blow up the packed-key selection
    or the covariance finalize."""
    rng = np.random.default_rng(4)
    base = (rng.uniform(size=(100, 3)) * 5).astype(np.float32)
    pts = np.repeat(base, 4, axis=0)  # every point 4x
    reg = FastGICP()
    reg.set_input_target(pts)
    reg.set_input_source(_shifted(pts))
    est = reg.align()
    _finite_pose(est)
    assert np.linalg.norm(est[:3, 3] - np.float32([-0.05, 0.03, -0.02])) < 0.05


def test_huge_coordinates():
    """Coordinates ~1e4 m from the origin (UTM/survey frames): the
    centered-frame solve (base.centered_frame_align) and the centered
    fallback searches must keep registration working where the naive f32
    pipeline collapses (measured pre-fix: NN distances all rounded to 0,
    GICP poses went NaN, accepted steps were ~1e-4).  Raw translation is
    NOT the metric at 1e4 m lever arms — a 1e-5 rad rotation ambiguity
    moves it by decimeters — so registration quality is asserted in
    cloud space."""
    rng = np.random.default_rng(5)
    pts = (rng.uniform(size=(2000, 3)) * 20).astype(np.float32)
    pts += np.float32([1e4, -2e4, 300.0])
    src = _shifted(pts, (0.2, 0.1, -0.1))
    for make in (FastVGICP, FastGICP):
        reg = make()
        reg.set_input_target(pts)
        reg.set_input_source(src)
        est = reg.align()
        _finite_pose(est)
        before = _residual(np.eye(4), src, pts)
        after = _residual(est, src, pts)
        assert after < 0.3 * before, (make.__name__, after, before)


def test_ndt_class_survey_frame_matches_origin():
    """The NDT class API (prebuilt per-cloud maps) must register
    survey-frame clouds exactly as well as origin-frame ones — the
    per-cloud-centroid map builds + target-frame conjugation
    (ndt_prepare_cloud / ndt_align_prebuilt) carry the centered-frame
    fix to the cached-map path."""
    rng = np.random.default_rng(7)
    g = np.stack(
        np.meshgrid(np.linspace(0, 15, 40), np.linspace(0, 15, 40)), -1
    ).reshape(-1, 2).astype(np.float32)
    pts = np.concatenate([
        np.concatenate([g, np.abs(np.sin(g[:, :1]))], 1),
        np.concatenate(
            [g[:, :1], np.full((len(g), 1), 2.0, np.float32), g[:, 1:]], 1
        ),
    ]).astype(np.float32)
    pts += rng.normal(size=pts.shape).astype(np.float32) * 0.03
    results = {}
    for name, off in (("origin", np.float32([0, 0, 0])),
                      ("survey", np.float32([1e4, -2e4, 300.0]))):
        src = pts + off + np.float32([0.2, 0.1, -0.1])
        tgt = pts + off
        reg = NDTCuda()
        reg.set_input_target(tgt)
        reg.set_input_source(src)
        est = np.asarray(reg.align(), np.float64)
        _finite_pose(est)
        results[name] = _residual(est, src, tgt)
    # survey-frame registration quality within 10% of origin-frame
    assert results["survey"] < results["origin"] * 1.1 + 1e-3, results


def test_evaluate_matches_align_hessian():
    """evaluate_cost's (err, H, b) and the align's reported Hessian are
    both world-frame (centered internally, adjoint back): evaluating at
    the align's solution must reproduce its Hessian."""
    import jax.numpy as jnp

    from fast_gicp_tpu.models.gicp import GICPConfig, gicp_align, gicp_evaluate
    from fast_gicp_tpu.ops.covariance import knn_covariances
    from fast_gicp_tpu.utils.padding import pad_points

    rng = np.random.default_rng(8)
    base = (rng.uniform(size=(2000, 3)) * 20).astype(np.float32)
    base += np.float32([100.0, -50.0, 10.0])
    sp, sm = map(jnp.asarray, pad_points(base + np.float32([0.1, 0.05, -0.02])))
    tp, tm = map(jnp.asarray, pad_points(base))
    sc = knn_covariances(sp, sm)
    tc = knn_covariances(tp, tm)
    cfg = GICPConfig()
    res = gicp_align(sp, sm, sc, tp, tm, tc, jnp.eye(4, dtype=jnp.float32), cfg)
    _e, H, _b = gicp_evaluate(sp, sm, sc, tp, tm, tc, res.transformation, cfg)
    rel = np.abs(np.asarray(H) - np.asarray(res.hessian)) / (
        np.abs(np.asarray(res.hessian)) + 1.0
    )
    assert rel.max() < 0.01, rel.max()
