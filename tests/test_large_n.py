"""Large-bucket regime tests (reduced-size CPU twins of the >=64k TPU
bench, tools/bench_large_n.py).

Raw LiDAR scans are ~120k points (the reference ingests them raw,
kitti.cpp:40-64); the TPU bench pins 65k/131k buckets on hardware.  These
tests exercise the SAME code paths (pad_points buckets, align entry
points, exact 1-NN, fused covariance estimators) at a CPU-tractable size
with an UPSAMPLED cloud — duplicated points with small jitter, the same
structure a denser scan has.
"""

import numpy as np
import jax.numpy as jnp

from fast_gicp_tpu.utils.padding import bucket_size, pad_points


def _upsample(points, factor, rng, jitter=0.02):
    reps = [points]
    for _ in range(factor - 1):
        reps.append(
            points + rng.normal(scale=jitter, size=points.shape)
            .astype(np.float32)
        )
    return np.concatenate(reps).astype(np.float32)


def _pair(rng, n=1500):
    base = rng.uniform(-8.0, 8.0, size=(n, 2)).astype(np.float32)
    tgt = np.concatenate(
        [base, np.sin(base[:, :1]) * np.cos(base[:, 1:])], axis=1
    ).astype(np.float32)
    th = 0.04
    c, s = np.cos(th), np.sin(th)
    R = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    gt = np.eye(4, dtype=np.float32)
    gt[:3, :3] = R
    gt[:3, 3] = (0.15, -0.1, 0.05)
    src = tgt @ R.T + gt[:3, 3]
    # align(src -> tgt) recovers gt^{-1}
    return src, tgt, np.linalg.inv(gt).astype(np.float32)


def test_bucket_size_large():
    assert bucket_size(120_000) == 120_832  # 2048-multiple
    assert bucket_size(65_536) == 65_536
    assert bucket_size(131_072) == 131_072


def test_upsampled_pair_pose_parity(rng):
    """4x-upsampled clouds (the dense-scan structure) through the SAME
    align entry points at a larger padding bucket must land on the same
    pose as the base-size align."""
    from fast_gicp_tpu.models.gicp import GICPConfig, gicp_align
    from fast_gicp_tpu.models.vgicp import VGICPConfig, vgicp_align
    from fast_gicp_tpu.ops.covariance import knn_covariance_cols

    src, tgt, gt = _pair(rng)
    guess = jnp.eye(4, dtype=jnp.float32)

    def align_pair(s, t, which):
        sp, sm = map(jnp.asarray, pad_points(s))
        tp, tm = map(jnp.asarray, pad_points(t))
        sc = knn_covariance_cols(sp, sm)
        tc = knn_covariance_cols(tp, tm)
        if which == "gicp":
            return np.asarray(gicp_align(
                sp, sm, sc, tp, tm, tc, guess, GICPConfig()
            ).transformation)
        return np.asarray(vgicp_align(
            sp, sm, sc, tp, tm, tc, guess, VGICPConfig(resolution=1.0)
        ).transformation)

    up_src = _upsample(src, 4, rng)
    up_tgt = _upsample(tgt, 4, rng)
    assert pad_points(up_src)[0].shape[0] > pad_points(src)[0].shape[0]
    for which in ("gicp", "vgicp"):
        T_base = align_pair(src, tgt, which)
        T_up = align_pair(up_src, up_tgt, which)
        # both near ground truth, and near each other
        for T in (T_base, T_up):
            assert np.linalg.norm(
                (np.linalg.inv(gt) @ T)[:3, 3]
            ) < 0.05, which
        assert np.linalg.norm(T_up[:3, 3] - T_base[:3, 3]) < 0.05, which


def test_nn_search_large_bucket(rng):
    """Exact 1-NN at a multi-tile bucket (the same neighbors.nn_search
    path the 65k/131k TPU bench drives) against the brute-force answer."""
    from fast_gicp_tpu.ops.neighbors import nn_search

    src, tgt, _ = _pair(rng, n=1200)
    q = _upsample(src, 4, rng)[:6000]
    r = _upsample(tgt, 4, rng)[:6000]
    qp, qm = map(jnp.asarray, pad_points(q))
    rp, rm = map(jnp.asarray, pad_points(r))
    idx, d2 = nn_search(qp, rp, rm)
    idx, d2 = np.asarray(idx), np.asarray(d2)
    # brute-force audit on a sample
    sample = rng.integers(0, len(q), 64)
    ref = np.asarray(r)
    # CPU takes the centered |q|^2-2qt+|t|^2 XLA fallback whose f32
    # cancellation leaves ~1e-3 relative distance error at these extents
    # (the TPU Pallas (q-t)^2 kernel is exact-relative; see CLAUDE.md
    # round-4 numerics lore) — audit to the fallback's guarantee.
    for i in sample:
        dd = np.sum((ref - q[i]) ** 2, axis=1)
        assert np.isclose(d2[i], dd.min(), rtol=5e-3, atol=1e-5), i
        assert np.isclose(
            np.sum((ref[idx[i]] - q[i]) ** 2), dd.min(),
            rtol=5e-3, atol=1e-5,
        )
