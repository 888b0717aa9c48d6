"""Scan-to-map odometry tests: persistent map accumulation + trajectory."""

import numpy as np
import jax.numpy as jnp

from fast_gicp_tpu.models.scan_to_map import (
    MapState,
    ScanToMapConfig,
    ScanToMapOdometry,
    empty_map,
    map_as_voxelmap,
    merge_maps,
    update_map,
)
from fast_gicp_tpu.ops.voxelmap import lookup_voxels, voxel_coord
from fast_gicp_tpu.solver import LsqConfig
from fast_gicp_tpu.utils.kitti import ate_rmse
from tests.test_odometry import _trajectory_scans


def _identity_covs(n):
    return jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * 0.01, (n, 3, 3))


def test_update_map_accumulates(rng):
    state = empty_map(1024, 1.0)
    pts = jnp.asarray((rng.random((256, 3)) * 10).astype(np.float32))
    mask = jnp.ones(256, bool)
    covs = _identity_covs(256)
    state = update_map(state, pts, covs, mask)
    nv1 = int(state.num_voxels)
    assert nv1 > 0
    total1 = float(state.sums[:, 0].sum())
    assert total1 == 256.0

    # same points again: voxel count unchanged, point count doubles
    state = update_map(state, pts, covs, mask)
    assert int(state.num_voxels) == nv1
    assert float(state.sums[:, 0].sum()) == 512.0

    # new distant points create new voxels
    far = pts + 100.0
    state = update_map(state, far, covs, mask)
    assert int(state.num_voxels) == 2 * nv1
    assert float(state.sums[:, 0].sum()) == 768.0


def test_map_lookup_after_update(rng):
    state = empty_map(512, 1.0)
    pts = jnp.asarray((rng.random((128, 3)) * 8).astype(np.float32))
    mask = jnp.ones(128, bool)
    state = update_map(state, pts, _identity_covs(128), mask)
    vm = map_as_voxelmap(state)
    coords = voxel_coord(pts, 1.0)
    vids = np.asarray(lookup_voxels(vm, coords))
    assert np.all(vids >= 0), "every inserted point's voxel must be findable"
    # means of single-point voxels equal the point
    counts = np.asarray(vm.counts)
    means = np.asarray(vm.means)
    for i in range(len(pts)):
        v = vids[i]
        if counts[v] == 1:
            np.testing.assert_allclose(means[v], np.asarray(pts)[i], atol=1e-5)


def test_scan_to_map_odometry_trajectory():
    scans, gt_poses = _trajectory_scans(np.random.default_rng(5), n_frames=6)
    from fast_gicp_tpu.utils.downsample import voxel_downsample

    odo = ScanToMapOdometry(
        ScanToMapConfig(
            resolution=1.0,
            capacity=1 << 14,
            lsq=LsqConfig(),
        )
    )
    for scan in scans:
        odo.process(voxel_downsample(scan, 0.2))
    assert len(odo.poses) == len(scans)
    err = ate_rmse(gt_poses, odo.poses)
    assert err < 0.05, f"scan-to-map ATE {err:.4f}"


def test_process_chunk_matches_per_frame():
    """process_chunk (whole-chunk lax.scan with the map in the carry) must
    reproduce the per-frame trajectory exactly — same body, same gate and
    fusion dataflow, warm-up frames handled internally."""
    from fast_gicp_tpu.utils.downsample import voxel_downsample

    scans, gt_poses = _trajectory_scans(np.random.default_rng(5), n_frames=7)
    scans = [voxel_downsample(s, 0.2) for s in scans]
    cfg = ScanToMapConfig(resolution=1.0, capacity=1 << 14, lsq=LsqConfig())

    per_frame = ScanToMapOdometry(cfg)
    for s in scans:
        per_frame.process(s)

    chunked = ScanToMapOdometry(cfg)
    chunked.process_chunk(scans[:4])  # includes the 2 warm-up frames
    chunked.process_chunk(scans[4:])
    assert len(chunked.poses) == len(scans)
    for a, b in zip(per_frame.poses, chunked.poses):
        np.testing.assert_allclose(b, a, atol=1e-5)
    assert ate_rmse(gt_poses, chunked.poses) < 0.05


def test_sharded_scan_to_map_matches_single():
    """8-device hash-sharded persistent map must reproduce the single-device
    scan-to-map trajectory (ownership partitions voxels exactly)."""
    import numpy as np

    from fast_gicp_tpu.models.scan_to_map import ScanToMapConfig, ScanToMapOdometry
    from fast_gicp_tpu.parallel.sharded import make_mesh
    from fast_gicp_tpu.parallel.sharded_map import ShardedScanToMapOdometry

    from fast_gicp_tpu.utils.downsample import voxel_downsample

    scans, gt = _trajectory_scans(np.random.default_rng(5), n_frames=4)
    scans = [voxel_downsample(s, 0.2) for s in scans]
    cfg = ScanToMapConfig(resolution=1.0, capacity=1 << 13)

    single = ScanToMapOdometry(cfg, covariance="knn")
    sharded = ShardedScanToMapOdometry(cfg, mesh=make_mesh(8), covariance="knn")
    for s in scans:
        p1 = single.process(s)
        p8 = sharded.process(s)
        np.testing.assert_allclose(p8, p1, atol=5e-3)

    from fast_gicp_tpu.utils.kitti import ate_rmse

    assert ate_rmse(gt, sharded.poses) < 0.05


def test_sharded_map_growth():
    """Per-shard growth: a small sharded map doubles its local capacity when
    the fullest shard passes 70% and keeps producing finite poses; grown
    shards must still resolve every committed voxel."""
    import numpy as np

    from fast_gicp_tpu.models.scan_to_map import ScanToMapConfig
    from fast_gicp_tpu.parallel.sharded import make_mesh
    from fast_gicp_tpu.parallel.sharded_map import (
        ShardedScanToMapOdometry, grow_sharded_map,
    )

    rng = np.random.default_rng(7)
    mesh = make_mesh(8)
    cfg = ScanToMapConfig(resolution=0.5, capacity=8 * 64,
                          max_capacity=8 * 4096, grow_check_every=1)
    odo = ShardedScanToMapOdometry(cfg, mesh=mesh, covariance="knn")
    cap0 = odo.state.sums.shape[0]
    for i in range(4):
        shift = np.float32([i * 2.0, 0, 0])
        odo.process((rng.uniform(size=(512, 3)) * 20 - 10).astype(np.float32)
                    + shift)
    assert odo.state.sums.shape[0] > cap0  # grew
    assert all(np.isfinite(p).all() for p in odo.poses)

    # growth preserves per-shard stats verbatim
    st = odo.state
    d = 8
    cap_local = st.sums.shape[0] // d
    grown = grow_sharded_map(mesh, st, cap_local * 2)
    np.testing.assert_array_equal(
        np.asarray(grown.num_voxels), np.asarray(st.num_voxels)
    )
    for s in range(d):
        nv = int(np.asarray(st.num_voxels)[s])
        np.testing.assert_allclose(
            np.asarray(grown.sums[s * cap_local * 2:][:nv]),
            np.asarray(st.sums[s * cap_local:][:nv]),
        )


def test_update_map_no_orphan_rows(rng):
    """Claim-first insertion: every committed capacity row is reachable
    through the lut (no leaked rows when probe windows fill up), at a
    deliberately high table load (table_factor=2) over many frames."""
    import jax.numpy as jnp

    from fast_gicp_tpu.models.scan_to_map import empty_map, update_map
    from fast_gicp_tpu.ops.voxelmap import _EMPTY

    state = empty_map(64, 1.0, table_factor=2)
    covs = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (128, 3, 3))
    for _ in range(6):
        pts = jnp.asarray(
            (rng.uniform(size=(128, 3)) * 40 - 20).astype(np.float32)
        )
        state = update_map(state, pts, covs, jnp.ones(128, bool))
        nv = int(state.num_voxels)
        lut = np.asarray(state.lut)
        vids = lut[lut[:, 0] != int(_EMPTY), 0]
        # compact ids, each exactly once, all < num_voxels
        np.testing.assert_array_equal(np.sort(vids), np.arange(nv))
        counts = np.asarray(state.sums[:, 0])
        assert (counts[:nv] > 0).all()
        assert (counts[nv:] == 0).all()
    assert nv <= 64


def test_map_growth(rng):
    """Auto-growth: a small initial map grows 2x when >70% full and keeps
    all voxel statistics queryable."""
    import jax.numpy as jnp

    from fast_gicp_tpu.models.scan_to_map import (
        ScanToMapConfig, ScanToMapOdometry, empty_map, grow_map, update_map,
        map_as_voxelmap,
    )
    from fast_gicp_tpu.ops.voxelmap import lookup_voxels

    # direct grow_map: fill a map, grow, verify lookups still resolve
    state = empty_map(128, 1.0)
    pts = jnp.asarray((rng.uniform(size=(256, 3)) * 40 - 20).astype(np.float32))
    covs = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (256, 3, 3))
    state = update_map(state, pts, covs, jnp.ones(256, bool))
    nv0 = int(state.num_voxels)
    grown = grow_map(state, 512)
    assert int(grown.num_voxels) == nv0
    vm = map_as_voxelmap(grown)
    ids = np.asarray(lookup_voxels(vm, grown.coords[:nv0]))
    np.testing.assert_array_equal(np.sort(ids), np.arange(nv0))
    np.testing.assert_allclose(
        np.asarray(grown.sums[:nv0]), np.asarray(state.sums[:nv0])
    )

    # driver-level: growth triggers and odometry stays consistent
    cfg = ScanToMapConfig(resolution=0.5, capacity=256, max_capacity=4096,
                          grow_check_every=1)
    odo = ScanToMapOdometry(cfg, covariance="knn")
    for i in range(4):
        shift = np.float32([i * 2.0, 0, 0])
        odo.process((rng.uniform(size=(512, 3)) * 20 - 10).astype(np.float32)
                    + shift)
    assert odo.state.sums.shape[0] > 256  # grew
    assert all(np.isfinite(p).all() for p in odo.poses)


def test_gate_pose_semantics():
    """Tracking gate: accepts near+converged+live, rejects far / NaN /
    unconverged / dead-objective poses (accept-form NaN handling)."""
    import jax.numpy as jnp

    from fast_gicp_tpu.models.scan_to_map import _gate_pose

    eye = jnp.eye(4, dtype=jnp.float32)
    near = eye.at[:3, 3].set(jnp.asarray([0.1, 0.0, 0.0]))
    far = eye.at[:3, 3].set(jnp.asarray([10.0, 0.0, 0.0]))
    nan = eye.at[0, 3].set(jnp.nan)
    t, r = 0.5, 0.2
    live = jnp.float32(100.0)
    H_live = jnp.eye(6, dtype=jnp.float32)
    H_dead = jnp.zeros((6, 6), jnp.float32)

    def gate(pose, conv=True, err=live, H=H_live):
        p, rej = _gate_pose(
            pose, eye, jnp.asarray(conv), jnp.asarray(err), H, t, r
        )
        return bool(rej), np.asarray(p)

    rej, p = gate(near)
    assert not rej and np.allclose(p, np.asarray(near))
    assert gate(far)[0]
    assert gate(near, conv=False)[0]
    # zero Hessian = zero correspondences = total track loss
    assert gate(near, err=0.0, H=H_dead)[0]
    # zero RESIDUAL with live correspondences is a legitimate convergence
    # (identical overlapping geometry), not track loss
    assert not gate(near, err=0.0)[0]
    assert gate(near, err=np.nan)[0]
    rej, p = gate(nan)
    assert rej and np.isfinite(p).all()  # falls back to the guess


def test_map_save_load_roundtrip(tmp_path, rng):
    """Checkpoint/resume: a saved map localizes a new scan identically."""
    import jax.numpy as jnp

    from fast_gicp_tpu.models.scan_to_map import (
        ScanToMapConfig, ScanToMapOdometry, load_map, save_map,
    )

    scans, gt = _trajectory_scans(np.random.default_rng(5), n_frames=3)
    from fast_gicp_tpu.utils.downsample import voxel_downsample

    scans = [voxel_downsample(s, 0.2) for s in scans]
    cfg = ScanToMapConfig(resolution=1.0, capacity=1 << 13)
    odo = ScanToMapOdometry(cfg, covariance="knn")
    for s in scans[:2]:
        odo.process(s)
    path = str(tmp_path / "map.npz")
    odo.save(path)

    # the public resume API: (map checkpoint, last pose, last delta)
    resumed = ScanToMapOdometry(cfg, covariance="knn",
                                initial_map=load_map(path),
                                initial_pose=odo.poses[-1],
                                initial_velocity=odo.velocity)
    p_orig = odo.process(scans[2])
    p_res = resumed.process(scans[2])
    np.testing.assert_allclose(p_res, p_orig, atol=1e-5)


def test_sharded_align_partitions_work():
    """Compute partitioning proxy: the routed-query load (each device's
    linearize workload in the partitioned align) must be ~N/D per device,
    not N — the replicated align's per-device cost."""
    import jax.numpy as jnp
    import numpy as np

    from fast_gicp_tpu.models.scan_to_map import ScanToMapConfig
    from fast_gicp_tpu.parallel.sharded import make_mesh
    from fast_gicp_tpu.parallel.sharded_map import (
        ShardedScanToMapOdometry, sharded_routing_load,
    )

    rng = np.random.default_rng(1)
    n = 4096
    pts = jnp.asarray(rng.uniform(-25, 25, (n, 3)).astype(np.float32))
    mask = jnp.ones(n, bool)
    mesh = make_mesh(8)
    cfg = ScanToMapConfig(resolution=1.0, capacity=1 << 13)
    odo = ShardedScanToMapOdometry(cfg, mesh=mesh, covariance="knn")
    odo.process(np.asarray(pts))  # initialize the sharded map

    load = np.asarray(sharded_routing_load(
        mesh, odo.state, pts, mask, jnp.eye(4, dtype=jnp.float32), cfg
    ))
    assert load.sum() == n  # every valid query routed exactly once
    # hash placement balances within ~2x of the ideal N/D share
    assert load.max() <= 2 * n // 8, load
    assert load.min() >= n // 8 // 2, load


def test_sharded_align_flops_scale_with_mesh():
    """XLA cost-analysis proxy for near-linear scaling: the partitioned
    align's PER-DEVICE flops must drop ~1/D as the mesh grows (measured
    55.8M -> 7.1M from D=1 to D=8 at 32k points).  A per-destination
    nonzero compaction once kept per-device routing O(K*N) regardless of
    D; the argsort bucket compaction keeps everything O(N/D)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast_gicp_tpu.models.scan_to_map import ScanToMapConfig
    from fast_gicp_tpu.parallel.sharded import make_mesh
    from fast_gicp_tpu.parallel.sharded_map import (
        ShardedScanToMapOdometry, align_to_sharded_map_partitioned,
        update_sharded_map_routed,
    )

    rng = np.random.default_rng(1)
    n = 8192
    pts = jnp.asarray(rng.uniform(-25, 25, (n, 3)).astype(np.float32))
    mask = jnp.ones(n, bool)
    covs = jnp.broadcast_to(0.01 * jnp.eye(3, dtype=jnp.float32), (n, 3, 3))
    cfg = ScanToMapConfig(resolution=1.0, capacity=1 << 13)

    align_flops, update_flops = {}, {}
    for d in (2, 8):
        mesh = make_mesh(d)
        odo = ShardedScanToMapOdometry(cfg, mesh=mesh, covariance="knn")
        odo.process(np.asarray(pts))
        ca = align_to_sharded_map_partitioned.lower(
            mesh, odo.state, pts, mask, covs,
            jnp.eye(4, dtype=jnp.float32), cfg,
        ).compile().cost_analysis()
        if not ca or "flops" not in ca:
            import pytest

            pytest.skip("backend reports no flops cost analysis")
        align_flops[d] = ca["flops"]
        update_flops[d] = update_sharded_map_routed.lower(
            mesh, odo.state, pts, covs, mask
        ).compile().cost_analysis()["flops"]
    # ideal is 0.25; allow fixed per-device overhead up to 0.4
    assert align_flops[8] < 0.4 * align_flops[2], align_flops
    assert update_flops[8] < 0.4 * update_flops[2], update_flops


def test_sharded_rbf_covariances_match_single():
    """Query-sharded covariance estimation reproduces the single-device
    RBF covariances (each device computes N/D queries vs the gathered
    cloud)."""
    import jax.numpy as jnp
    import numpy as np

    from fast_gicp_tpu.ops.covariance import rbf_covariances_jit
    from fast_gicp_tpu.parallel.sharded import make_mesh
    from fast_gicp_tpu.parallel.sharded_map import sharded_rbf_covariances

    rng = np.random.default_rng(4)
    n = 2048
    pts = jnp.asarray(rng.uniform(-10, 10, (n, 3)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=n) > 0.05)
    mesh = make_mesh(8)
    c_sharded = np.asarray(sharded_rbf_covariances(mesh, pts, mask))
    c_single = np.asarray(rbf_covariances_jit(pts, mask))
    valid = np.asarray(mask)
    # distance formulations differ ((q-t)^2 vs dot-form HIGHEST) — agree
    # to f32 noise only
    np.testing.assert_allclose(
        c_sharded[valid], c_single[valid], rtol=5e-2, atol=2e-3
    )


def test_compact_map_evicts_far_voxels(rng):
    """compact_map drops voxels outside the radius, keeps stats/lookup of
    survivors intact, and recycles capacity for new insertions."""
    from fast_gicp_tpu.models.scan_to_map import compact_map

    state = empty_map(1024, 1.0)
    near = jnp.asarray((rng.random((128, 3)) * 8).astype(np.float32))
    far = jnp.asarray(
        (rng.random((128, 3)) * 8 + 200.0).astype(np.float32)
    )
    mask = jnp.ones(128, bool)
    covs = _identity_covs(128)
    state = update_map(state, near, covs, mask)
    state = update_map(state, far, covs, mask)
    nv_all = int(state.num_voxels)
    assert float(state.sums[:, 0].sum()) == 256.0

    center = jnp.zeros(3, jnp.float32)
    state = compact_map(state, center, jnp.float32(50.0))
    nv_near = int(state.num_voxels)
    assert 0 < nv_near < nv_all
    # survivors hold exactly the near points' mass
    assert float(state.sums[:, 0].sum()) == 128.0

    # lookup still resolves a surviving voxel...
    vm = map_as_voxelmap(state)
    c = voxel_coord(near[:1], 1.0)
    vid = lookup_voxels(vm, c)
    assert int(vid[0]) >= 0
    # ...and misses an evicted one
    c_far = voxel_coord(far[:1], 1.0)
    vid_far = lookup_voxels(vm, c_far)
    assert int(vid_far[0]) < 0

    # recycled rows admit new voxels
    state = update_map(state, far, covs, mask)
    assert int(state.num_voxels) > nv_near
    assert float(state.sums[:, 0].sum()) == 256.0


def test_odometry_eviction_bounds_map(rng):
    """A long straight drive with eviction enabled keeps num_voxels
    bounded (stays well under what the unbounded run accumulates) while
    still tracking the trajectory."""
    scans, gt = _trajectory_scans(rng, n_frames=24)
    cfg_kwargs = dict(
        resolution=1.0, capacity=1 << 13,
        lsq=LsqConfig(max_iterations=12),
    )
    odo_free = ScanToMapOdometry(
        ScanToMapConfig(**cfg_kwargs), covariance="knn")
    odo_ev = ScanToMapOdometry(
        ScanToMapConfig(**cfg_kwargs, eviction_radius=18.0, evict_every=6),
        covariance="knn",
    )
    for s in scans:
        odo_free.process_async(s)
        odo_ev.process_async(s)
    nv_free = int(odo_free.state.num_voxels)
    nv_ev = int(odo_ev.state.num_voxels)
    assert nv_ev < nv_free, (nv_ev, nv_free)
    ate = ate_rmse(gt, odo_ev.poses)
    assert ate < 0.2, ate


def test_sharded_eviction_matches_policy(rng):
    """compact_sharded_map drops exactly the out-of-radius voxels on every
    shard (total surviving mass equals the single-device policy)."""
    from fast_gicp_tpu.parallel.sharded import make_mesh
    from fast_gicp_tpu.parallel.sharded_map import (
        compact_sharded_map, empty_sharded_map, update_sharded_map,
    )

    mesh = make_mesh(8)
    state = empty_sharded_map(mesh, 512, 1.0)
    near = jnp.asarray((rng.random((128, 3)) * 8).astype(np.float32))
    far = jnp.asarray((rng.random((128, 3)) * 8 + 200.0).astype(np.float32))
    mask = jnp.ones(128, bool)
    covs = _identity_covs(128)
    state = update_sharded_map(mesh, state, near, covs, mask)
    state = update_sharded_map(mesh, state, far, covs, mask)
    assert float(state.sums[:, 0].sum()) == 256.0

    state = compact_sharded_map(
        mesh, state, jnp.zeros(3, jnp.float32), jnp.float32(50.0)
    )
    assert float(state.sums[:, 0].sum()) == 128.0
    # refill works after compaction
    state = update_sharded_map(mesh, state, far, covs, mask)
    assert float(state.sums[:, 0].sum()) == 256.0


def test_sharded_checkpoint_roundtrip(rng, tmp_path):
    """Sharded checkpoint/resume is mesh-size-independent: a sharded map
    merges to a single MapState with identical voxel content, restores onto
    meshes of different sizes, and the restored maps localize a scan to the
    same pose."""
    from fast_gicp_tpu.models.scan_to_map import (
        ScanToMapConfig, ScanToMapOdometry, load_map,
    )
    from fast_gicp_tpu.parallel.sharded import make_mesh
    from fast_gicp_tpu.parallel.sharded_map import (
        ShardedScanToMapOdometry, distribute_map, merge_sharded_map,
    )
    from fast_gicp_tpu.utils.downsample import voxel_downsample

    scans, gt = _trajectory_scans(np.random.default_rng(5), n_frames=3)
    scans = [voxel_downsample(s, 0.2) for s in scans]
    cfg = ScanToMapConfig(resolution=1.0, capacity=1 << 13)
    mesh8 = make_mesh(8)
    odo = ShardedScanToMapOdometry(cfg, mesh=mesh8, covariance="knn")
    for s in scans[:2]:
        odo.process(s)

    # merge: every shard's live voxels survive with identical stats
    merged = merge_sharded_map(odo.state)
    nv_total = int(np.asarray(odo.state.num_voxels).sum())
    assert int(np.asarray(merged.num_voxels)) == nv_total
    np.testing.assert_allclose(
        float(np.asarray(merged.sums[:, 0].sum())),
        float(np.asarray(odo.state.sums[:, 0].sum())),
    )

    # save via the odometry wrapper; restore single-device AND re-sharded
    path = str(tmp_path / "sharded_map.npz")
    odo.save(path)
    ck = load_map(path)
    assert int(np.asarray(ck.num_voxels)) == nv_total

    def _resume(resumed):
        return resumed.process(scans[2])

    # load a fresh copy per resume: the fused frame step DONATES the map
    # state, so a single loaded MapState cannot back several odometries
    pose0, vel0 = odo.poses[-1], odo.velocity
    p_single = _resume(ScanToMapOdometry(cfg, covariance="knn",
                                         initial_map=load_map(path),
                                         initial_pose=pose0,
                                         initial_velocity=vel0))
    p_8 = _resume(ShardedScanToMapOdometry(cfg, mesh=mesh8, covariance="knn",
                                           initial_map=load_map(path),
                                           initial_pose=pose0,
                                           initial_velocity=vel0))
    p_2 = _resume(ShardedScanToMapOdometry(cfg, mesh=make_mesh(2),
                                           covariance="knn",
                                           initial_map=load_map(path),
                                           initial_pose=pose0,
                                           initial_velocity=vel0))
    p_orig = odo.process(scans[2])
    np.testing.assert_allclose(p_single, p_orig, atol=5e-3)
    np.testing.assert_allclose(p_8, p_orig, atol=5e-3)
    np.testing.assert_allclose(p_2, p_orig, atol=5e-3)

    # distribute partitions every voxel exactly once
    redist = distribute_map(mesh8, merged)
    assert int(np.asarray(redist.num_voxels).sum()) == nv_total


def test_localization_mode_frozen_map(rng, tmp_path):
    """fuse_scans=False: the map stays frozen (no fusion/growth/eviction),
    every frame — including the FIRST — aligns against the preloaded map,
    and the track matches the mapping run's."""
    from fast_gicp_tpu.models.scan_to_map import (
        ScanToMapConfig, ScanToMapOdometry, load_map,
    )
    from fast_gicp_tpu.utils.downsample import voxel_downsample
    from fast_gicp_tpu.utils.kitti import ate_rmse

    scans, gt = _trajectory_scans(np.random.default_rng(5), n_frames=5)
    scans = [voxel_downsample(s, 0.2) for s in scans]
    cfg = ScanToMapConfig(resolution=1.0, capacity=1 << 13)

    mapper = ScanToMapOdometry(cfg, covariance="knn")
    for s in scans:
        mapper.process(s)
    path = str(tmp_path / "frozen.npz")
    mapper.save(path)
    nv = int(np.asarray(mapper.state.num_voxels))
    mass = float(np.asarray(mapper.state.sums[:, 0].sum()))

    loc = ScanToMapOdometry(
        cfg._replace(fuse_scans=False, eviction_radius=30.0, evict_every=1),
        covariance="knn", initial_map=load_map(path),
    )
    for s in scans:  # re-drive the same trajectory against the frozen map
        loc.process(s)
    # frame 0 aligned too (not just seeded at identity): 5 scans -> 5 poses
    assert len(loc.poses) == 5
    assert ate_rmse(gt, loc.poses) < 0.05
    # map untouched: same voxel count and mass, eviction config ignored
    assert int(np.asarray(loc.state.num_voxels)) == nv
    assert float(np.asarray(loc.state.sums[:, 0].sum())) == mass


def test_ndt_objective_against_map(rng):
    """objective="ndt_d2d"/"ndt_p2d": Cauchy-robust NDT registration
    against the persistent map tracks the same trajectory as VGICP."""
    from fast_gicp_tpu.models.scan_to_map import (
        ScanToMapConfig, ScanToMapOdometry,
    )
    from fast_gicp_tpu.utils.downsample import voxel_downsample
    from fast_gicp_tpu.utils.kitti import ate_rmse

    scans, gt = _trajectory_scans(np.random.default_rng(5), n_frames=4)
    scans = [voxel_downsample(s, 0.2) for s in scans]
    # P2D ignores the scan's covariances (point-to-distribution), so it is
    # an accuracy class below D2D — same relationship as the reference's
    # P2D/D2D modes (ndt_compute_derivatives.cu)
    for obj, tol in (("ndt_d2d", 0.08), ("ndt_p2d", 0.2)):
        cfg = ScanToMapConfig(resolution=1.0, capacity=1 << 13, objective=obj)
        odo = ScanToMapOdometry(cfg, covariance="knn")
        for s in scans:
            odo.process(s)
        ate = ate_rmse(gt, odo.poses)
        assert ate < tol, (obj, ate)


def test_sharded_ndt_objective_matches_single():
    """NDT objectives ride the sharded driver too: the compute-partitioned
    routed align reproduces the single-device NDT trajectory (same Cauchy
    weights, >6-points gate, and frozen-M trial errors, psummed)."""
    from fast_gicp_tpu.models.scan_to_map import (
        ScanToMapConfig, ScanToMapOdometry,
    )
    from fast_gicp_tpu.parallel.sharded import make_mesh
    from fast_gicp_tpu.parallel.sharded_map import ShardedScanToMapOdometry
    from fast_gicp_tpu.utils.downsample import voxel_downsample

    scans, _gt = _trajectory_scans(np.random.default_rng(5), n_frames=3)
    scans = [voxel_downsample(s, 0.2) for s in scans]
    for obj in ("ndt_d2d", "ndt_p2d"):
        cfg = ScanToMapConfig(resolution=1.0, capacity=1 << 13, objective=obj)
        single = ScanToMapOdometry(cfg, covariance="knn")
        sharded = ShardedScanToMapOdometry(
            cfg, mesh=make_mesh(8), covariance="knn"
        )
        for s in scans:
            p1 = single.process(s)
            p8 = sharded.process(s)
            np.testing.assert_allclose(p8, p1, atol=5e-3, err_msg=obj)


def test_sharded_ndt_replicated_align_matches_single(rng):
    """The replicated `align_to_sharded_map` path under an NDT config
    equals the single-device `align_to_map` on the same map."""
    import jax

    from fast_gicp_tpu.models.scan_to_map import (
        ScanToMapConfig, align_to_map, empty_map, update_map,
    )
    from fast_gicp_tpu.ops.covariance import knn_covariances
    from fast_gicp_tpu.parallel.sharded import make_mesh
    from fast_gicp_tpu.parallel.sharded_map import (
        align_to_sharded_map, distribute_map,
    )

    pts = jnp.asarray(rng.uniform(-8, 8, (1024, 3)).astype(np.float32))
    pts = pts.at[:, 2].set(jnp.sin(pts[:, 0]) * 0.4)
    mask = jnp.ones(1024, bool)
    covs = knn_covariances(pts, mask, k=10)
    state = update_map(empty_map(1 << 12, 1.0), pts, covs, mask)

    src = pts + jnp.asarray([0.12, -0.05, 0.02], jnp.float32)
    scovs = knn_covariances(src, mask, k=10)
    guess = jnp.eye(4, dtype=jnp.float32)
    mesh = make_mesh(8)
    sh_state = distribute_map(mesh, state)
    cfg = ScanToMapConfig(resolution=1.0, objective="ndt_d2d")
    r1 = align_to_map(state, src, mask, scovs, guess, cfg)
    r8 = align_to_sharded_map(mesh, sh_state, src, mask, scovs, guess, cfg)
    np.testing.assert_allclose(
        np.asarray(r8.transformation), np.asarray(r1.transformation),
        atol=1e-4,
    )
    assert bool(jax.device_get(r8.converged)) == bool(
        jax.device_get(r1.converged)
    )


def test_degenerate_scan_frames(rng):
    """Empty / 3-point dropout frames must not poison the track: the gate
    falls back to the constant-velocity prediction (finite poses), the map
    is not corrupted, and a normal frame recovers."""
    from fast_gicp_tpu.models.scan_to_map import (
        ScanToMapConfig, ScanToMapOdometry,
    )

    cfg = ScanToMapConfig(resolution=1.0, capacity=1 << 12)
    odo = ScanToMapOdometry(cfg, covariance="knn")
    scan = rng.uniform(-10, 10, (2000, 3)).astype(np.float32)
    scan[:, 2] = np.sin(scan[:, 0]) * 0.5
    odo.process(scan)
    odo.process(scan + np.float32([0.1, 0, 0]))
    p_empty = odo.process(np.zeros((0, 3), np.float32))
    assert np.isfinite(p_empty).all()
    p_tiny = odo.process(scan[:3])
    assert np.isfinite(p_tiny).all()
    p_rec = odo.process(scan + np.float32([0.3, 0, 0]))
    assert np.isfinite(p_rec).all()
    assert len(odo.poses) == 5
    assert np.isfinite(np.asarray(odo.state.sums)).all()


def test_initial_pose_anchors_fresh_map(rng):
    """On an EMPTY map, frame 0 is stamped at `initial_pose` (not identity):
    the map is built in the anchored world frame and the pose chain starts
    there."""
    from fast_gicp_tpu import se3
    from fast_gicp_tpu.models.scan_to_map import (
        ScanToMapConfig, ScanToMapOdometry,
    )
    from fast_gicp_tpu.utils.downsample import voxel_downsample

    scans, _ = _trajectory_scans(np.random.default_rng(11), n_frames=2)
    scans = [voxel_downsample(s, 0.2) for s in scans]
    anchor = np.asarray(
        se3.se3_exp(jnp.asarray(np.float32([0, 0, 0.3, 5.0, -2.0, 0.5]))),
        np.float64,
    )
    cfg = ScanToMapConfig(resolution=1.0, capacity=1 << 13)
    odo = ScanToMapOdometry(cfg, covariance="knn", initial_pose=anchor)
    p0 = odo.process(scans[0])
    np.testing.assert_allclose(p0, anchor, atol=1e-6)
    # the fused map actually lives at the anchor: frame 1 aligns to a pose
    # near anchor (it moved ~0.4 m along the trajectory), not near identity
    p1 = odo.process(scans[1])
    assert np.linalg.norm(p1[:3, 3] - anchor[:3, 3]) < 1.0
    assert np.linalg.norm(p1[:3, 3]) > 1.0  # nowhere near the origin


def test_resume_mapping_aligns_first_frame(tmp_path, rng):
    """Resuming MAPPING (fuse_scans=True) against a non-empty checkpoint
    ALIGNS frame 0 instead of stamping it at the anchor: even with a
    slightly-off initial_pose the estimated pose snaps to the truth and
    the map is not corrupted."""
    from fast_gicp_tpu import se3
    from fast_gicp_tpu.models.scan_to_map import (
        ScanToMapConfig, ScanToMapOdometry, load_map,
    )
    from fast_gicp_tpu.utils.downsample import voxel_downsample

    scans, gt = _trajectory_scans(np.random.default_rng(12), n_frames=4)
    scans = [voxel_downsample(s, 0.2) for s in scans]
    cfg = ScanToMapConfig(resolution=1.0, capacity=1 << 13)
    odo = ScanToMapOdometry(cfg, covariance="knn")
    for s in scans[:3]:
        odo.process(s)
    path = str(tmp_path / "map.npz")
    odo.save(path)
    p_truth = odo.process(scans[3])

    # perturb the resume pose ~10 cm: the align must absorb it
    off = np.asarray(
        se3.se3_exp(jnp.asarray(np.float32([0.01, 0, 0, 0.08, -0.05, 0.02]))),
        np.float64,
    )
    resumed = ScanToMapOdometry(cfg, covariance="knn",
                                initial_map=load_map(path),
                                initial_pose=odo.poses[-1] @ off)
    p_res = resumed.process(scans[3])
    err = np.linalg.norm(p_res[:3, 3] - p_truth[:3, 3])
    assert err < 0.02, err  # aligned, not stamped at the perturbed anchor


def _live_rows(state):
    n = int(np.asarray(state.num_voxels))
    coords = np.asarray(state.coords)[:n]
    sums = np.asarray(state.sums)[:n]
    order = np.lexsort(coords.T)
    return coords[order], sums[order]


def test_merge_maps_matches_joint_build(rng):
    """merge_maps(A, B) == the map built by fusing both point sets into one
    session: identical live voxel set, identical additive accumulators."""
    p1 = jnp.asarray((rng.random((256, 3)) * 12).astype(np.float32))
    p2 = jnp.asarray((rng.random((256, 3)) * 12 + 6).astype(np.float32))
    m = jnp.ones(256, bool)
    c = _identity_covs(256)

    map_a = update_map(empty_map(1024, 1.0), p1, c, m)
    map_b = update_map(empty_map(1024, 1.0), p2, c, m)
    joint = update_map(update_map(empty_map(2048, 1.0), p1, c, m), p2, c, m)

    merged = merge_maps(map_a, map_b)
    ca, sa = _live_rows(merged)
    cj, sj = _live_rows(joint)
    np.testing.assert_array_equal(ca, cj)
    np.testing.assert_allclose(sa, sj, rtol=1e-5, atol=1e-5)


def test_merge_maps_lattice_translation_exact(rng):
    """A transform_b that is an exact voxel-lattice translation re-bins
    every voxel onto the shifted cell: merging b (built in its own frame)
    with that transform equals the joint build in a's frame."""
    shift = np.float32([4.0, -3.0, 2.0])  # integer multiples of res=1.0
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = shift

    p1 = jnp.asarray((rng.random((200, 3)) * 10).astype(np.float32))
    p2_world = (rng.random((200, 3)) * 10 + 3).astype(np.float32)
    m = jnp.ones(200, bool)
    c = _identity_covs(200)

    map_a = update_map(empty_map(1024, 1.0), p1, c, m)
    # b maps the same physical points expressed in ITS frame (world - shift)
    map_b = update_map(
        empty_map(1024, 1.0), jnp.asarray(p2_world - shift), c, m
    )
    joint = update_map(
        update_map(empty_map(2048, 1.0), p1, c, m),
        jnp.asarray(p2_world), c, m,
    )

    merged = merge_maps(map_a, map_b, transform_b=T)
    ca, sa = _live_rows(merged)
    cj, sj = _live_rows(joint)
    np.testing.assert_array_equal(ca, cj)
    np.testing.assert_allclose(sa, sj, rtol=1e-4, atol=1e-4)


def test_merge_maps_rotation_conserves_mass(rng):
    """A general SE(3) transform_b preserves total point count and maps
    every voxel mean exactly (re-binning moves cells, never mass)."""
    from fast_gicp_tpu import se3

    T = np.asarray(se3.se3_exp(jnp.asarray(
        np.float32([0, 0, 0.4, 2.0, -1.0, 0.5]))), np.float64)

    pts = (rng.random((300, 3)) * 10).astype(np.float32)
    m = jnp.ones(300, bool)
    c = _identity_covs(300)
    map_b = update_map(empty_map(1024, 1.0), jnp.asarray(pts), c, m)

    empty_a = empty_map(256, 1.0)
    merged = merge_maps(empty_a, map_b, transform_b=T)

    nb = int(np.asarray(map_b.num_voxels))
    sums_b = np.asarray(map_b.sums)[:nb].astype(np.float64)
    _, sums_m = _live_rows(merged)
    sums_m = sums_m.astype(np.float64)
    # re-binning can merge voxels (cells colliding after rotation) but
    # never create or destroy mass: check the aggregate accumulators,
    # which transform in closed form regardless of collisions
    assert sums_m[:, 0].sum() == sums_b[:, 0].sum()  # count conserved
    R, t = T[:3, :3], T[:3, 3]
    np.testing.assert_allclose(
        sums_m[:, 1:4].sum(0),
        sums_b[:, 1:4].sum(0) @ R.T + sums_b[:, 0].sum() * t,
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        sums_m[:, 4:13].reshape(-1, 3, 3).sum(0),
        R @ sums_b[:, 4:13].reshape(-1, 3, 3).sum(0) @ R.T,
        rtol=1e-5, atol=1e-6,
    )
    assert len(sums_m) <= nb  # collisions only ever reduce the voxel count


def test_merge_maps_resolution_mismatch_raises():
    import pytest

    with pytest.raises(ValueError):
        merge_maps(empty_map(64, 1.0), empty_map(64, 0.5))


def test_re_anchor_long_drive():
    """Map re-anchoring: odometry anchored kilometres from the origin,
    re-anchored mid-drive — the map frame, stored poses, and subsequent
    alignment all stay consistent (trajectory shifted back by the
    returned offset matches the ground truth like a near-origin run)."""
    import numpy as np

    from fast_gicp_tpu.models.scan_to_map import (
        ScanToMapConfig, ScanToMapOdometry,
    )
    from fast_gicp_tpu.utils.downsample import voxel_downsample
    from fast_gicp_tpu.utils.kitti import ate_rmse
    from tests.test_odometry import _trajectory_scans

    scans, gt = _trajectory_scans(np.random.default_rng(9), n_frames=8)
    scans = [voxel_downsample(s, 0.2) for s in scans]
    anchor = np.float64([3000.0, -2000.0, 50.0])
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, 3] = anchor
    cfg = ScanToMapConfig(resolution=1.0, capacity=1 << 13)
    odo = ScanToMapOdometry(cfg, covariance="knn", initial_pose=T0)
    total_shift = np.zeros(3)
    for i, s in enumerate(scans):
        odo.process(s)
        if i == 3:  # mid-drive re-anchor
            nv_before = int(np.asarray(odo.state.num_voxels))
            shift = odo.re_anchor()
            assert np.linalg.norm(shift - anchor) < 2.0  # ~the anchor
            # nothing evicted
            assert int(np.asarray(odo.state.num_voxels)) == nv_before
            total_shift += shift
    # world trajectory = stored poses + accumulated shift; compare to gt
    # anchored at T0 (gt starts at I; our run starts at T0)
    poses = [p.copy() for p in odo.poses]
    for p in poses:
        p[:3, 3] += total_shift - anchor
    assert ate_rmse(gt, poses) < 0.05


def test_re_anchor_with_process_chunk():
    """re_anchor() between process_chunk calls (advisor round-4 highs):
    stored (chunk, 4, 4) pose blocks must shift without crashing, and the
    cached _last_pose must shift too so the NEXT chunk registers in the
    re-anchored frame instead of kilometres away."""
    import numpy as np

    from fast_gicp_tpu.models.scan_to_map import (
        ScanToMapConfig, ScanToMapOdometry,
    )
    from fast_gicp_tpu.utils.downsample import voxel_downsample
    from fast_gicp_tpu.utils.kitti import ate_rmse
    from tests.test_odometry import _trajectory_scans

    scans, gt = _trajectory_scans(np.random.default_rng(11), n_frames=8)
    scans = [voxel_downsample(s, 0.2) for s in scans]
    anchor = np.float64([3000.0, -2000.0, 50.0])
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, 3] = anchor
    cfg = ScanToMapConfig(resolution=1.0, capacity=1 << 13)
    odo = ScanToMapOdometry(cfg, covariance="knn", initial_pose=T0)
    odo.process_chunk(scans[:4])  # leaves (chunk, 4, 4) blocks in the chain
    shift = odo.re_anchor()       # must handle blocks AND shift _last_pose
    assert np.linalg.norm(shift - anchor) < 2.0
    # the cached latest pose is now near the (new) origin
    last_t = np.asarray(odo._last_pose)[:3, 3]
    assert np.linalg.norm(last_t) < 10.0
    odo.process_chunk(scans[4:])  # next chunk registers in the NEW frame
    poses = [p.copy() for p in odo.poses]
    assert len(poses) == len(scans)
    for p in poses:
        p[:3, 3] += shift - anchor
    assert ate_rmse(gt, poses) < 0.05


def test_sharded_re_anchor_in_mesh_matches_offline():
    """In-mesh sharded re-anchor (one all_to_all voxel redistribution,
    re_anchor_sharded_map) must equal the offline detour it replaces
    (merge -> re_anchor_map on the single-device state -> distribute):
    same voxel sets, same sums, to f32 tolerance."""
    import numpy as np

    from fast_gicp_tpu.models.scan_to_map import (
        ScanToMapConfig, re_anchor_map,
    )
    from fast_gicp_tpu.parallel.sharded import make_mesh
    from fast_gicp_tpu.parallel.sharded_map import (
        ShardedScanToMapOdometry, distribute_map, merge_sharded_map,
        re_anchor_sharded_map,
    )
    from fast_gicp_tpu.utils.downsample import voxel_downsample
    from tests.test_odometry import _trajectory_scans

    scans, _ = _trajectory_scans(np.random.default_rng(13), n_frames=4)
    scans = [voxel_downsample(s, 0.2) for s in scans]
    anchor = np.float64([2000.0, -1500.0, 30.0])
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, 3] = anchor
    mesh = make_mesh(8)
    cfg = ScanToMapConfig(resolution=1.0, capacity=1 << 13)
    odo = ShardedScanToMapOdometry(cfg, mesh=mesh, covariance="knn",
                                   initial_pose=T0)
    for s in scans:
        odo.process(s)

    k = np.int32([2000, -1500, 30])
    cap_local = odo.state.sums.shape[0] // 8

    # offline detour (round-4 documented workaround)
    merged = merge_sharded_map(odo.state)
    offline = distribute_map(
        mesh, re_anchor_map(merged, jnp.asarray(k)),
        capacity_per_device=cap_local,
    )
    # in-mesh
    inmesh = re_anchor_sharded_map(mesh, odo.state, jnp.asarray(k))

    nv_off = np.asarray(offline.num_voxels)
    nv_in = np.asarray(inmesh.num_voxels)
    np.testing.assert_array_equal(nv_in, nv_off)  # same ownership split

    def shard_rows(st, s, nv):
        lo = s * cap_local
        sums = np.asarray(st.sums)[lo:lo + nv[s]]
        coords = np.asarray(st.coords)[lo:lo + nv[s]]
        order = np.lexsort(coords.T)
        return sums[order], coords[order]

    for s in range(8):
        sums_o, coords_o = shard_rows(offline, s, nv_off)
        sums_i, coords_i = shard_rows(inmesh, s, nv_in)
        np.testing.assert_array_equal(coords_i, coords_o)
        np.testing.assert_allclose(sums_i, sums_o, rtol=1e-5, atol=2e-3)


def test_sharded_re_anchor_long_drive():
    """Sharded long drive crossing a re_anchor() boundary: the in-mesh
    redistribution must leave the trajectory continuous (matches the
    single-device re-anchored run) and subsequent aligns consistent."""
    import numpy as np

    from fast_gicp_tpu.models.scan_to_map import (
        ScanToMapConfig, ScanToMapOdometry,
    )
    from fast_gicp_tpu.parallel.sharded import make_mesh
    from fast_gicp_tpu.parallel.sharded_map import ShardedScanToMapOdometry
    from fast_gicp_tpu.utils.downsample import voxel_downsample
    from fast_gicp_tpu.utils.kitti import ate_rmse
    from tests.test_odometry import _trajectory_scans

    scans, gt = _trajectory_scans(np.random.default_rng(17), n_frames=8)
    scans = [voxel_downsample(s, 0.2) for s in scans]
    anchor = np.float64([3000.0, -2000.0, 50.0])
    T0 = np.eye(4, dtype=np.float32)
    T0[:3, 3] = anchor
    cfg = ScanToMapConfig(resolution=1.0, capacity=1 << 13)

    single = ScanToMapOdometry(cfg, covariance="knn", initial_pose=T0)
    sharded = ShardedScanToMapOdometry(cfg, mesh=make_mesh(8),
                                       covariance="knn", initial_pose=T0)
    shift_s = shift_sh = None
    for i, s in enumerate(scans):
        p1 = single.process(s)
        p8 = sharded.process(s)
        np.testing.assert_allclose(p8, p1, atol=5e-3)
        if i == 3:
            shift_s = single.re_anchor()
            shift_sh = sharded.re_anchor()
            np.testing.assert_allclose(shift_sh, shift_s)
            assert np.linalg.norm(shift_sh - anchor) < 2.0
    poses = [p.copy() for p in sharded.poses]
    for p in poses:
        p[:3, 3] += shift_sh - anchor
    assert ate_rmse(gt, poses) < 0.05
