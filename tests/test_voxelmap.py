"""Voxel map build/lookup tests vs a dict-based Python reference."""

import jax.numpy as jnp
import numpy as np

from fast_gicp_tpu.ops.voxelmap import (
    build_voxelmap,
    lookup_voxels,
    neighbor_offsets,
    voxel_coord,
)


def _ref_voxels(pts, res):
    """Python-dict reference of additive accumulation (coord -> members)."""
    coords = np.floor(pts / res - 0.5).astype(np.int64)
    table = {}
    for i, c in enumerate(map(tuple, coords)):
        table.setdefault(c, []).append(i)
    return table


def _cloud(rng, n=500, pad=76):
    pts = (rng.uniform(size=(n, 3)) * 20 - 10).astype(np.float32)
    padded = np.zeros((n + pad, 3), np.float32)
    padded[:n] = pts
    mask = np.zeros(n + pad, bool)
    mask[:n] = True
    return pts, jnp.asarray(padded), jnp.asarray(mask)


def test_voxel_coord_convention():
    # floor(x/res - 0.5): x=0.9, res=1.0 -> floor(0.4) = 0; x=1.6 -> 1
    pts = jnp.asarray([[0.9, 1.6, -0.2]], jnp.float32)
    np.testing.assert_array_equal(np.asarray(voxel_coord(pts, 1.0)), [[0, 1, -1]])


def test_build_additive_matches_reference(rng):
    pts, p, m = _cloud(rng)
    covs = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (p.shape[0], 3, 3))
    res = 2.0
    vm = build_voxelmap(p, m, res, covs=covs, mode="additive")
    ref = _ref_voxels(pts, res)
    assert int(vm.num_voxels) == len(ref)

    counts = np.asarray(vm.counts)
    means = np.asarray(vm.means)
    vcoords = np.asarray(vm.coords)
    nv = int(vm.num_voxels)
    got = {tuple(vcoords[i]): (counts[i], means[i]) for i in range(nv)}
    for c, members in ref.items():
        assert c in got, f"missing voxel {c}"
        n_got, mean_got = got[c]
        assert n_got == len(members)
        np.testing.assert_allclose(
            mean_got, pts[members].mean(0), rtol=1e-4, atol=1e-4
        )


def test_lookup_finds_all_and_rejects_absent(rng):
    pts, p, m = _cloud(rng)
    covs = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (p.shape[0], 3, 3))
    res = 1.0
    vm = build_voxelmap(p, m, res, covs=covs, mode="additive")
    ref = _ref_voxels(pts, res)

    q = np.array(list(ref.keys()), np.int32)
    ids = np.asarray(lookup_voxels(vm, jnp.asarray(q)))
    assert np.all(ids >= 0)
    vcoords = np.asarray(vm.coords)
    np.testing.assert_array_equal(vcoords[ids], q)

    # coords far outside the cloud must miss
    q_bad = jnp.asarray([[999, 999, 999], [-500, 3, 1]], jnp.int32)
    assert np.all(np.asarray(lookup_voxels(vm, q_bad)) == -1)


def test_multiplicative_mode(rng):
    pts, p, m = _cloud(rng, n=200, pad=56)
    covs = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * 2.0, (p.shape[0], 3, 3))
    vm = build_voxelmap(p, m, 2.0, covs=covs, mode="multiplicative")
    nv = int(vm.num_voxels)
    counts = np.asarray(vm.counts)[:nv]
    covs_out = np.asarray(vm.covs)[:nv]
    means = np.asarray(vm.means)[:nv]
    # With identical member covs C, fused cov = C / n and mean = average.
    for i in range(nv):
        np.testing.assert_allclose(
            covs_out[i], np.eye(3) * 2.0 / counts[i], rtol=1e-3, atol=1e-4
        )
    assert np.isfinite(means).all()


def test_raw_mode_ndt_statistics(rng):
    pts, p, m = _cloud(rng, n=400, pad=112)
    res = 4.0
    vm = build_voxelmap(p, m, res, mode="raw")
    ref = _ref_voxels(pts, res)
    vcoords = np.asarray(vm.coords)
    nv = int(vm.num_voxels)
    got = {tuple(vcoords[i]): i for i in range(nv)}
    for c, members in ref.items():
        i = got[c]
        mem = pts[members].astype(np.float64)
        mu = mem.mean(0)
        cov = (mem.T @ mem) / len(mem) - np.outer(mu, mu)
        np.testing.assert_allclose(np.asarray(vm.means)[i], mu, atol=1e-4)
        np.testing.assert_allclose(np.asarray(vm.covs)[i], cov, atol=1e-3)


def test_neighbor_offsets():
    assert neighbor_offsets("direct1").shape == (1, 3)
    assert neighbor_offsets("direct7").shape == (7, 3)
    assert neighbor_offsets("direct27").shape == (27, 3)
    r = neighbor_offsets("direct_radius", 1.5)
    norms = np.linalg.norm(r, axis=1)
    assert np.all(norms <= 1.5) and (r.shape[0] > 7)


def test_masked_points_excluded(rng):
    pts, p, m = _cloud(rng, n=100, pad=28)
    # Put garbage in padded region; it must not create voxels.
    p = p.at[100:].set(1e6)
    covs = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (p.shape[0], 3, 3))
    vm = build_voxelmap(p, m, 1.0, covs=covs, mode="additive")
    assert int(vm.num_voxels) == len(_ref_voxels(pts, 1.0))
    assert int(np.asarray(vm.counts).sum()) == 100


def test_grid_voxelmap_matches_hash(rng):
    """Dense-grid map: same voxel statistics as the hash map (grid voxel ids
    are sparse representative-point indices, so match via coordinates)."""
    pts, p, m = _cloud(rng)
    covs = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (p.shape[0], 3, 3))
    hm = build_voxelmap(p, m, 1.0, covs=covs)
    gm = build_voxelmap(p, m, 1.0, covs=covs, grid_dims=(32, 32, 32))
    assert int(gm.num_voxels) == int(hm.num_voxels)
    nv = int(hm.num_voxels)
    # Look up every hash voxel's coordinate in the grid map; stats must agree.
    gids = np.asarray(lookup_voxels(gm, hm.coords[:nv]))
    assert (gids >= 0).all()
    np.testing.assert_allclose(
        np.asarray(gm.means)[gids], np.asarray(hm.means[:nv]), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(gm.covs)[gids], np.asarray(hm.covs[:nv]), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(gm.counts)[gids], np.asarray(hm.counts[:nv])
    )
    miss = lookup_voxels(gm, jnp.asarray([[500, 500, 500], [-40, 0, 0]]))
    np.testing.assert_array_equal(np.asarray(miss), [-1, -1])


def test_grid_voxelmap_out_of_bounds_dropped(rng):
    """Voxels outside the static grid are dropped, not aliased."""
    pts = np.asarray([[0.6, 0.6, 0.6], [100.0, 100.0, 100.0]], np.float32)
    p = jnp.asarray(pts)
    m = jnp.ones(2, bool)
    covs = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (2, 3, 3))
    gm = build_voxelmap(p, m, 1.0, covs=covs, grid_dims=(8, 8, 8))
    # the outside point is dropped at build: one live voxel, and lookups of
    # the outside coordinate miss rather than alias
    assert int(gm.num_voxels) == 1
    vids = np.asarray(lookup_voxels(gm, voxel_coord(p, 1.0)))
    assert vids[0] >= 0 and vids[1] == -1


def test_auto_grid_dims(rng):
    from fast_gicp_tpu.ops.voxelmap import auto_grid_dims

    pts = (rng.uniform(size=(100, 3)) * 50 - 25).astype(np.float32)
    dims = auto_grid_dims(pts, 1.0)
    assert dims is not None and all(d % 32 == 0 for d in dims)
    coords = np.floor(pts / 1.0 - 0.5)
    span = coords.max(axis=0) - coords.min(axis=0) + 1
    assert all(d >= s for d, s in zip(dims, span))
    assert auto_grid_dims(pts, 0.001) is None  # too many cells -> hash


def test_auto_grid_dims_multi(rng):
    """Union-of-extents sizing covers EVERY frame — including a wide
    mid-sequence outlier that front/middle/back sampling would miss."""
    from fast_gicp_tpu.ops.voxelmap import auto_grid_dims, auto_grid_dims_multi

    narrow = (rng.uniform(size=(60, 3)) * 20 - 10).astype(np.float32)
    wide = (rng.uniform(size=(60, 3)) * 120 - 60).astype(np.float32)
    clouds = [narrow, narrow + 0.1, wide, narrow - 0.1, narrow]
    dims = auto_grid_dims_multi(clouds, 1.0)
    # identical to sizing over the full concatenation (exact union)
    assert dims == auto_grid_dims(np.concatenate(clouds), 1.0)
    # and strictly wider than the narrow-frames-only grid
    narrow_dims = auto_grid_dims(narrow, 1.0)
    assert any(d > nd for d, nd in zip(dims, narrow_dims))
    # empty frames are skipped; all-empty -> None (hash-map fallback)
    assert auto_grid_dims_multi(
        [np.zeros((0, 3), np.float32), narrow], 1.0
    ) == auto_grid_dims(narrow, 1.0)
    assert auto_grid_dims_multi([np.zeros((0, 3), np.float32)], 1.0) is None


def test_vgicp_grid_matches_hash_alignment(rng):
    """End-to-end VGICP: dense-grid config reproduces the hash-map pose."""
    from fast_gicp_tpu.models.vgicp import VGICPConfig, vgicp_align
    from fast_gicp_tpu.ops.covariance import knn_covariances

    n = 512
    base = (rng.uniform(size=(n, 2)) * 8 - 4).astype(np.float32)
    tgt = np.concatenate(
        [base, np.sin(base[:, :1]) * np.cos(base[:, 1:])], axis=1
    ).astype(np.float32)
    c, s = np.cos(0.04), np.sin(0.04)
    R = np.asarray([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    src = tgt @ R.T + np.asarray([0.15, -0.1, 0.05], np.float32)
    p_s, p_t = jnp.asarray(src), jnp.asarray(tgt)
    mask = jnp.ones(n, bool)
    covs_s = knn_covariances(p_s, mask, k=10)
    covs_t = knn_covariances(p_t, mask, k=10)
    guess = jnp.eye(4, dtype=jnp.float32)
    r_hash = vgicp_align(p_s, mask, covs_s, p_t, mask, covs_t, guess,
                         VGICPConfig(resolution=0.5))
    r_grid = vgicp_align(p_s, mask, covs_s, p_t, mask, covs_t, guess,
                         VGICPConfig(resolution=0.5, grid_dims=(32, 32, 32)))
    np.testing.assert_allclose(
        np.asarray(r_hash.transformation),
        np.asarray(r_grid.transformation),
        atol=1e-5,
    )


def test_device_downsample_matches_reference(rng):
    """Device downsample = centroid per occupied voxel, using the map's
    floor(x/res - 0.5) binning (a half-cell shift vs the host PCL-style
    downsampler; both are valid voxel grids)."""
    from fast_gicp_tpu.ops.voxelmap import device_downsample

    res = 0.7
    pts = (rng.uniform(size=(700, 3)) * 20 - 10).astype(np.float32)
    padded = np.zeros((768, 3), np.float32)
    padded[:700] = pts
    mask = np.zeros(768, bool)
    mask[:700] = True
    got, valid, n_live, n_out = device_downsample(
        jnp.asarray(padded), jnp.asarray(mask), res, 768, (48, 48, 48)
    )
    assert int(n_out) == 0
    got = np.asarray(got)[np.asarray(valid)]
    ref = _ref_voxels(pts, res)  # dict reference with the map convention
    assert len(got) == len(ref) == int(n_live)
    centroids = np.stack([pts[m].mean(0) for m in ref.values()])
    key = lambda a: a[np.lexsort(np.round(a.T, 4))]
    np.testing.assert_allclose(key(got), key(centroids), atol=1e-4)


def test_ndt_grid_compact_matches_full_finalize(rng):
    """build_ndt_grid_compact (round-5 fast NDT build: compact occupied
    rows first, finalize + MIN_EIG clamp + pack only those, moments about
    per-voxel corners) must reproduce the original full-table
    _ndt_voxelmap statistics: same occupied voxels, same packed rows for
    every voxel id a lookup can return."""
    import jax

    from fast_gicp_tpu.models.ndt import _ndt_voxelmap
    from fast_gicp_tpu.ops.voxelmap import (
        build_ndt_grid_compact, lookup_ndt_cols, lookup_voxels_cols,
    )

    res = 0.8
    dims = (32, 32, 32)
    pts, padded, mask = _cloud(rng)
    ref_vm = _ndt_voxelmap(padded, mask, res, grid_dims=dims)
    nmap, stats = build_ndt_grid_compact(
        padded, mask, res, dims, budget=1024, with_stats=True
    )
    n = padded.shape[0]

    # probe every reference-occupied voxel coordinate
    coords = np.floor(pts / res - 0.5).astype(np.int32)
    uniq = np.unique(coords, axis=0)
    cx, cy, cz = (jnp.asarray(uniq[:, i]) for i in range(3))
    vid_ref = np.asarray(lookup_voxels_cols(ref_vm, cx, cy, cz))
    vid_new = np.asarray(lookup_ndt_cols(nmap, cx, cy, cz))
    assert (vid_ref >= 0).all() and (vid_new < n).all()
    rows_ref = np.asarray(ref_vm.packed)[vid_ref]
    rows_new = np.asarray(nmap.packed)[vid_new]
    # means exact-ish; covs through the different moment origin + clamp
    np.testing.assert_allclose(rows_new[:, :3], rows_ref[:, :3], atol=1e-5)
    np.testing.assert_allclose(rows_new[:, 3:12], rows_ref[:, 3:12],
                               atol=1e-4)
    np.testing.assert_array_equal(rows_new[:, 12], rows_ref[:, 12])

    # a miss coordinate resolves to the zero sentinel row
    miss = np.asarray(lookup_ndt_cols(
        nmap, jnp.asarray([999]), jnp.asarray([999]), jnp.asarray([999])
    ))
    assert (np.asarray(nmap.packed)[miss] == 0).all()

    # compact stats cover exactly the occupied voxels
    means, valid, cov6 = stats
    assert int(np.asarray(valid).sum()) == len(uniq)
    got = np.sort(np.asarray(means)[np.asarray(valid)], axis=0)
    want = np.sort(rows_ref[:, :3], axis=0)
    np.testing.assert_allclose(got, want, atol=1e-5)
