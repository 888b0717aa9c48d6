import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax, jax.numpy as jnp, numpy as np
from fast_gicp_tpu.ops.voxelmap import _pick8, _mode_contrib, _finalize, _pack, _COORD_SENTINEL, auto_grid_dims
from fast_gicp_tpu.ops import soa
from fast_gicp_tpu.utils.downsample import approximate_voxel_downsample
from fast_gicp_tpu.utils.io import load_pcd, strip_near_origin
from fast_gicp_tpu.utils.padding import pad_points

data = '/root/reference/data'
source = approximate_voxel_downsample(strip_near_origin(load_pcd(f'{data}/251371071.pcd')), 0.1)
target = approximate_voxel_downsample(strip_near_origin(load_pcd(f'{data}/251370668.pcd')), 0.1)
sp, sm = map(jnp.asarray, pad_points(source))
ndims = auto_grid_dims(np.concatenate([source, target]), 1.0)
gx, gy, gz = ndims
ncells = gx*gy*gz
n = sp.shape[0]
M = 30
print('n', n, 'ncells', ncells, flush=True)

def scan_time(name, fn):
    @jax.jit
    def run(pts, mask):
        def step(carry, i):
            p = pts + 1e-6 * i
            out = fn(p, mask)
            return carry + jnp.sum(out[0] if isinstance(out, tuple) else out), None
        return jax.lax.scan(step, 0.0, jnp.arange(M, dtype=jnp.float32))[0]
    r = run(sp, sm); float(r)
    t0 = time.perf_counter(); r = run(sp, sm); float(r)
    print(f'{name:40s} {(time.perf_counter()-t0)/M*1e3:8.3f} ms', flush=True)

def stage_a(p, m):
    coords_c = jnp.floor(jnp.swapaxes(p, 0, 1) / 1.0 - 0.5).astype(jnp.int32)
    origin = jnp.min(jnp.where(m[None, :], coords_c, _COORD_SENTINEL), axis=1)
    rel = coords_c - origin[:, None]
    dims = jnp.asarray([gx, gy, gz], jnp.int32)
    inside = m & jnp.all((rel >= 0) & (rel < dims[:, None]), axis=0)
    flat = (rel[0] * gy + rel[1]) * gz + rel[2]
    return jnp.where(inside, flat, ncells)
scan_time('a: coords+origin+flat (cols)', lambda p, m: stage_a(p, m).astype(jnp.float32))

def stage_b(p, m):
    flat = stage_a(p, m)
    point_idx = jnp.arange(n, dtype=jnp.int32)
    npad = ((ncells + 8) + 7) // 8 * 8
    return jnp.full(npad, n, jnp.int32).at[flat].min(point_idx).astype(jnp.float32)
scan_time('b: + claim scatter-min', stage_b)

def stage_c(p, m):
    flat = stage_a(p, m)
    point_idx = jnp.arange(n, dtype=jnp.int32)
    npad = ((ncells + 8) + 7) // 8 * 8
    claim = jnp.full(npad, n, jnp.int32).at[flat].min(point_idx)
    return _pick8(claim.reshape(npad // 8, 8), flat).astype(jnp.float32)
scan_time('c: + rep pick8', stage_c)

def stage_d(p, m):
    flat = stage_a(p, m)
    point_idx = jnp.arange(n, dtype=jnp.int32)
    npad = ((ncells + 8) + 7) // 8 * 8
    claim = jnp.full(npad, n, jnp.int32).at[flat].min(point_idx)
    rep = _pick8(claim.reshape(npad // 8, 8), flat)
    inside = flat < ncells
    contrib = _mode_contrib(p, inside, None, 'raw')
    vid = jnp.where(inside, rep, n)
    return (jnp.zeros((n + 1, 13), p.dtype).at[vid].add(contrib))[:n]
scan_time('d: + contrib scatter-add', stage_d)

def stage_e(p, m):
    acc = stage_d(p, m)
    means, covs_out, counts = _finalize(acc, 'raw')
    return _pack(means, covs_out, counts, p.dtype)
scan_time('e: + finalize + pack', stage_e)

def stage_f(p, m):
    acc = stage_d(p, m)
    means, covs_out, counts = _finalize(acc, 'raw')
    pk = _pack(means, covs_out, counts, p.dtype)
    C6 = soa.sym_cols_from_covs(covs_out)
    rows9 = soa.sym_cols_to_rows9(soa.clamp_eigs_cols(C6, 1e-3))
    return pk.at[:, 3:12].set(rows9)
scan_time('f: + min_eig cols + packed set', stage_f)
