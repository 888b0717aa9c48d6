import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import time
import jax, jax.numpy as jnp, numpy as np
from fast_gicp_tpu.models.vgicp import VGICPConfig, make_vgicp_objective
from fast_gicp_tpu.ops.covariance import rbf_covariances_jit
from fast_gicp_tpu.ops.voxelmap import auto_grid_dims, build_voxelmap, neighbor_offsets
from fast_gicp_tpu.precision import f32_matmuls
from fast_gicp_tpu.solver import LsqConfig, lsq_solve
from fast_gicp_tpu.utils.downsample import voxel_downsample
from fast_gicp_tpu.utils.padding import bucket_size, pad_points
from odometry_bench import _trajectory_scans

rng = np.random.default_rng(7)
scans, gt = _trajectory_scans(rng, n_frames=3)
clouds = [voxel_downsample(s, 0.25) for s in scans]
bucket = max(bucket_size(len(c)) for c in clouds)
padded = [pad_points(c, bucket) for c in clouds]
pts = jnp.asarray(np.stack([p for p, _ in padded]))
msk = jnp.asarray(np.stack([m for _, m in padded]))
dims = auto_grid_dims(np.concatenate(clouds), 1.0)
config = VGICPConfig(resolution=1.0, grid_dims=dims)
offsets = jnp.asarray(neighbor_offsets("direct1", 1.5))

p0, m0, p1, m1 = pts[0], msk[0], pts[1], msk[1]
c0 = rbf_covariances_jit(p0, m0); c1 = rbf_covariances_jit(p1, m1)

@jax.jit
@f32_matmuls
def solve_only(sp, sm, sc, tp, tm, tc):
    vm = build_voxelmap(tp, tm, 1.0, covs=tc, grid_dims=dims)
    lin, err = make_vgicp_objective(sp, sm, sc, vm, offsets, config)
    return lsq_solve(lin, err, jnp.eye(4, dtype=jnp.float32), config.lsq)

r = solve_only(p1, m1, c1, p0, m0, c0)
_ = jax.device_get(r.transformation)
cfn = rbf_covariances_jit.lower(p0, m0).compile()

with jax.profiler.trace("/tmp/jtrace"):
    for _ in range(10):
        r = solve_only(p1, m1, c1, p0, m0, c0)
        c = rbf_covariances_jit(p0, m0)
    _ = jax.device_get(r.transformation); _ = jax.device_get(c)
print("done", int(r.iterations))
