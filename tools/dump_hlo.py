import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import jax, jax.numpy as jnp, numpy as np
from fast_gicp_tpu.models.vgicp import VGICPConfig, make_vgicp_objective
from fast_gicp_tpu.ops.voxelmap import auto_grid_dims, build_voxelmap, neighbor_offsets
from fast_gicp_tpu.precision import f32_matmuls
from fast_gicp_tpu.solver import lsq_solve
n = 22528
dims = (128, 128, 32)
config = VGICPConfig(resolution=1.0, grid_dims=dims)
offsets = jnp.asarray(neighbor_offsets("direct1", 1.5))

@jax.jit
@f32_matmuls
def solve_only(sp, sm, sc, tp, tm, tc):
    vm = build_voxelmap(tp, tm, 1.0, covs=tc, grid_dims=dims)
    lin, err = make_vgicp_objective(sp, sm, sc, vm, offsets, config)
    return lsq_solve(lin, err, jnp.eye(4, dtype=jnp.float32), config.lsq)

import jax.random as jr
sp = jnp.zeros((n,3)); sm = jnp.ones(n, bool); sc = jnp.zeros((n,3,3))
txt = solve_only.lower(sp, sm, sc, sp, sm, sc).compile().as_text()
open("/tmp/solve.hlo","w").write(txt)
print(len(txt))
