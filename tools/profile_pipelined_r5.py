import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
import time
import numpy as np
import jax, jax.numpy as jnp
from fast_gicp_tpu import FastVGICP, FastGICP
from fast_gicp_tpu.utils.downsample import approximate_voxel_downsample
from fast_gicp_tpu.utils.io import load_pcd, strip_near_origin

data = "/root/reference/data"
target = approximate_voxel_downsample(strip_near_origin(load_pcd(f"{data}/251370668.pcd")), 0.1)
source = approximate_voxel_downsample(strip_near_origin(load_pcd(f"{data}/251371071.pcd")), 0.1)

reg = FastVGICP()
reg.set_input_target(target)
reg.set_input_source(source)
reg.align()
reg.swap_source_and_target(); reg.align(); reg.swap_source_and_target()

N = 40
def timed(name, fn, sync):
    fn(); sync()  # warm (compile + first-RPC effects out of the timing)
    t0 = time.perf_counter()
    for _ in range(N):
        fn()
    sync()
    print(f"{name:44s} {(time.perf_counter()-t0)*1e3/N:8.2f} ms/it", flush=True)

# 1. pure dispatch cost of the covariance jit (no force)
from fast_gicp_tpu.ops.covariance import knn_covariances_jit
pts, msk = reg._source.points, reg._source.mask
out = [None]
def d1():
    out[0] = knn_covariances_jit(pts, msk, k=20, method="plane")
timed("knn_covariances_jit dispatch", d1, lambda: np.asarray(out[0][0]))

# 2. vgicp_align dispatch with fixed covs
from fast_gicp_tpu.models.vgicp import VGICPConfig, vgicp_align
from fast_gicp_tpu.ops.voxelmap import auto_grid_dims
covs_s = knn_covariances_jit(pts, msk, k=20, method="plane")
tp, tm = reg._target.points, reg._target.mask
covs_t = knn_covariances_jit(tp, tm, k=20, method="plane")
dims = auto_grid_dims(target, 1.0)
cfg = VGICPConfig(grid_dims=dims)
eye = jnp.eye(4, dtype=jnp.float32)
r = vgicp_align(pts, msk, covs_s, tp, tm, covs_t, eye, cfg)
np.asarray(r.transformation)
res = [None]
def d2():
    res[0] = vgicp_align(pts, msk, covs_s, tp, tm, covs_t, eye, cfg)
timed("vgicp_align dispatch (fixed covs)", d2, lambda: np.asarray(res[0].transformation))

# 3. full pipelined fresh protocol
def d3():
    reg.clear_covariances()
    reg.align_async()
timed("class fresh (clear+align_async)", d3, lambda: reg.get_final_transformation())

# 4. reuse protocol
def d4():
    reg.align_async()
    reg.swap_source_and_target()
timed("class reuse (align_async+swap)", d4, lambda: reg.get_final_transformation())

# 5. host-only: config+grid_dims construction
def d5():
    reg._config(grid_dims=reg._grid_dims(reg._target))
timed("host config+auto_grid_dims", d5, lambda: None)
