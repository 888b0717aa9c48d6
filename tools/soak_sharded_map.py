import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
jax.config.update("jax_platforms", "cpu")
import time
import warnings
import numpy as np

from fast_gicp_tpu.models.scan_to_map import ScanToMapConfig
from fast_gicp_tpu.parallel.sharded import make_mesh
from fast_gicp_tpu.parallel.sharded_map import ShardedScanToMapOdometry
from fast_gicp_tpu.utils.downsample import voxel_downsample
from fast_gicp_tpu.utils.kitti import ate_rmse
from fast_gicp_tpu.utils.synthetic import drive_scans

rng = np.random.default_rng(11)
scans, gt = drive_scans(rng, n_frames=200, radius=40.0, sensor_range=35.0,
                        view_fraction=0.12)
clouds = [voxel_downsample(s, 0.4) for s in scans]
print("mean pts", int(np.mean([len(c) for c in clouds])), flush=True)

mesh = make_mesh(8)
cfg = ScanToMapConfig(resolution=1.0, capacity=8 * 1024,
                      max_capacity=1 << 20, grow_check_every=16,
                      eviction_radius=60.0, evict_every=64)
odo = ShardedScanToMapOdometry(cfg, mesh=mesh, covariance="knn")
t0 = time.time()
with warnings.catch_warnings(record=True) as w:
    warnings.simplefilter("always")
    for i, c in enumerate(clouds):
        odo.process(c)  # sync per frame: XLA:CPU in-process collectives
        # abort after 40 s if a device thread starves on this 1-core host
        if i % 50 == 49:
            print(f"frame {i+1}: nv={np.asarray(odo.state.num_voxels)} "
                  f"cap={odo.state.sums.shape[0]//8}/shard "
                  f"({time.time()-t0:.0f}s)", flush=True)
    poses = odo.poses
sat = [str(x.message) for x in w if "capacity" in str(x.message)]
print("saturation warnings:", sat)
print("ATE:", ate_rmse(gt, poses))
print("finite:", all(np.isfinite(p).all() for p in poses))
print("SOAK", "FAIL" if sat else "OK")

# Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
#        python tools/soak_sharded_map.py
#
# Result (2026-08-17, 8 simulated devices, 200 frames, 0.4 m downsample,
# capacity 1024/shard start, eviction radius 60 m every 64 frames):
#   - shards stay balanced (~950-1240 voxels each, max/min < 1.15),
#   - one 2x growth (1024 -> 2048/shard) at ~frame 17,
#   - eviction cycles the live count DOWN (1236 -> 945 per shard) as the
#     drive leaves old geometry behind — bounded memory,
#   - zero saturation warnings, all poses finite, ATE 0.36 m at this
#     deliberately sparse/coarse config.
