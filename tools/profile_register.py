"""Device-side trace of the headline `vgicp_register` graph (dev tool).

Runs the bench-shaped fused registration under jax.profiler.trace and
prints the top device ops by total time, so perf work targets real device
milliseconds instead of tunnel dispatch noise (~0.7-1 ms/call).
"""
import glob
import gzip
import json
import os
import sys
import collections

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from fast_gicp_tpu.models.vgicp import VGICPConfig, vgicp_register
from fast_gicp_tpu.ops.voxelmap import auto_grid_dims
from fast_gicp_tpu.utils.downsample import approximate_voxel_downsample
from fast_gicp_tpu.utils.io import load_pcd, strip_near_origin
from fast_gicp_tpu.utils.padding import pad_points

data = "/root/reference/data"
target = approximate_voxel_downsample(
    strip_near_origin(load_pcd(f"{data}/251370668.pcd")), 0.1)
source = approximate_voxel_downsample(
    strip_near_origin(load_pcd(f"{data}/251371071.pcd")), 0.1)
sp, sm = map(jnp.asarray, pad_points(source))
tp, tm = map(jnp.asarray, pad_points(target))
guess = jnp.eye(4, dtype=jnp.float32)
config = VGICPConfig(grid_dims=auto_grid_dims(target, 1.0))
print("shapes:", sp.shape, tp.shape, "device:", jax.devices()[0])

r = vgicp_register(sp, sm, tp, tm, guess, config)  # warm up / compile
np.asarray(r.transformation)

N = 20
tmpdir = "/tmp/fgicp_trace"
os.system(f"rm -rf {tmpdir}")
with jax.profiler.trace(tmpdir):
    for _ in range(N):
        r = vgicp_register(sp, sm, tp, tm, guess, config)
    np.asarray(r.transformation)

path = sorted(glob.glob(f"{tmpdir}/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(path, "rt") as f:
    trace = json.load(f)

# Find device pids (TPU device timelines).
dev_pids = set()
for ev in trace["traceEvents"]:
    if ev.get("ph") == "M" and ev.get("name") == "process_name":
        nm = ev["args"].get("name", "")
        if "TPU" in nm or "/device" in nm.lower():
            dev_pids.add(ev["pid"])
by_op = collections.Counter()
total = 0.0
for ev in trace["traceEvents"]:
    if ev.get("ph") == "X" and ev.get("pid") in dev_pids and "dur" in ev:
        by_op[ev["name"]] += ev["dur"]
        total += ev["dur"]

print(f"device total: {total/1e3/N:.3f} ms/iteration over {N} iterations")
for name, dur in by_op.most_common(40):
    print(f"{dur/1e3/N:9.3f} ms  {name[:110]}")
