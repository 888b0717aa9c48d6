"""Device trace of the scan-rolled fresh NDT aligns (dev tool, round 5).

Reproduces the apps/align.py device_loop protocol exactly (per-trip rigid
jitter, lax.scan over n aligns, one force at the end) under
jax.profiler.trace, then sums device ops by name — the honest per-align
breakdown (tunnel dispatch floor is ~0.7-1 ms/call; in-scan harness
epilogues pollute per-stage timers, see CLAUDE.md round-4 lore).

Usage: python tools/profile_ndt_r5.py [d2d|p2d] [R]
"""
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from fast_gicp_tpu import se3
from fast_gicp_tpu.models.ndt import NDTConfig, ndt_align
from fast_gicp_tpu.ops.voxelmap import auto_grid_dims
from fast_gicp_tpu.utils.downsample import voxel_downsample
from fast_gicp_tpu.utils.io import load_pcd, strip_near_origin
from fast_gicp_tpu.utils.padding import pad_points

mode = sys.argv[1] if len(sys.argv) > 1 else "d2d"
R = int(sys.argv[2]) if len(sys.argv) > 2 else (3 if mode == "d2d" else 6)

data = "/root/reference/data"
target = voxel_downsample(strip_near_origin(load_pcd(f"{data}/251370668.pcd")), 0.1)
source = voxel_downsample(strip_near_origin(load_pcd(f"{data}/251371071.pcd")), 0.1)
sp, sm = map(jnp.asarray, pad_points(source))
tp, tm = map(jnp.asarray, pad_points(target))
ndims = auto_grid_dims(np.concatenate([source, target]), 1.0)
eye = jnp.eye(4, dtype=jnp.float32)
cfg = NDTConfig(resolution=1.0, grid_dims=ndims, refresh_iterations=R,
                max_source_voxels=2048, distance_mode=mode)
print("shapes:", sp.shape, tp.shape, "grid:", ndims,
      "device:", jax.devices()[0], "mode:", mode, "R:", R)

N = 50
rng = np.random.default_rng(0)
twists = 1e-5 * rng.standard_normal((N, 6)).astype(np.float32)
jitters = jnp.asarray(
    np.stack([np.asarray(se3.se3_exp(jnp.asarray(t))) for t in twists])
)


@jax.jit
def scan_n(jitters):
    def step(carry, J):
        sj = sp @ J[:3, :3].T + J[:3, 3]
        tj = tp @ J[:3, :3].T + J[:3, 3]
        r = ndt_align(sj, sm, tj, tm, eye, cfg)
        return carry, r.transformation
    return jax.lax.scan(step, 0, jitters)[1]


import time
out = scan_n(jitters)
np.asarray(out)  # compile + warm
t0 = time.perf_counter()
out = scan_n(jitters)
np.asarray(out)
wall = (time.perf_counter() - t0) * 1e3 / N
print(f"wall: {wall:.3f} ms/align")

tmpdir = "/tmp/fgicp_ndt_trace"
os.system(f"rm -rf {tmpdir}")
with jax.profiler.trace(tmpdir):
    out = scan_n(jitters)
    np.asarray(out)

path = sorted(glob.glob(f"{tmpdir}/**/*.trace.json.gz", recursive=True))[-1]
with gzip.open(path, "rt") as f:
    trace = json.load(f)

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

print(f"device total: {total/1e3/N:.3f} ms/align over {N} aligns")
for name, dur in by_op.most_common(50):
    print(f"{dur/1e3/N:9.3f} ms  {name[:110]}")
