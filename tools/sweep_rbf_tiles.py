"""Sweep the RBF moment kernel's tile sizes on the real benchmark clouds.

Each (RQT, RTT) runs in a fresh subprocess (tile sizes are baked into the
traced kernel; the env override in ops/pallas_kernels.py picks them up at
import).  Smaller tiles cull better (the bbox test is per tile pair) but
pay more grid-step overhead — this finds the knee on the current hardware.

Usage: python tools/sweep_rbf_tiles.py            # run the sweep
       FAST_GICP_TPU_RQT=.. _RTT=.. python tools/sweep_rbf_tiles.py --one
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CONFIGS = [(1024, 2048), (512, 2048), (512, 1024), (1024, 1024),
           (256, 2048), (256, 1024), (2048, 2048), (512, 512)]


def run_one():
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from fast_gicp_tpu.ops.covariance import rbf_covariances_jit
    from fast_gicp_tpu.utils.downsample import approximate_voxel_downsample
    from fast_gicp_tpu.utils.io import load_pcd, strip_near_origin
    from fast_gicp_tpu.utils.padding import pad_points

    data = "/root/reference/data"
    source = approximate_voxel_downsample(
        strip_near_origin(load_pcd(f"{data}/251371071.pcd")), 0.1)
    sp, sm = map(jnp.asarray, pad_points(source))
    r = rbf_covariances_jit(sp, sm)
    jax.block_until_ready(r)
    _ = np.asarray(r)[0]
    k = 200
    t0 = time.perf_counter()
    for _ in range(k):
        r = rbf_covariances_jit(sp, sm)
    _ = np.asarray(r)[0, 0]
    dt = (time.perf_counter() - t0) / k * 1e3
    print(f"RQT={os.environ.get('FAST_GICP_TPU_RQT', '1024')} "
          f"RTT={os.environ.get('FAST_GICP_TPU_RTT', '2048')} "
          f"n={sp.shape[0]}  {dt:.3f} ms", flush=True)


def main():
    for rqt, rtt in CONFIGS:
        env = dict(os.environ,
                   FAST_GICP_TPU_RQT=str(rqt), FAST_GICP_TPU_RTT=str(rtt))
        subprocess.run(
            [sys.executable, "-u", __file__, "--one"], env=env, check=False,
            timeout=900,
        )


if __name__ == "__main__":
    if "--one" in sys.argv:
        run_one()
    else:
        main()
