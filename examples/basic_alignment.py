#!/usr/bin/env python3
"""Basic alignment: the pygicp drop-in surface and the class API.

Mirrors the reference's gicp_test scenarios (forward / backward / swap,
gicp_test.cpp:147-201) on the bundled LiDAR pair.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from fast_gicp_tpu import pygicp
from fast_gicp_tpu.utils.io import load_pcd, load_relative_txt

DATA = "/root/reference/data"


def main():
    target = load_pcd(f"{DATA}/251370668.pcd")
    source = load_pcd(f"{DATA}/251371071.pcd")
    gt = load_relative_txt(f"{DATA}/relative.txt")

    # One-shot functional API (main.cpp:64-167 signature parity).
    T = pygicp.align_points(
        target, source, method="VGICP", downsample_resolution=0.25
    )
    err = np.linalg.norm((np.linalg.inv(gt) @ T)[:3, 3])
    print(f"align_points VGICP: translation error {err:.4f} m")

    # Class API with covariance reuse (odometry-style swap).
    reg = pygicp.FastVGICP()
    reg.set_nearest_neighbor_method("rbf")  # fastest covariance path
    reg.set_input_target(pygicp.downsample(target, 0.25))
    reg.set_input_source(pygicp.downsample(source, 0.25))
    T1 = reg.align()
    print(
        f"class API: converged={reg.has_converged()} "
        f"fitness={reg.get_fitness_score():.4f} "
        f"iters={reg.get_num_iterations()}"
    )
    # swap reuses the cached covariances; aligning back gives the inverse
    reg.swap_source_and_target()
    T2 = reg.align()
    roundtrip = np.linalg.norm((T1 @ T2)[:3, 3])
    print(f"swap roundtrip |T1 @ T2 - I| translation: {roundtrip:.5f} m")

    # 6x6 Hessian for downstream uncertainty (lsq_registration.hpp:55).
    H = reg.get_final_hessian()
    print(f"final Hessian condition number: {np.linalg.cond(H):.1f}")


if __name__ == "__main__":
    main()
