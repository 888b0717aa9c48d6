"""Benchmark: VGICP registrations/sec on the reference's bundled 17k-pt pair.

Mirrors the reference's `gicp_align` "100times" protocol (align.cpp:56-103):
each iteration re-estimates both clouds' covariances (RBF kernel path — the
reference's fastest config, vgicp_cuda gpu_rbf_kernel) and runs a full VGICP
align.  Baseline = the reference's best: vgicp_cuda gpu_rbf_kernel 100times
= 590.725 ms / 100 aligns = 169.28 reg/s on an RTX 2080 Ti (README.md:134).

Timing methodology (IMPORTANT on the axon TPU tunnel): `block_until_ready`
does not block and every device->host force costs a flat ~35 ms round trip;
host-side dispatch on this single-core host costs ~0.5 ms per jit call.  So
the 100 registrations run as ONE jitted `lax.scan` (the reference's C++
for-loop has zero loop overhead; the TPU-idiomatic equivalent is rolling
the loop into the graph) and only the final result is forced.  To keep the
protocol honest inside one graph, every scan trip re-observes both clouds
through a tiny rigid jitter — otherwise XLA hoists the loop-invariant
covariance passes and the voxel-map build out of the loop (verified in the
device trace), which would measure a lighter protocol than the reference's
"setInputSource/Target + align each time" loop (align.cpp:56-76).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "registrations/sec", "vs_baseline": N}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_REG_PER_SEC = 100.0 / 0.590725  # vgicp_cuda gpu_rbf_kernel 100times


def _probe_device(timeout: float = 150.0):
    """Touch the device in a THROWAWAY subprocess first: during TPU-tunnel
    outages even `jax.devices()` hangs forever with no error, which would
    turn this benchmark into a silent hang.  Returns the platform name or
    None."""
    code = ("import jax, jax.numpy as jnp; x = jnp.ones((64, 64)); "
            "(x @ x).block_until_ready(); print(jax.devices()[0].platform)")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return None
    return r.stdout.strip() if r.returncode == 0 else None


def _wait_for_device() -> str:
    """Probe, retrying for up to BENCH_TPU_WAIT_S seconds (default 30 min).
    If the device never answers, emit an honest zero-valued JSON line
    instead of hanging the caller forever."""
    deadline = time.monotonic() + float(os.environ.get("BENCH_TPU_WAIT_S", 1800))
    while True:
        platform = _probe_device()
        if platform:
            return platform
        if time.monotonic() >= deadline:
            print("# device unreachable (TPU tunnel outage?) — no benchmark "
                  "run", file=sys.stderr)
            print(json.dumps({
                "metric": "vgicp_17k_pair_registrations_per_sec",
                "value": 0.0,
                "unit": "registrations/sec",
                "vs_baseline": 0.0,
                "error": "device unreachable (TPU tunnel outage)",
            }))
            sys.exit(0)
        print("# device probe failed; retrying in 180 s", file=sys.stderr)
        time.sleep(180)


def main() -> None:
    _wait_for_device()
    import jax
    import jax.numpy as jnp

    from fast_gicp_tpu.models.vgicp import VGICPConfig, vgicp_register
    from fast_gicp_tpu.models.metrics import fitness_score
    from fast_gicp_tpu.utils.downsample import approximate_voxel_downsample
    from fast_gicp_tpu.utils.io import load_pcd, load_relative_txt, strip_near_origin
    from fast_gicp_tpu.utils.padding import pad_points

    data = "/root/reference/data"
    # PCL-ApproximateVoxelGrid-compatible downsample: same filter as the
    # reference benchmark (align.cpp:136-147), so the fitness column is
    # directly comparable to the published 0.204.
    target = approximate_voxel_downsample(
        strip_near_origin(load_pcd(f"{data}/251370668.pcd")), 0.1)
    source = approximate_voxel_downsample(
        strip_near_origin(load_pcd(f"{data}/251371071.pcd")), 0.1)
    gt = load_relative_txt(f"{data}/relative.txt")

    sp, sm = map(jnp.asarray, pad_points(source))
    tp, tm = map(jnp.asarray, pad_points(target))
    guess = jnp.eye(4, dtype=jnp.float32)
    from functools import partial

    from fast_gicp_tpu import se3
    from fast_gicp_tpu.ops.voxelmap import auto_grid_dims

    # refresh_iterations=2: re-search voxel correspondences for 2 LM
    # iterations, then freeze them (the FastGICPSingleThread anchor-trick
    # analogue, fast_gicp_st_impl.hpp:46-54); accuracy vs the full
    # re-search solve is pinned by test_vgicp_two_phase_refresh_matches_full
    # and the t_err/fitness line below.
    config = VGICPConfig(
        grid_dims=auto_grid_dims(target, 1.0), refresh_iterations=2
    )

    @partial(jax.jit, static_argnames=("config",))
    def register_n(sp, sm, tp, tm, jitters, config):
        # Each trip re-observes both clouds through a tiny rigid jitter so
        # NOTHING is loop-invariant: RBF covariances for both clouds, the
        # voxel-map build, and the LM solve all re-run every trip.
        def body(carry, J):
            sj = sp @ J[:3, :3].T + J[:3, 3]
            tj = tp @ J[:3, :3].T + J[:3, 3]
            r = vgicp_register(
                sj, sm, tj, tm, jnp.eye(4, dtype=sp.dtype), config
            )
            return r.transformation, r.iterations

        return jax.lax.scan(body, jnp.eye(4, dtype=jnp.float32), jitters)

    # Accuracy probe on the unjittered pair (also the compile warm-up for
    # vgicp_register; the reference warms the GPU at construction,
    # fast_vgicp_cuda.cu:20).
    result = vgicp_register(sp, sm, tp, tm, guess, config)
    T = np.asarray(result.transformation)

    n_iters = 100
    rng = np.random.default_rng(0)
    twists = 1e-5 * rng.standard_normal((n_iters, 6)).astype(np.float32)
    jitters = jnp.asarray(
        np.stack([np.asarray(se3.se3_exp(jnp.asarray(t))) for t in twists])
    )
    last, _ = register_n(sp, sm, tp, tm, jitters, config)  # warm-up/compile
    np.asarray(last)
    # Enqueue several scans, force ONCE: the single force costs a flat
    # ~23-35 ms on the tunnel (~0.25 ms/reg at 100 regs if paid per scan).
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        last, iters = register_n(sp, sm, tp, tm, jitters, config)
    np.asarray(last)  # force the chain
    dt = (time.perf_counter() - t0) / (n_iters * reps)
    reg_per_sec = 1.0 / dt

    # Accuracy sanity (reported to stderr; the JSON line stays clean).
    delta = np.linalg.inv(gt) @ T
    t_err = float(np.linalg.norm(delta[:3, 3]))
    fitness = float(
        fitness_score(result.transformation, sp, sm, tp, tm)
    )
    # Fitness context: the reference publishes 0.204067 for vgicp on clouds
    # filtered by pcl::ApproximateVoxelGrid; the PCL-compatible downsample
    # above reproduces those clouds to ~0.5% (see utils/downsample.py), and
    # the fitness at the ground-truth pose itself on these clouds is ~0.195
    # — so ~0.20 converged fitness is at the optimum.
    print(
        f"# device={jax.devices()[0]} n_src={len(source)} n_tgt={len(target)} "
        f"t_err={t_err:.4f}m fitness={fitness:.4f} (ref 0.204067) "
        f"iters={int(result.iterations)} ms_per_reg={dt * 1000:.2f}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "vgicp_17k_pair_registrations_per_sec",
                "value": round(reg_per_sec, 2),
                "unit": "registrations/sec",
                "vs_baseline": round(reg_per_sec / BASELINE_REG_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
