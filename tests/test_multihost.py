"""Multi-process launch path: N=2 CPU processes spanning one global mesh.

The reference is single-process (SURVEY.md §2.4); the multi-host path is
new TPU-native design.  This test proves the process-SPANNING collectives
actually work: two OS processes each with 2 virtual CPU devices join one
4-device mesh via `jax.distributed.initialize`, run the sharded GICP align
(whose psum crosses the process boundary every LM iteration), and each
checks the pose against its own single-process reference solve
(tools/multihost_demo.py)."""

import os
import socket
import subprocess
import sys

import pytest

def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cpu_mesh_soak(tmp_path):
    # "soak" in the name keeps this out of the quick-signal -k filter:
    # it spawns two fresh jax processes (compile from scratch in each).
    if not hasattr(__import__("jax").distributed, "initialize"):
        pytest.skip("jax.distributed unavailable")
    port = _free_port()
    env = dict(os.environ)
    # The workers configure their own virtual-device count; drop the
    # conftest's 8-device flag and any inherited distributed config.
    env.pop("XLA_FLAGS", None)
    for k in list(env):
        if k.startswith(("FAST_GICP_TPU_COORDINATOR",
                         "FAST_GICP_TPU_NUM_PROCESSES",
                         "FAST_GICP_TPU_PROCESS_ID")):
            env.pop(k)
    env["FAST_GICP_TPU_NO_CACHE"] = "1"

    procs = []
    for rank in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "tools/multihost_demo.py",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(rank),
             "--cpu-devices", "2", "--sharded-map"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        ))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"MULTIHOST OK rank={rank}/2 devices=4" in out, out
        # the sharded persistent-map phase ran across the same
        # process-spanning mesh (routed all_to_all fusion + align)
        assert f"MULTIHOST MAP OK rank={rank}/2 frames=3" in out, out

    # Both ranks must print the SAME translation (the result is replicated).
    t_lines = [
        line.split("t=", 1)[1]
        for out in outs for line in out.splitlines()
        if line.startswith("MULTIHOST OK")
    ]
    assert len(t_lines) == 2 and t_lines[0] == t_lines[1], t_lines
