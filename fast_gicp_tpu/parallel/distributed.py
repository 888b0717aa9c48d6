"""Multi-host (multi-process) launch path.

The reference is a single-process library (SURVEY.md §2.4: no NCCL/MPI/Gloo
anywhere in /root/reference) — multi-host execution is new TPU-native design,
not ported behavior.  The model is JAX multi-controller SPMD: every host runs
the same program, `jax.distributed.initialize` wires the processes into one
runtime, and `jax.devices()` then lists the GLOBAL device set.  All the
sharded entry points in `parallel.sharded` / `parallel.sharded_map` are
written against a `Mesh` and `shard_map` with named collectives, so they run
unchanged on a process-spanning mesh — the only genuinely multi-host work is
(a) bootstrapping the runtime and (b) assembling global `jax.Array`s from
process-local shards.  That is what this module provides.

Per-iteration communication is 43 floats per device (the psum'd (err, H, b)
normal equations), so cross-host scaling rides DCN latency, not bandwidth;
see docs/MULTIHOST.md for the runbook.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

_ENV_COORDINATOR = "FAST_GICP_TPU_COORDINATOR"
_ENV_NUM_PROCESSES = "FAST_GICP_TPU_NUM_PROCESSES"
_ENV_PROCESS_ID = "FAST_GICP_TPU_PROCESS_ID"


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: list[int] | None = None,
) -> None:
    """Join (or bootstrap) the multi-process JAX runtime.

    Resolution order for each parameter: explicit argument, then the
    FAST_GICP_TPU_{COORDINATOR,NUM_PROCESSES,PROCESS_ID} environment
    variables, then JAX's own auto-detection (`jax.distributed.initialize()`
    with no arguments works out of the box on TPU pods / GKE, where the
    plugin discovers the coordinator and process ids itself).

    Must be called before any other JAX call that initializes the backend.
    Safe to call in a single-process setting with no configuration at all:
    if nothing is configured and auto-detection is unavailable, this is a
    no-op and the session stays single-process.
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get(_ENV_COORDINATOR)
    if num_processes is None and _ENV_NUM_PROCESSES in os.environ:
        num_processes = int(os.environ[_ENV_NUM_PROCESSES])
    if process_id is None and _ENV_PROCESS_ID in os.environ:
        process_id = int(os.environ[_ENV_PROCESS_ID])

    if coordinator_address is None and num_processes is None:
        # TPU-pod style auto-detection; harmless single-process no-op when
        # no cluster environment is present.
        try:
            jax.distributed.initialize()
        except Exception:
            pass
        return

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def make_global_mesh(n_devices: int | None = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the GLOBAL device set (all processes).

    After `initialize()`, `jax.devices()` enumerates every device in the
    job, ordered so that consecutive blocks belong to the same process —
    a 1-D mesh therefore keeps each process's shard contiguous and the
    psum tree rides ICI within a host before touching DCN.
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_across(mesh: Mesh, local_data, axis: str = DATA_AXIS) -> jax.Array:
    """Assemble a global array sharded over `axis` from per-process data.

    `local_data` is THIS process's contiguous slice of the global leading
    dimension (global rows = sum of local rows over processes, in process
    order).  No cross-host data movement happens: each process only places
    its own rows on its own devices.
    """
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_data))


def replicate(mesh: Mesh, data) -> jax.Array:
    """Assemble a replicated global array (every process passes the SAME
    full array — e.g. the target cloud, voxel-map arrays, or the initial
    guess)."""
    sharding = NamedSharding(mesh, P())
    return jax.make_array_from_process_local_data(sharding, np.asarray(data))


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def gicp_align_multihost(
    mesh: Mesh,
    local_source,
    local_source_mask,
    local_source_covs,
    target,
    target_mask,
    target_covs,
    guess,
    config=None,
):
    """GICP align across processes: each process contributes its own slice
    of the source cloud; the target is replicated.  Thin assembly wrapper
    over `parallel.sharded.gicp_align_sharded`, which already runs the whole
    LM loop inside shard_map with psum'd normal equations.

    The returned LsqResult is replicated — every process holds the full
    pose and can read it without further communication.
    """
    from .sharded import gicp_align_sharded
    from ..models.gicp import GICPConfig

    axis = mesh.axis_names[0]
    args = dict(
        source=shard_across(mesh, local_source, axis),
        source_mask=shard_across(mesh, local_source_mask, axis),
        source_covs=shard_across(mesh, local_source_covs, axis),
        target=replicate(mesh, target),
        target_mask=replicate(mesh, target_mask),
        target_covs=replicate(mesh, target_covs),
        guess=replicate(mesh, guess),
    )
    return gicp_align_sharded(mesh, config=config or GICPConfig(), **args)


def vgicp_align_multihost(
    mesh: Mesh,
    local_source,
    local_source_mask,
    local_source_covs,
    target,
    target_mask,
    target_covs,
    guess,
    config=None,
):
    """VGICP align across processes (voxel map replicated, source sharded);
    see `gicp_align_multihost`."""
    from .sharded import vgicp_align_sharded
    from ..models.vgicp import VGICPConfig

    axis = mesh.axis_names[0]
    return vgicp_align_sharded(
        mesh,
        shard_across(mesh, local_source, axis),
        shard_across(mesh, local_source_mask, axis),
        shard_across(mesh, local_source_covs, axis),
        replicate(mesh, target),
        replicate(mesh, target_mask),
        replicate(mesh, target_covs),
        replicate(mesh, guess),
        config or VGICPConfig(),
    )
