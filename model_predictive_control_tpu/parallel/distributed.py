"""Multi-host execution: ``jax.distributed`` initialization and global-array
construction for pod-slice sweeps (SURVEY §5.8; BASELINE "N≥2 hosts" scaling
config — green-field, the reference is single-process).

Design: one global program. Every host runs the same script; after
:func:`initialize`, ``jax.devices()`` spans the pod slice and the same
``Mesh``/``NamedSharding`` code used single-host (``parallel.mesh``) shards the
scenario axis over ICI *within* hosts and DCN *across* them — hosts appear on the
outer (data) axis so cross-host traffic stays metrics-only. Host-local scenario
shards are assembled into global arrays with
``jax.make_array_from_process_local_data`` so no host ever materializes the full
65k-scenario batch.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize multi-host JAX if a cluster is configured; no-op otherwise.

    Arguments default from the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) so launchers only export env.
    Returns True when running multi-process.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    if coordinator_address is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(model_parallel: int = 1) -> Mesh:
    """(data × model) mesh over ALL global devices, hosts outermost.

    ``jax.devices()`` orders devices by process, so reshaping with the data axis
    first automatically places the host boundary on the data axis — scenario
    sharding crosses DCN, the (optional) model axis stays within a host's ICI.
    """
    devices = np.asarray(jax.devices())
    n = devices.size
    if n % model_parallel != 0:
        raise ValueError(
            f"{n} global devices not divisible by model_parallel={model_parallel}"
        )
    grid = devices.reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def process_batch_slice(global_batch: int) -> tuple[int, int]:
    """This process's half-open scenario range ``[lo, hi)`` of a global batch.

    The batch must divide evenly by process count (pad upstream if needed) so
    every host runs an identical program shape.
    """
    n_proc = jax.process_count()
    if global_batch % n_proc != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n_proc} processes"
        )
    per = global_batch // n_proc
    pid = jax.process_index()
    return pid * per, (pid + 1) * per


def make_global_batch(host_local, mesh: Mesh):
    """Assemble per-host scenario shards into one global array sharded on the
    data axis. ``host_local``: this host's (B_local, ...) slice."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.make_array_from_process_local_data(sharding, np.asarray(host_local))


def scaling_efficiency(solves_per_s: float, n_chips: int, per_chip_base: float):
    """Scaling efficiency vs a measured 1-chip baseline (BASELINE scaling metric)."""
    return solves_per_s / (n_chips * per_chip_base)
