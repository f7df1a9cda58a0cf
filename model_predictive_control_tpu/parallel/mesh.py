"""Device-mesh utilities for scenario-sharded batched MPC.

The reference has no distributed layer (SURVEY.md §2 "Parallelism — explicit
statement"); this is green-field TPU design. The parallelism model:

- **data axis** (``"data"``): scenario batch — embarrassingly parallel closed-loop
  solves sharded over chips/hosts; ICI/DCN traffic is metrics-only (global success
  rates, convergence checks via ``psum``-style reductions that XLA inserts for
  cross-shard means).
- **model axis** (``"model"``): the constraint dimension ``m`` of the QP — the ADMM
  iterate ``(z, y)`` and bounds ``(l, u)`` are sharded over rows; the matvecs
  ``A_s x`` (row-parallel, no comm) and ``A_sᵀ(ρz − y)`` (reduce over shards) are the
  tensor-parallel pattern. XLA inserts the collectives from sharding constraints.

Host-count-parametric: the same program runs on 1 chip, 1 host, or a multi-host
``jax.distributed`` mesh (BASELINE scaling configs).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: int | None = None, model_parallel: int = 1
) -> Mesh:
    """Build a 2D (data × model) mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, have {len(devices)}; for CPU tests set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N JAX_PLATFORMS=cpu "
            "before importing jax"
        )
    if n_devices % model_parallel != 0:
        raise ValueError("n_devices must be divisible by model_parallel")
    grid = np.asarray(devices[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel
    )
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Scenario-batch arrays: leading axis over data, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_constraint_sharding(mesh: Mesh) -> NamedSharding:
    """(B, m) ADMM iterates: batch over data, constraint rows over model."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
