"""Worker program for tests/test_two_process.py — ONE GLOBAL PROGRAM that
runs identically as a single process (8 local devices) or as one member of a
2-process CPU cluster (4 local devices each, localhost coordinator).

Exercises the REAL multi-process branch of ``parallel/distributed.py``
(VERDICT r4 item 4 — previously dead code): ``initialize`` →
``global_mesh`` → ``process_batch_slice`` → ``make_global_batch`` → a
``shard_map``-ped fused-ADMM-kernel closed-loop segment → allgathered
results written as JSON. The launcher compares the 2-process outputs
against the single-process run of THIS SAME FILE.

Not a test module (underscore prefix): launched via subprocess with env
  JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=<n>,
  [JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID for the cluster]
  MPC_WANT_PROCS=<expected process count>
Usage: python _two_process_worker.py <out.json>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

B = 16
N = 8
STEPS = 2
ITERS = 100
TILE = 2


def main() -> int:
    out_path = sys.argv[1]

    from model_predictive_control_tpu.parallel import (
        global_mesh,
        initialize,
        make_global_batch,
        process_batch_slice,
    )

    want_procs = int(os.environ.get("MPC_WANT_PROCS", "1"))
    multi = initialize()
    assert multi == (want_procs > 1), (multi, want_procs)
    assert jax.process_count() == want_procs, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    import model_predictive_control_tpu as mpc

    mesh = global_mesh()

    # deterministic global scenario batch; every process derives the same
    # table host-side and materializes ONLY its local slice
    rng = np.random.default_rng(0)
    x_full = np.stack(
        [rng.uniform(-100.0, -20.0, B), rng.uniform(-10.0, 20.0, B)], axis=1
    ).astype(np.float32)
    lo, hi = process_batch_slice(B)
    xg = make_global_batch(x_full[lo:hi], mesh)

    problem = mpc.session2_problem(N=N)
    ctrl = mpc.make_linear_mpc(
        problem, solver="admm", iters=ITERS, dtype=jnp.float32
    )
    pol = jax.jit(ctrl.batched_policy(backend="pallas", tile=TILE, mesh=mesh))
    carry = jax.tree.map(
        lambda l: make_global_batch(np.asarray(l)[lo:hi], mesh),
        ctrl.initial_batch_carry(B),
    )

    sysm = problem.system(jnp.float32)
    A, Bm = sysm.A, sysm.B
    plant = jax.jit(lambda x, u: x @ A.T + u @ Bm.T)

    from jax.experimental import multihost_utils

    xs = xg
    u_hist = []
    succ = None
    for t in range(STEPS):
        u0, carry, aux = pol(xs, t, carry)
        xs = plant(xs, u0)
        u_hist.append(
            multihost_utils.process_allgather(u0, tiled=True).tolist()
        )
        succ = multihost_utils.process_allgather(
            aux["solver_success"], tiled=True
        )

    out = {
        "process_count": jax.process_count(),
        "process_index": jax.process_index(),
        "local_devices": jax.local_device_count(),
        "slice": [lo, hi],
        "final_states": multihost_utils.process_allgather(
            xs, tiled=True
        ).tolist(),
        "u_hist": u_hist,
        "success": np.asarray(succ).astype(bool).tolist(),
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
