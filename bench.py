"""Headline benchmark: batched closed-loop MPC solves/s per chip (N=20 horizon).

Runs the BASELINE.json headline config — session-2 constrained linear MPC, horizon
N=20, receding-horizon box-QP — as a batch of randomized scenarios, each stepping a
closed loop (solve QP at measured state → apply u_0 → advance plant) entirely on
device, through the fused Pallas ADMM kernel (VMEM-resident iterations, one HBM
round-trip per solve). Prints ONE JSON line; vs_baseline is measured solves/s over
the 10k/s north-star target (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.control.batch_loop import simulate_batch

BATCH = 65536
STEPS = 50
HORIZON = 20
ADMM_ITERS = 100
# tile sweep on v5e (65k batch, 50 steps, per-scenario early exit in kernel):
# 128→1.88M, 256→2.22M, 512→2.34M solves/s (success 0.995→0.993); 1024 exceeds
# the 16M VMEM scoped limit. Without early exit 512 gave 1.80M at 0.990.
# Fused-iteration kernel (one (T,80)@(80,80) bf16x3 MXU op per ADMM iteration)
# with an exit-probe chunk and early-exit CG polish (always applied, so the
# batched path stays solution-equivalent to the per-scenario XLA path):
# 4.74M at success 0.9962 with tile=512. Raising the scoped-VMEM cap unlocks
# bigger tiles (1024 -> 4.90M, 2048 -> knee, 4096 -> 5.06M); with tile=2048 and
# a fine-chunked presolve the headline lands at ~5.1M, success 0.9956.
# Convergence-gated polish variants reached 5.5-6.6M but let converged tiles
# drift from the polished scalar path and were rejected.
TILE = 2048
TARGET_SOLVES_PER_S = 10_000.0


def main() -> None:
    problem = mpc.session2_problem(N=HORIZON)
    # jit the whole controller construction: eager setup pays per-op dispatch
    # (~50 s through the remote-compile tunnel); one graph compiles in seconds.
    ctrl = jax.jit(
        lambda: mpc.make_linear_mpc(
            problem, solver="admm", iters=ADMM_ITERS, dtype=jnp.float32
        )
    )()
    system = problem.system(jnp.float32)
    policy = ctrl.batched_policy(backend="pallas", tile=TILE)

    def run_batch(x0s):
        # presolve: one deeper solve at the initial states warms step 0 up to the
        # steady-state success rate; timed as part of the episode (honest cost).
        carry = ctrl.presolve_batch_carry(x0s, iters_mult=4, tile=TILE)
        res = simulate_batch(x0s, system, STEPS, policy, carry)
        return res.states[-1], res.logs["solver_success"]

    run_batch = jax.jit(run_batch)

    kp = jax.random.PRNGKey(0)
    kv = jax.random.PRNGKey(1)
    x0s = jnp.stack(
        [
            jax.random.uniform(kp, (BATCH,), minval=-140.0, maxval=-20.0),
            jax.random.uniform(kv, (BATCH,), minval=-15.0, maxval=24.0),
        ],
        axis=1,
    ).astype(jnp.float32)

    # warmup / compile
    out = run_batch(x0s)
    jax.block_until_ready(out)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_batch(x0s)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)

    n_solves = BATCH * STEPS
    solves_per_s = n_solves / dt
    _, success = out
    success_rate = float(jnp.mean(success.astype(jnp.float32)))

    print(
        json.dumps(
            {
                "metric": "closed_loop_mpc_solves_per_s_per_chip_N20",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / TARGET_SOLVES_PER_S, 3),
                "batch": BATCH,
                "steps": STEPS,
                "admm_iters": ADMM_ITERS,
                "success_rate": round(success_rate, 4),
                "wall_s": round(dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
