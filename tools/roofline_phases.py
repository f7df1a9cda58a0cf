"""Measured phase split of the fused ADMM kernel (round 4, VERDICT r3 item 5).

Round 3's roofline attributed the headline kernel's gap to "(a) early exits,
(b) residual checks/elementwise lanes, (c) plant step" without measuring any
term. This tool measures them, by timing ablated kernel variants at the
headline config on the real chip:

1. **Per-iteration cost + fixed overhead**: solves with early exit DISABLED
   (``eps_abs=0``) at iteration budgets {20, 80, 160} — the slope is the pure
   main-loop cost/iteration, the intercept is setup + dispatch + output.
2. **Residual-check cost**: eps=0 runs at {1 check, 3 checks} — the marginal
   per-check cost (full-precision residual matmuls).
3. **Early-exit savings**: the shipped warm-started config vs the eps=0 full
   budget (same 80-cap), on warm-started solves.
4. **Plant + scan share**: the closed loop with a CONSTANT-control policy
   (no solver) vs the measured bench loop.

Prints one JSON line; `docs/ARCHITECTURE.md` §3's phase table records the
measurement.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/roofline_phases.py
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.control.batch_loop import simulate_batch
from model_predictive_control_tpu.ops.pallas.admm_kernel import (
    admm_solve_pallas,
)

BATCH, STEPS, HORIZON = 65536, 50, 20
RHO, TILE, PROBE = 0.035, 2048, 16

problem = mpc.session2_problem(N=HORIZON)
ctrl = jax.jit(
    lambda: mpc.make_linear_mpc(
        problem, solver="admm", iters=80, dtype=jnp.float32, rho=RHO
    )
)()
system = problem.system(jnp.float32)

kp, kv = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
x0s = jnp.stack(
    [
        jax.random.uniform(kp, (BATCH,), minval=-140.0, maxval=-20.0),
        jax.random.uniform(kv, (BATCH,), minval=-15.0, maxval=24.0),
    ],
    axis=1,
).astype(jnp.float32)

# warm starts from the presolve (the hot path is warm by construction)
warm = ctrl.presolve_batch_carry(x0s, iters_mult=2, tile=TILE)
wx, wy = warm
q, l, u = jax.jit(jax.vmap(ctrl.qp.qp_vectors))(x0s)


def time_solve(tag, **kw):
    """Min-of-3 wall time for one batched kernel call; fresh q each rep
    (q + tiny jitter) so the remote runtime cannot dedupe identical calls."""
    fn = jax.jit(
        lambda q_, l_, u_, wx_, wy_: admm_solve_pallas(
            ctrl.op, q_, l_, u_, wx_, wy_, tile=TILE, **kw
        )
    )
    out = fn(q, l, u, wx, wy)
    jax.block_until_ready(out.x)
    times = []
    for k in range(3):
        qk = q + 1e-7 * (k + 1)
        t0 = time.perf_counter()
        out = fn(qk, l, u, wx, wy)
        jax.block_until_ready(out.x)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"# {tag}: {dt*1e3:.1f} ms ({BATCH/dt/1e6:.2f}M solves/s)",
          file=sys.stderr)
    return dt


# 1. per-iteration slope at eps=0 (no early exit), minimal checks
t20 = time_solve("eps0 iters=20", iters=20, chunks=1, probe_iters=0,
                 max_rho_moves=0, polish=False, eps_abs=0.0)
t80 = time_solve("eps0 iters=80", iters=80, chunks=1, probe_iters=0,
                 max_rho_moves=0, polish=False, eps_abs=0.0)
t160 = time_solve("eps0 iters=160", iters=160, chunks=1, probe_iters=0,
                  max_rho_moves=0, polish=False, eps_abs=0.0)
slope = (t160 - t20) / 140.0  # s per iteration (batch-wide)
intercept = t80 - 80.0 * slope

# 2. marginal residual-check cost: 3 checks (probe + 2 chunks) vs 1 check
t80_3chk = time_solve("eps0 iters=80 3-checks", iters=80, chunks=2,
                      probe_iters=PROBE, max_rho_moves=0, polish=False,
                      eps_abs=0.0)
per_check = max(0.0, (t80_3chk - t80) / 2.0)

# 3. shipped config (early exit on, warm): the delivered wall time
t_ship = time_solve("shipped warm (early exit)", iters=80, chunks=2,
                    probe_iters=PROBE, max_rho_moves=0, polish=False)

# 4. plant + scan share: closed loop with constant control vs the bench loop
nu = ctrl.qp.nu


def const_policy(x_batch, t, carry):
    return jnp.zeros((x_batch.shape[0], nu), jnp.float32), carry, {}


@jax.jit
def plant_only(x0s_):
    res = simulate_batch(x0s_, system, STEPS, const_policy, ())
    return res.states[-1]


out = plant_only(x0s)
jax.block_until_ready(out)
times = []
for k in range(3):
    t0 = time.perf_counter()
    out = plant_only(x0s + 1e-6 * (k + 1))
    jax.block_until_ready(out)
    times.append(time.perf_counter() - t0)
t_plant_loop = min(times)

summary = {
    "metric": "admm_kernel_phase_split",
    "config": {"batch": BATCH, "horizon": HORIZON, "tile": TILE},
    "per_iteration_ms": round(slope * 1e3, 4),
    "fixed_overhead_ms": round(intercept * 1e3, 2),
    "per_residual_check_ms": round(per_check * 1e3, 3),
    "full_budget_80_ms": round(t80 * 1e3, 2),
    "shipped_warm_ms": round(t_ship * 1e3, 2),
    "early_exit_saving_ms": round((t80_3chk - t_ship) * 1e3, 2),
    "plant_scan_per_step_ms": round(t_plant_loop / STEPS * 1e3, 3),
    "solves_per_s_shipped_single_call": round(BATCH / t_ship, 1),
}
print(json.dumps(summary))
