"""Convergence-ordered scenario compaction experiment (round 5, VERDICT r4
item 7).

The measured tile-granularity finding (docs/ARCHITECTURE.md §3): the fused
kernels' early exit is per-TILE — one straggler pins its whole tile at the
full budget (headline: mean 50.7 of 80 ADMM iterations delivered). If
stragglers CLUSTER into few tiles instead of spreading over all of them,
the other tiles exit early and delivered throughput rises (bound: the 1.6×
full-budget/delivered ratio).

Three arms on the ADMM headline (65k × 50 steps, N=20) and two on the
parking AL-iLQR sweep:

- ``baseline``   — scenarios in RNG order (what ships).
- ``static``     — scenarios sorted ONCE by a boundary-proximity key at
  episode start (zero per-step cost; tests whether straggler-ness is a
  static property of the scenario).
- ``dynamic``    — per closed-loop step, lanes re-binned by the previous
  solve's warm-start displacement ``max|x − x_warm|`` (the cheapest
  per-lane convergence proxy the tile-granular ``ni`` counter admits);
  the gather moves (states, warm_x, warm_y) ≈ 2.2 kB/solve inside the
  jitted scan.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/compaction_probe.py
Prints one JSON line per arm; the verdict (ship or negative result) goes to
docs/ARCHITECTURE.md §3 next to the tile=128 finding.
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

BATCH = 65536
STEPS = 50
HORIZON = 20
ADMM_ITERS = 80
PROBE_ITERS = 16
RHO = 0.035
TILE = 2048


def _controller():
    problem = mpc.session2_problem(N=HORIZON)
    ctrl = jax.jit(
        lambda: mpc.make_linear_mpc(
            problem, solver="admm", iters=ADMM_ITERS, dtype=jnp.float32,
            rho=RHO,
        )
    )()
    return problem, ctrl


def _x0s(key=0):
    kp = jax.random.PRNGKey(key)
    kv = jax.random.fold_in(kp, 1)
    return jnp.stack(
        [
            jax.random.uniform(kp, (BATCH,), minval=-140.0, maxval=-20.0),
            jax.random.uniform(kv, (BATCH,), minval=-15.0, maxval=24.0),
        ],
        axis=1,
    ).astype(jnp.float32)


def _episode(ctrl, system, mode: str):
    nu = ctrl.qp.nu

    def policy(x_batch, t, carry):
        warm_x, warm_y, perm = carry
        q, l, u = jax.vmap(ctrl.qp.qp_vectors)(x_batch)
        sol, ni = admm_solve_pallas(
            ctrl.op, q, l, u, warm_x, warm_y, iters=ADMM_ITERS, chunks=2,
            max_rho_moves=0, polish=False, probe_iters=PROBE_ITERS,
            tile=TILE, return_iters=True,
        )
        wx, wy = ctrl._shift_warm(sol.x, sol.y, axis=1)
        u0 = sol.x[:, :nu]
        if mode == "dynamic":
            # re-bin by the warm-start displacement of THIS solve: lanes at
            # the fixed point (tiny step) go to the front, stragglers pack
            # into the trailing tiles. The permutation rides the carry so
            # states/warm stay consistent; u0 is returned in the CURRENT
            # lane order along with the perm for the caller's bookkeeping.
            key = jnp.max(jnp.abs(sol.x - warm_x), axis=1)
            order = jnp.argsort(key)
            wx = wx[order]
            wy = wy[order]
            perm = perm[order]
            aux = {"ni": ni, "order": order}
        else:
            aux = {"ni": ni}
        return u0, (wx, wy, perm), aux

    def run(x0s):
        carry0 = ctrl.presolve_batch_carry(x0s, iters_mult=2, tile=TILE)
        perm0 = jnp.arange(x0s.shape[0])

        def body(carry, _):
            x, (wx, wy, perm) = carry
            u0, (wx, wy, perm_n), aux = policy(x, 0, (wx, wy, perm))
            x_next = x @ system.A.T + u0 @ system.B.T
            if mode == "dynamic":
                x_next = x_next[aux["order"]]
            return (x_next, (wx, wy, perm_n)), aux["ni"]

        (xT, _), nis = jax.lax.scan(
            body, (x0s, (carry0[0], carry0[1], perm0)), None, length=STEPS
        )
        return xT, nis

    return jax.jit(run)


def main():
    problem, ctrl = _controller()
    system = problem.system(jnp.float32)
    x0s = _x0s(0)
    for mode in ("baseline", "static", "dynamic"):
        xs = x0s
        if mode == "static":
            # boundary proximity: distance of the position to the braking
            # wall p_max scaled by approach speed — the scenarios that
            # activate constraints (and iterate longest) sort together
            from model_predictive_control_tpu.parallel.batch import (
                boundary_compaction_key,
            )

            xs = xs[jnp.argsort(boundary_compaction_key(problem.p_max, xs))]
        run = _episode(ctrl, system, mode)
        xT, nis = run(xs)
        jax.block_until_ready(xT)
        t0 = time.perf_counter()
        xT, nis = run(xs)
        jax.block_until_ready(xT)
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "mode": mode,
                    "solves_per_s": round(BATCH * STEPS / dt, 1),
                    "mean_ni": round(float(jnp.mean(nis)), 2),
                    "wall_s": round(dt, 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
