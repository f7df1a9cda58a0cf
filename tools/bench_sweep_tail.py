"""Sweep (iters, chunks, tile) for the headline bench to close the success tail."""
import itertools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.control.batch_loop import simulate_batch

BATCH = 65536
STEPS = 50
HORIZON = 20

problem = mpc.session2_problem(N=HORIZON)
system = problem.system(jnp.float32)

kp = jax.random.PRNGKey(0)
kv = jax.random.PRNGKey(1)
x0s = jnp.stack(
    [
        jax.random.uniform(kp, (BATCH,), minval=-140.0, maxval=-20.0),
        jax.random.uniform(kv, (BATCH,), minval=-15.0, maxval=24.0),
    ],
    axis=1,
).astype(jnp.float32)

configs = []
for c in sys.argv[1:]:
    parts = c.split(",")
    sched = parts[4] if len(parts) > 4 else "uniform"
    rho = float(parts[5]) if len(parts) > 5 else 0.1
    alpha = float(parts[6]) if len(parts) > 6 else 1.6
    configs.append((int(parts[0]), int(parts[1]), int(parts[2]), int(parts[3]), sched, rho, alpha))

for iters, chunks, tile, moves, sched, rho, alpha in configs:
    ctrl = jax.jit(
        lambda it=iters, r=rho: mpc.make_linear_mpc(
            problem, solver="admm", iters=it, dtype=jnp.float32, rho=r
        )
    )()
    policy = ctrl.batched_policy(backend="pallas", tile=tile, chunks=chunks, max_rho_moves=moves, schedule=sched, alpha=alpha)

    def run_batch(x0s, ctrl=ctrl, policy=policy, tile=tile):
        carry = ctrl.presolve_batch_carry(x0s, iters_mult=4, tile=tile)
        res = simulate_batch(x0s, system, STEPS, policy, carry)
        return res.states[-1], res.logs["solver_success"]

    run_batch = jax.jit(run_batch)
    out = run_batch(x0s)
    jax.block_until_ready(out)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_batch(x0s)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    _, success = out
    success = np.asarray(success)
    rate = success.mean()
    print(
        "iters=%4d chunks=%2d tile=%4d moves=%d sched=%s rho=%g alpha=%g  wall=%.3fs  solves/s=%.2fM  success=%.5f  failpairs=%d"
        % (iters, chunks, tile, moves, sched, rho, alpha, dt, BATCH * STEPS / dt / 1e6, rate, (~success).sum()),
        flush=True,
    )
