"""Diagnose the headline bench's convergence tail (VERDICT r1 item 2).

Runs the exact bench.py config, then:
- buckets unconverged (scenario, step) pairs: per-step counts, per-scenario
  counts, x0 region of failing scenarios, residual magnitudes at failure;
- re-solves the failing scenarios' closed loops through (a) the Pallas kernel
  with a 4x budget and (b) the XLA per-scenario adaptive-rho path, to see
  whether the tail is recoverable or infeasible.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.control.batch_loop import simulate_batch

BATCH = 65536
STEPS = 50
HORIZON = 20
ADMM_ITERS = 100
TILE = 2048


def main():
    problem = mpc.session2_problem(N=HORIZON)
    ctrl = jax.jit(
        lambda: mpc.make_linear_mpc(
            problem, solver="admm", iters=ADMM_ITERS, dtype=jnp.float32
        )
    )()
    system = problem.system(jnp.float32)
    policy = ctrl.batched_policy(backend="pallas", tile=TILE)

    def run_batch(x0s):
        carry = ctrl.presolve_batch_carry(x0s, iters_mult=4, tile=TILE)
        res = simulate_batch(x0s, system, STEPS, policy, carry)
        return res

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

    res = run_batch(x0s)
    jax.block_until_ready(res.states)
    success = np.asarray(res.logs["solver_success"])  # (STEPS, BATCH)
    prim = np.asarray(res.logs["prim_res"])
    dual = np.asarray(res.logs["dual_res"])
    print("success shape:", success.shape)
    fail = ~success
    print("total failed pairs:", int(fail.sum()), "/", fail.size)
    per_step = fail.sum(axis=1)
    print("failed per step (first 10):", per_step[:10].tolist())
    print("failed per step (last 10):", per_step[-10:].tolist())
    scen_fail_counts = fail.sum(axis=0)
    n_fail_scen = int((scen_fail_counts > 0).sum())
    print("scenarios with >=1 failed step:", n_fail_scen)
    hist = np.bincount(scen_fail_counts[scen_fail_counts > 0], minlength=STEPS + 1)
    print("hist of failed-step-count per failing scenario:",
          {int(i): int(c) for i, c in enumerate(hist) if c})
    idx = np.where(scen_fail_counts > 0)[0]
    x0f = np.asarray(x0s)[idx]
    if len(idx):
        print("x0 range of failing scenarios: p in [%.1f, %.1f], v in [%.1f, %.1f]"
              % (x0f[:, 0].min(), x0f[:, 0].max(), x0f[:, 1].min(), x0f[:, 1].max()))
        # residuals at failing pairs
        pr = prim[fail]; dr = dual[fail]
        print("prim_res at failures: med %.2e max %.2e" % (np.median(pr), pr.max()))
        print("dual_res at failures: med %.2e max %.2e" % (np.median(dr), dr.max()))
        # which tile do they live in?
        tiles = np.unique(idx // TILE)
        print("failing scenarios spread over", len(tiles), "of", BATCH // TILE, "tiles")

    if len(idx) == 0:
        return

    # escalation A: deeper pallas re-solve of the failing scenarios only
    pad = TILE * int(np.ceil(len(idx) / TILE))
    idx_pad = np.concatenate([idx, np.repeat(idx[:1], pad - len(idx))])
    x0_sub = jnp.asarray(np.asarray(x0s)[idx_pad])

    def run_deep(x0s_sub):
        carry = ctrl.presolve_batch_carry(x0s_sub, iters_mult=8, tile=TILE)
        pol = ctrl.batched_policy(backend="pallas", tile=TILE)
        ctrl_deep = ctrl  # same op; deeper iters via policy? policy uses ctrl.iters
        res = simulate_batch(x0s_sub, system, STEPS, pol, carry)
        return res.logs["solver_success"]

    # deeper budget: rebuild controller with 4x iters (same QP family)
    ctrl4 = jax.jit(
        lambda: mpc.make_linear_mpc(
            problem, solver="admm", iters=ADMM_ITERS * 4, dtype=jnp.float32
        )
    )()
    pol4 = ctrl4.batched_policy(backend="pallas", tile=TILE)

    def run_deep4(x0s_sub):
        carry = ctrl4.presolve_batch_carry(x0s_sub, iters_mult=4, tile=TILE)
        res = simulate_batch(x0s_sub, system, STEPS, pol4, carry)
        return res.logs["solver_success"]

    run_deep4 = jax.jit(run_deep4)
    t0 = time.perf_counter()
    s4 = run_deep4(x0_sub)
    jax.block_until_ready(s4)
    t_deep = time.perf_counter() - t0
    s4 = np.asarray(s4)[:, : len(idx)]
    print("escalation pallas 4x: success %.4f (wall %.3fs incl compile)"
          % (s4.mean(), t_deep))
    t0 = time.perf_counter()
    s4b = run_deep4(x0_sub)
    jax.block_until_ready(s4b)
    print("  second call wall %.3fs" % (time.perf_counter() - t0))

    # escalation B: XLA per-scenario adaptive-rho path on the failing subset
    polx = ctrl.batched_policy(backend="xla")

    def run_xla(x0s_sub):
        carry = ctrl.initial_batch_carry(x0s_sub.shape[0], dtype=jnp.float32)
        res = simulate_batch(x0s_sub, system, STEPS, polx, carry)
        return res.logs["solver_success"]

    run_xla = jax.jit(run_xla)
    x0_sub_small = jnp.asarray(np.asarray(x0s)[idx])
    t0 = time.perf_counter()
    sx = run_xla(x0_sub_small)
    jax.block_until_ready(sx)
    t_xla = time.perf_counter() - t0
    sx = np.asarray(sx)
    print("escalation xla adaptive: success %.4f (wall %.3fs incl compile)"
          % (sx.mean(), t_xla))
    t0 = time.perf_counter()
    sxb = run_xla(x0_sub_small)
    jax.block_until_ready(sxb)
    print("  second call wall %.3fs" % (time.perf_counter() - t0))


if __name__ == "__main__":
    main()
