"""Multi-chip weak-scaling harness for the headline workload (round 4,
VERDICT r3 item 6 — BASELINE.md's third target gets its measurement
*instrument*).

``weak_scaling`` measures batched closed-loop MPC solves/s over a ladder of
data-axis mesh sizes with a FIXED per-device batch (weak scaling): at each
``d`` it builds a ``d``-device mesh, ``shard_map``s the fused ADMM kernel per
device (``LinearMPCController.batched_policy(mesh=...)``), runs the session-2
closed loop, and reports per-chip solves/s plus efficiency vs the 1-device
point.

Hardware reality in this environment: one real TPU chip. On it the harness
measures the ``d=1`` point only; the full ladder runs on the virtual 8-CPU
mesh (``XLA_FLAGS=--xla_force_host_platform_device_count=8``) as a
*plumbing/correctness* gate — those numbers are labeled
``non_performance: true`` and say nothing about real chips.

**Predicted real scaling (from the per-solve byte model,**
``obs/roofline.py``): the per-scenario solves are embarrassingly parallel —
the closed loop's per-solve traffic is HBM-only (ADMM kernel:
``4·(2(n+2m)+(n+m))`` B/solve ≈ 2.2 KB at N=20) and the program contains ZERO
cross-device collectives on the solve path (the only reductions are host-side
summary statistics after the scan). ICI traffic is therefore 0 B/solve and
weak-scaling efficiency is predicted ≈ 1.0 up to compiler/runtime dispatch
overheads (each device runs an independent kernel grid on its local shard).
The one per-STEP global object, the reference time index ``t``, is replicated
scalar state. This prediction is exactly what the virtual-mesh gate checks
structurally (every device executes its shard; results match the unsharded
run bitwise) and what real multi-host hardware would confirm quantitatively.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from ..control.batch_loop import simulate_batch
from .mesh import batch_sharding, make_mesh


def _headline_loop(ctrl, system, policy, x0s, steps):
    carry = ctrl.initial_batch_carry(x0s.shape[0])

    def run(x0s_):
        res = simulate_batch(x0s_, system, steps, policy, carry)
        return res.states[-1], res.logs["solver_success"]

    return jax.jit(run)


def weak_scaling(
    batch_per_device: int = 2048,
    steps: int = 20,
    horizon: int = 20,
    iters: int = 80,
    tile: int = 1024,
    devices: list | None = None,
    ladder: list[int] | None = None,
    dtype=jnp.float32,
) -> dict:
    """Weak-scaling measurement: fixed ``batch_per_device``, mesh sizes from
    ``ladder`` (default: powers of two up to the device count). Returns a
    summary dict with one entry per mesh size and the efficiency profile."""
    import model_predictive_control_tpu as mpc

    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if ladder is None:
        ladder = []
        d = 1
        while d <= n:
            ladder.append(d)
            d *= 2
    non_performance = devices[0].platform != "tpu"

    problem = mpc.session2_problem(N=horizon)
    ctrl = jax.jit(
        lambda: mpc.make_linear_mpc(
            problem, solver="admm", iters=iters, dtype=dtype, rho=0.035
        )
    )()
    system = problem.system(dtype)

    points = []
    base_rate = None
    for d in ladder:
        mesh = make_mesh(d)
        B = batch_per_device * d
        kp = jax.random.PRNGKey(0)
        x0s = jnp.stack(
            [
                jax.random.uniform(kp, (B,), minval=-140.0, maxval=-20.0),
                jax.random.uniform(
                    jax.random.fold_in(kp, 1), (B,), minval=-15.0, maxval=24.0
                ),
            ],
            axis=1,
        ).astype(dtype)
        if d > 1:
            x0s = jax.device_put(x0s, batch_sharding(mesh))
        policy = ctrl.batched_policy(
            backend="pallas", tile=min(tile, batch_per_device),
            max_rho_moves=0, polish=False, probe_iters=16,
            mesh=mesh if d > 1 else None,
        )
        run = _headline_loop(ctrl, system, policy, x0s, steps)
        out = run(x0s)
        jax.block_until_ready(out)
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            out = run(x0s)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        solves = B * steps
        rate = solves / dt
        if base_rate is None:
            base_rate = rate
        success = float(jnp.mean(out[1].astype(jnp.float32)))
        points.append(
            {
                "devices": d,
                "batch": B,
                "solves_per_s": round(rate, 1),
                "per_chip_solves_per_s": round(rate / d, 1),
                "efficiency_vs_1": round(rate / (d * base_rate), 4),
                "success_rate": round(success, 4),
                "wall_s": round(dt, 4),
            }
        )

    return {
        "metric": "weak_scaling_closed_loop_mpc",
        "batch_per_device": batch_per_device,
        "steps": steps,
        "horizon": horizon,
        "platform": devices[0].platform,
        "non_performance": non_performance,
        "predicted_real_efficiency": 1.0,
        "prediction_basis": (
            "zero cross-device collectives on the solve path; per-solve "
            "traffic is ~2.2 KB HBM-only (obs/roofline.py byte model) — see "
            "parallel/podscale.py docstring"
        ),
        "points": points,
    }
