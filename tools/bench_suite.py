"""Sweep-tier benchmark suite: one JSON line per segment (round 4, VERDICT r3
item 3 — every recorded number becomes an enforced floor).

Runs each batched sweep at its contract config on the real chip, measuring the
steady-state compiled loop (first call pays trace+compile, the timed second
call uses a fresh key so the device loop re-executes against the jitted-segment
cache). ``tools/check_bench.py`` gates each line against the ``floors`` /
``ceilings`` of the matching ``BENCH_CONTRACT.json`` entry; ``--only a,b``
restricts the run.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_suite.py [--only seg1,seg2]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def _steady(fn, n_work):
    """(first-call result, steady-state wall time, throughput).

    Best-of-3 timed calls (fresh keys, jitted-segment cache hits): single
    calls at the sub-second scale measured up to 50% low under transient
    host contention (a full-gate run flaked three segments 30-50% below
    values re-measured clean minutes later — round-5 incident)."""
    res, summary = fn(jax.random.PRNGKey(0))
    jax.block_until_ready(res.states)
    dt = float("inf")
    summary2 = summary
    for k in (1, 2, 3):
        t0 = time.perf_counter()
        res2, summary2 = fn(jax.random.PRNGKey(k))
        jax.block_until_ready(res2.states)
        dt = min(dt, time.perf_counter() - t0)
    summary2["wall_steady_s"] = round(dt, 3)
    summary2["solves_per_s"] = round(n_work / dt, 1)
    return summary2


def seg_sweep():
    from model_predictive_control_tpu.parallel.batch import parking_sweep

    B, S = 2048, 50
    return _steady(lambda k: parking_sweep(B, S, key=k), B * S)


def seg_sweep_factory():
    # the parking OCP compiled through the model-parametric factory (round 5)
    # at its shipped budget (BENCH_CONTRACT.json::sweep_factory::config)
    from model_predictive_control_tpu.parallel.batch import parking_sweep

    B, S = 2048, 50
    return _steady(
        lambda k: parking_sweep(
            B, S, key=k, backend="factory", inner_iters=14
        ),
        B * S,
    )


def seg_thruster_sweep():
    from model_predictive_control_tpu.parallel.batch import thruster_sweep

    B, S = 2048, 50
    return _steady(lambda k: thruster_sweep(B, S, key=k), B * S)


def seg_tube_sweep():
    from model_predictive_control_tpu.parallel.batch import tube_sweep

    B, S = 65536, 50
    return _steady(lambda k: tube_sweep(B, S, key=k), B * S)


def seg_stochastic_sweep():
    from model_predictive_control_tpu.parallel.batch import stochastic_sweep

    B, S = 65536, 50
    return _steady(lambda k: stochastic_sweep(B, S, key=k), B * S)


def seg_racing_sweep():
    from model_predictive_control_tpu.parallel.batch import racing_sweep

    B, S = 2048, 50
    return _steady(lambda k: racing_sweep(B, S, key=k), B * S)


def seg_racing_sweep_dynamic():
    from model_predictive_control_tpu.parallel.batch import racing_sweep_dynamic

    B, S = 2048, 50
    return _steady(lambda k: racing_sweep_dynamic(B, S, key=k), B * S)


def seg_quadrotor_sweep():
    from model_predictive_control_tpu.parallel.batch import quadrotor_sweep

    B, S = 2048, 50
    return _steady(lambda k: quadrotor_sweep(B, S, key=k), B * S)


def seg_wind_sweep():
    from model_predictive_control_tpu.parallel.batch import wind_sweep

    B, S = 2048, 50
    return _steady(lambda k: wind_sweep(B, S, key=k), B * S)


def seg_offset_free_sweep():
    from model_predictive_control_tpu.parallel.batch import offset_free_sweep

    B, S = 1024, 240
    return _steady(
        lambda k: offset_free_sweep(B, S, key=k, tile=1024), B * S
    )


def seg_mhe_loop():
    from model_predictive_control_tpu.parallel.batch import mhe_loop_sweep

    B, S = 2048, 50
    return _steady(lambda k: mhe_loop_sweep(B, S, key=k), B * S)


def seg_mhe_batch():
    """Linear bounded MHE windows on the fused ADMM kernel (the round-3
    recorded 1.94M windows/s, now contract-gated)."""
    import model_predictive_control_tpu as mpc
    from model_predictive_control_tpu.estimation import make_mhe

    B, M = 65536, 10
    dt = jnp.float32
    problem = mpc.session2_problem(N=20)
    system = problem.system(dt)
    C = jnp.asarray([[1.0, 0.0]], dt)
    msys = type(system)(A=system.A, B=system.B, C=C)
    Qw = (0.02**2) * jnp.eye(2, dtype=dt)
    Rv = jnp.asarray([[0.1**2]], dt)
    mhe = jax.jit(
        lambda: make_mhe(
            msys, Qw, Rv, P0=0.1 * jnp.eye(2, dtype=dt), M=M,
            x_min=jnp.asarray([problem.p_min, problem.v_min], dt),
            x_max=jnp.asarray([problem.p_max, problem.v_max], dt),
            iters=100,
        )
    )()

    def make_data(key):
        k1, k2, k3 = jax.random.split(key, 3)
        x0 = jnp.stack(
            [
                jax.random.uniform(k1, (B,), minval=-130.0, maxval=-30.0),
                jax.random.uniform(k2, (B,), minval=-10.0, maxval=20.0),
            ],
            axis=1,
        ).astype(dt)
        us = jnp.zeros((B, M, 1), dt)
        A = msys.A

        def roll(x):
            def body(x, _):
                xn = A @ x
                return xn, xn

            _, xs = jax.lax.scan(body, x, None, length=M)
            return jnp.concatenate([x[None], xs], axis=0)

        Xs = jax.vmap(roll)(x0)
        ys = Xs[:, :, :1] + 0.1 * jax.random.normal(k3, (B, M + 1, 1), dt)
        return x0, us, ys, Xs

    solve = jax.jit(
        lambda x0, us, ys: mhe.solve_batch(x0, us, ys, tile=2048)
    )
    x0, us, ys, Xs = make_data(jax.random.PRNGKey(0))
    out = solve(x0, us, ys)
    jax.block_until_ready(out[0])
    x0, us, ys, Xs = make_data(jax.random.PRNGKey(1))
    dt_s = float("inf")
    for _ in range(3):  # best-of-3 (see _steady)
        t0 = time.perf_counter()
        out = solve(x0, us, ys)
        jax.block_until_ready(out[0])
        dt_s = min(dt_s, time.perf_counter() - t0)
    xM, _, _, sol = out
    err = jnp.abs(xM[:, 0] - Xs[:, -1, 0])
    return {
        "batch": B,
        "M": M,
        "windows_per_s": round(B / dt_s, 1),
        "converged_rate": float(jnp.mean(sol.converged.astype(jnp.float32))),
        "median_pos_err": float(jnp.median(err)),
        "wall_steady_s": round(dt_s, 3),
    }


def seg_mhe_batch_nl():
    """Nonlinear bounded MHE windows (bicycle tier, v >= 0 hard bound) on the
    FUSED AL-iLQR factory kernel (round 5, VERDICT r4 item 6 — the window
    NLP in additive input mode: decisions = process noises, arrival via the
    γ-gated virtual stage; 14.7k → ~166k windows/s vs the round-4 vmapped
    GN + ADMM path, which tests/test_estimation_nl_fused.py keeps certified
    as the oracle)."""
    from model_predictive_control_tpu.estimation_nl import NonlinearMHE
    from model_predictive_control_tpu.models.bicycle import (
        kinematic_bicycle_ode,
        make_kinematic_ode_rows,
    )
    from model_predictive_control_tpu.models.parameters import (
        VehicleParameters,
    )
    from model_predictive_control_tpu.ops.integrators import rk4

    params = VehicleParameters()
    ts, M, B = 0.05, 10, 4096
    dt = jnp.float32
    step_fn = rk4(lambda x, u: kinematic_bicycle_ode(params, x, u), ts)
    obs_fn = lambda x: x[:2]
    Qw = jnp.diag(jnp.asarray([1e-6, 1e-6, 1e-5, 1e-3], dt))
    Rv = (0.1**2) * jnp.eye(2, dtype=dt)
    P0 = jnp.diag(jnp.asarray([1e-4, 1e-4, 1e-3, 1e-2], dt))
    mhe = NonlinearMHE(
        step_fn, obs_fn, Qw, Rv, P0, M, nx=4,
        x_min=[-3.0, -2.0, -7.0, 0.0], x_max=[3.0, 2.0, 7.0, 1.0],
        gn_iters=3, qp_iters=60, qp_solver="admm",
    )
    kb = float(params.axis_rear) / float(
        params.axis_front + params.axis_rear
    )
    ode_rows = make_kinematic_ode_rows(
        kb, float(params.axis_rear),
        float(params.acceleration), float(params.friction),
    )

    def make_data(key):
        x0 = jax.random.uniform(
            key, (B, 4), minval=-0.5, maxval=0.5, dtype=dt
        ).at[:, 3].set(0.3)
        us = jnp.tile(jnp.asarray([[0.2, 0.05]], dt), (B, M, 1))

        def roll(x, us_):
            def body(x, u):
                xn = step_fn(x, u)
                return xn, xn

            _, xs = jax.lax.scan(body, x, us_)
            return jnp.concatenate([x[None], xs], axis=0)

        Xs = jax.vmap(roll)(x0, us)
        ys = jax.vmap(jax.vmap(obs_fn))(Xs) + 0.1 * jax.random.normal(
            jax.random.fold_in(key, 1), (B, M + 1, 2), dt
        )
        return x0, us, ys, Xs

    solve = jax.jit(
        lambda x0, us, ys: mhe.solve_batch_fused(
            x0, us, ys, ode_rows=ode_rows, ts=ts, obs_indices=(0, 1),
            integrator="rk4", substeps=1, outer_iters=4, inner_iters=8,
            tile=512,
        )
    )
    x0, us, ys, Xs = make_data(jax.random.PRNGKey(0))
    out = solve(x0, us, ys)
    jax.block_until_ready(out[0])
    x0, us, ys, Xs = make_data(jax.random.PRNGKey(1))
    # best-of-3: single-call MHE timings show ±2x host-side jitter at this
    # ~25 ms scale (measured; the 5-repeat distribution is tight at the top)
    dt_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = solve(x0, us, ys)
        jax.block_until_ready(out[0])
        dt_s = min(dt_s, time.perf_counter() - t0)
    xM, X, _w, conv = out
    err = jnp.linalg.norm(xM[:, :2] - Xs[:, -1, :2], axis=-1)
    return {
        "batch": B,
        "M": M,
        "windows_per_s": round(B / dt_s, 1),
        "median_pos_err": float(jnp.median(err)),
        "min_v_estimate": float(X[..., 3].min()),
        "converged_frac": float(jnp.mean(conv.astype(jnp.float32))),
        "wall_steady_s": round(dt_s, 3),
    }


SEGMENTS = {
    "sweep": seg_sweep,
    "sweep_factory": seg_sweep_factory,
    "thruster_sweep": seg_thruster_sweep,
    "tube_sweep": seg_tube_sweep,
    "stochastic_sweep": seg_stochastic_sweep,
    "racing_sweep": seg_racing_sweep,
    "racing_sweep_dynamic": seg_racing_sweep_dynamic,
    "quadrotor_sweep": seg_quadrotor_sweep,
    "wind_sweep": seg_wind_sweep,
    "offset_free_sweep": seg_offset_free_sweep,
    "mhe_loop": seg_mhe_loop,
    "mhe_batch": seg_mhe_batch,
    "mhe_batch_nl": seg_mhe_batch_nl,
}


def main() -> int:
    only = None
    if "--only" in sys.argv:
        only = set(sys.argv[sys.argv.index("--only") + 1].split(","))
    ok = True
    for name, fn in SEGMENTS.items():
        if only is not None and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            summary = fn()
        except Exception as e:  # report-and-continue: the gate decides
            traceback.print_exc()
            print(json.dumps({"segment": name, "error": str(e)[:300]}))
            ok = False
            continue
        summary["segment"] = name
        summary["wall_total_s"] = round(time.perf_counter() - t0, 1)
        print(json.dumps(summary), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    main()
