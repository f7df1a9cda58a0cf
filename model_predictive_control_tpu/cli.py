"""Command-line entry point: ``python -m model_predictive_control_tpu.cli``.

The reference has no CLI — scenario constants are hard-coded in ``main()`` drivers
(``session_4/main.py:242-248``, SURVEY §5.6). This thin argparse layer exposes the
five BASELINE.json configs as subcommands, each printing one JSON summary line and
optionally writing plots/metrics to ``--outdir``:

  session1             LQR horizon sweep + cost-to-go convergence
  session2 / session3  constrained / relaxed-tracking linear MPC closed loop
  session4             nonlinear parking MPC (``--variant main|sol``)
  sweep                perturbed-plant nonlinear robustness sweep
  tune                 gradient-based MPC weight tuning (differentiable layer)
  estimate             output-feedback MPC on noisy measurements (KF)
  race                 dynamic-bicycle (Pacejka) lap tracking via NMPC
  robust               nominal vs tube vs stochastic vs offset-free demo
  podscale             batched closed-loop throughput over the device mesh
"""

from __future__ import annotations

import argparse
import json


def _add_common(p):
    p.add_argument("--outdir", default=None, help="write plots/metrics here")
    p.add_argument(
        "--platform",
        default=None,
        help="force a JAX platform (e.g. 'cpu'); this container pins a TPU "
        "platform via sitecustomize, so the env var alone is not enough",
    )


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="model_predictive_control_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p1 = sub.add_parser("session1", help="finite-horizon LQR experiments")
    p1.add_argument("--steps", type=int, default=30)
    _add_common(p1)

    for s in (2, 3):
        ps = sub.add_parser(f"session{s}", help=f"session-{s} linear MPC")
        ps.add_argument("--horizon", type=int, default=20)
        ps.add_argument("--steps", type=int, default=60)
        ps.add_argument("--solver", choices=("admm", "pdip"), default="admm")
        ps.add_argument("--iters", type=int, default=200)
        ps.add_argument(
            "--soft",
            action="store_true",
            help="slack-softened state constraints (QP feasible at every state)",
        )
        ps.add_argument(
            "--terminal-set",
            action="store_true",
            help="constrain x_N to the certified inner box of the invariant "
            "DARE ellipsoid (terminal cost + set: recursive feasibility); "
            "shrinks the feasible region, so pair with a nearer --x0",
        )
        ps.add_argument(
            "--x0", type=float, nargs=2, default=None,
            help="initial state (p, v); default (-100, 20)",
        )
        _add_common(ps)

    p4 = sub.add_parser("session4", help="nonlinear parking MPC")
    p4.add_argument("--variant", choices=("main", "sol"), default="main")
    p4.add_argument("--steps", type=int, default=None)
    p4.add_argument("--sqp-iters", type=int, default=15)
    p4.add_argument("--solver", choices=("sqp", "ilqr"), default="sqp")
    p4.add_argument("--animate", action="store_true")
    p4.add_argument(
        "--exercise", type=int, choices=(3, 4), default=None,
        help="run the open-loop exercise-3/4 driver instead of the closed loop",
    )
    _add_common(p4)

    pw = sub.add_parser(
        "sweep", help="nonlinear parking robustness sweep (perturbed plants)"
    )
    pw.add_argument("--batch", type=int, default=256)
    pw.add_argument("--steps", type=int, default=30)
    pw.add_argument("--horizon", type=int, default=30)
    pw.add_argument("--rel-scale", type=float, default=0.1)
    pw.add_argument("--controller-knows", action="store_true")
    pw.add_argument(
        "--solver", choices=("ilqr", "sqp"), default="ilqr",
        help="per-step optimizer; ilqr (AL-iLQR) is the throughput path",
    )
    pw.add_argument(
        "--backend", choices=("pallas", "factory", "xla"), default="pallas",
        help="pallas = hand-specialized fused kernel; factory = the same "
        "OCP compiled through the model-parametric factory (round 5); "
        "xla = vmap reference path",
    )
    pw.add_argument("--sqp-iters", type=int, default=15)
    pw.add_argument("--checkpoint", default=None)
    pw.add_argument("--checkpoint-every", type=int, default=0)
    _add_common(pw)

    pr2 = sub.add_parser(
        "racesweep",
        help="batched lap-tracking sweep on the fused AL-iLQR kernel "
        "(perturbed plants x randomized starts, kinematic tier)",
    )
    pr2.add_argument("--batch", type=int, default=1024)
    pr2.add_argument("--steps", type=int, default=50)
    pr2.add_argument("--horizon", type=int, default=15)
    pr2.add_argument("--speed", type=float, default=0.35)
    pr2.add_argument("--rel-scale", type=float, default=0.1)
    pr2.add_argument(
        "--backend", choices=("pallas", "pallas-hand", "xla"),
        default="pallas",
        help="pallas = fused tracking via the model-parametric factory "
        "(round 5); pallas-hand = the hand-specialized kernel's track mode "
        "(A/B twin); xla = vmap reference path",
    )
    pr2.add_argument(
        "--dynamic", action="store_true",
        help="6-state Pacejka tier at speed (fused dynamic kernel, round 4) "
        "instead of the kinematic tier",
    )
    _add_common(pr2)

    pqs = sub.add_parser(
        "quadsweep",
        help="closed-loop planar-quadrotor loiter tracking on the "
        "model-parametric fused tracker factory (round 4b) under "
        "per-scenario mass/inertia/arm mismatch",
    )
    pqs.add_argument("--batch", type=int, default=2048)
    pqs.add_argument("--steps", type=int, default=50)
    pqs.add_argument("--rel-scale", type=float, default=0.1)

    pts = sub.add_parser(
        "thrustersweep",
        help="closed-loop 3-D thrust-cluster loiter tracking — the nu=4 "
        "factory tier (round 5, unrolled-Cholesky Quu) under per-scenario "
        "mass/drag mismatch",
    )
    pts.add_argument("--batch", type=int, default=2048)
    pts.add_argument("--steps", type=int, default=50)
    pts.add_argument("--rel-scale", type=float, default=0.1)

    pws = sub.add_parser(
        "windsweep",
        help="batched offset-free racing under per-scenario crosswinds "
        "(EKF + disturbance-compensated tracking on the fused kernel)",
    )
    pws.add_argument("--batch", type=int, default=2048)
    pws.add_argument("--steps", type=int, default=50)
    pws.add_argument("--wind", type=float, default=0.004)
    pws.add_argument(
        "--nominal", action="store_true",
        help="ablation: run the uncompensated tracker under the same winds",
    )
    _add_common(pws)

    pt = sub.add_parser(
        "tune",
        help="gradient-tune MPC weights through the differentiable closed loop",
    )
    pt.add_argument("--horizon", type=int, default=6)
    pt.add_argument("--steps", type=int, default=16)
    pt.add_argument("--batch", type=int, default=8)
    pt.add_argument("--updates", type=int, default=15)
    pt.add_argument("--lr", type=float, default=0.3)
    pt.add_argument("--iters", type=int, default=400)
    pt.add_argument(
        "--nonlinear", action="store_true",
        help="tune the NONLINEAR parking tier's cost weights through the "
        "parameter-implicit AL-iLQR (round 3) instead of the linear tier",
    )
    _add_common(pt)

    pe = sub.add_parser(
        "estimate", help="output-feedback MPC on noisy measurements (KF demo)"
    )
    pe.add_argument("--horizon", type=int, default=20)
    pe.add_argument("--steps", type=int, default=60)
    pe.add_argument("--meas-sigma", type=float, default=0.1)
    pe.add_argument("--seed", type=int, default=0)
    _add_common(pe)

    pr = sub.add_parser(
        "race", help="dynamic-bicycle lap tracking (Pacejka tier) via NMPC"
    )
    pr.add_argument("--steps", type=int, default=200)
    pr.add_argument("--horizon", type=int, default=15)
    pr.add_argument("--speed", type=float, default=1.2)
    pr.add_argument(
        "--wind", type=float, default=None,
        help="per-step lateral crosswind drift: run the offset-free "
        "(disturbance-compensated) vs nominal tracker comparison on the "
        "kinematic tier instead of the plain lap",
    )
    pr.add_argument(
        "--kinematic", action="store_true",
        help="use the kinematic tier (parking-grade model) instead",
    )
    _add_common(pr)

    pb = sub.add_parser(
        "robust",
        help="nominal vs tube/stochastic/offset-free demo (linear tiers "
        "+ nonlinear slope-parking offset-free NMPC)",
    )
    pb.add_argument("--batch", type=int, default=64)
    pb.add_argument("--steps", type=int, default=50)
    pb.add_argument("--seed", type=int, default=0)
    pb.add_argument(
        "--no-nonlinear", action="store_true",
        help="skip the nonlinear slope-parking section (section 4)",
    )
    pb.add_argument(
        "--nonlinear-steps", type=int, default=320,
        help="closed-loop steps for the slope-parking comparison",
    )
    _add_common(pb)

    pp = sub.add_parser("podscale", help="batched closed-loop throughput")
    pp.add_argument("--batch", type=int, default=4096)
    pp.add_argument("--steps", type=int, default=50)
    pp.add_argument("--horizon", type=int, default=20)
    pp.add_argument("--iters", type=int, default=100)
    pp.add_argument(
        "--scaling", action="store_true",
        help="weak-scaling ladder over the device mesh (per-chip solves/s + "
        "efficiency; on the 1-chip TPU this measures d=1, on the virtual "
        "CPU mesh it is a plumbing gate)",
    )
    pp.add_argument(
        "--backend", choices=("pallas", "xla"), default="pallas",
        help="pallas = fused VMEM kernel (TPU); xla = vmap reference path",
    )
    _add_common(pp)

    args = parser.parse_args(argv)

    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.cmd == "session1":
        from .experiments import session1

        summary = session1.run(outdir=args.outdir, steps=args.steps)
    elif args.cmd in ("session2", "session3"):
        from .experiments import session23

        summary = session23.run(
            session=int(args.cmd[-1]),
            N=args.horizon,
            steps=args.steps,
            outdir=args.outdir,
            solver=args.solver,
            iters=args.iters,
            soft=args.soft,
            terminal_set=args.terminal_set,
            x0=tuple(args.x0) if args.x0 is not None else (-100.0, 20.0),
        )
    elif args.cmd == "session4":
        from .experiments import session4

        if args.exercise is not None:
            summary = session4.run_open_loop(
                exercise=args.exercise,
                outdir=args.outdir,
                sqp_iters=args.sqp_iters,
            )
        else:
            summary = session4.run(
                variant=args.variant,
                steps=args.steps,
                outdir=args.outdir,
                animate=args.animate,
                sqp_iters=args.sqp_iters,
                solver=args.solver,
            )
    elif args.cmd == "tune":
        if args.nonlinear:
            import jax
            import jax.numpy as jnp

            from .tuning import tune_parking_weights

            # f64 where available (CPU); TPU has no x64 — f32 gradients are
            # ample for weight tuning (verified on chip, finite to 1e-4)
            dt = (
                jnp.float64 if jax.default_backend() == "cpu"
                else jnp.float32
            )
            key = jax.random.PRNGKey(0)
            x0s = jnp.asarray([0.6, -0.25, 0.0, 0.0], dt) \
                + 0.1 * jax.random.normal(key, (args.batch, 4), dt)
            out = tune_parking_weights(
                x0s, steps=args.steps,
                true_Q=[10.0, 10.0, 0.1, 0.1], true_R=[0.1, 0.01],
                updates=args.updates, learning_rate=args.lr, dtype=dt,
            )
            losses = [float(v) for v in out["losses"]]
            summary = {
                "tier": "nonlinear-parking",
                "loss_initial": round(losses[0], 4),
                "loss_final": round(losses[-1], 4),
                "improvement_pct": round(
                    100.0 * (1.0 - losses[-1] / losses[0]), 1
                ),
                "tuned_Q": [round(float(v), 4) for v in out["Q"]],
                "tuned_R": [round(float(v), 4) for v in out["R"]],
            }
        else:
            from .experiments import tuning as tuning_exp

            summary = tuning_exp.run(
                outdir=args.outdir,
                N=args.horizon,
                steps=args.steps,
                batch=args.batch,
                updates=args.updates,
                learning_rate=args.lr,
                iters=args.iters,
            )
    elif args.cmd == "estimate":
        from .experiments import estimation_demo

        summary = estimation_demo.run(
            outdir=args.outdir,
            N=args.horizon,
            steps=args.steps,
            meas_sigma=args.meas_sigma,
            seed=args.seed,
        )
    elif args.cmd == "robust":
        from .experiments import robust_demo

        _res, summary = robust_demo.run(
            batch=args.batch, steps=args.steps, seed=args.seed,
            outdir=args.outdir, nonlinear=not args.no_nonlinear,
            nonlinear_steps=args.nonlinear_steps,
        )
    elif args.cmd == "race":
        from .experiments import racing

        if args.wind is not None:
            summary = racing.crosswind_comparison(
                steps=args.steps, N=args.horizon,
                speed=min(args.speed, 0.35), wind=args.wind,
            )
        else:
            _res, summary = racing.run(
                steps=args.steps,
                N=args.horizon,
                dynamic=not args.kinematic,
                speed=args.speed,
                outdir=args.outdir,
            )
    elif args.cmd == "racesweep":
        from .obs.metrics import Timer
        from .parallel import make_mesh
        from .parallel.batch import racing_sweep, racing_sweep_dynamic

        import jax

        mesh = make_mesh(len(jax.devices()))
        if args.dynamic:
            sweep_fn = racing_sweep_dynamic
            # the dynamic tier has no hand-vs-factory split (its fused kernel
            # IS the factory instantiation) — map pallas-hand to pallas
            be = "pallas" if args.backend == "pallas-hand" else args.backend
            kw = dict(
                batch=args.batch, steps=args.steps, N=args.horizon,
                rel_scale=min(args.rel_scale, 0.05),
                backend=be, mesh=mesh,
            )
        else:
            sweep_fn = racing_sweep
            kw = dict(
                batch=args.batch, steps=args.steps, N=args.horizon,
                speed=args.speed, rel_scale=args.rel_scale,
                backend=args.backend, mesh=mesh,
            )
        with Timer() as t:
            res, summary = sweep_fn(**kw)
            t.fence(res.states)
        summary["wall_s"] = round(t.elapsed, 3)
        # second run with a fresh key measures the compiled device loop
        with Timer() as t2:
            res2, _ = sweep_fn(key=jax.random.PRNGKey(1), **kw)
            t2.fence(res2.states)
        summary["solves_per_s"] = round(
            args.batch * args.steps / t2.elapsed, 1
        )
        summary["wall_steady_s"] = round(t2.elapsed, 3)
    elif args.cmd == "quadsweep":
        from .obs.metrics import Timer
        from .parallel import make_mesh
        from .parallel.batch import quadrotor_sweep

        import jax

        mesh = make_mesh(len(jax.devices()))
        kw = dict(
            batch=args.batch, steps=args.steps, rel_scale=args.rel_scale,
            mesh=mesh,
        )
        with Timer() as t:
            res, summary = quadrotor_sweep(**kw)
            t.fence(res.states)
        summary["wall_s"] = round(t.elapsed, 3)
        with Timer() as t2:
            res2, _ = quadrotor_sweep(key=jax.random.PRNGKey(1), **kw)
            t2.fence(res2.states)
        summary["solves_per_s"] = round(
            args.batch * args.steps / t2.elapsed, 1
        )
        summary["wall_steady_s"] = round(t2.elapsed, 3)
    elif args.cmd == "thrustersweep":
        from .obs.metrics import Timer
        from .parallel import make_mesh
        from .parallel.batch import thruster_sweep

        import jax

        mesh = make_mesh(len(jax.devices()))
        kw = dict(
            batch=args.batch, steps=args.steps, rel_scale=args.rel_scale,
            mesh=mesh,
        )
        with Timer() as t:
            res, summary = thruster_sweep(**kw)
            t.fence(res.states)
        summary["wall_s"] = round(t.elapsed, 3)
        with Timer() as t2:
            res2, _ = thruster_sweep(key=jax.random.PRNGKey(1), **kw)
            t2.fence(res2.states)
        summary["solves_per_s"] = round(
            args.batch * args.steps / t2.elapsed, 1
        )
        summary["wall_steady_s"] = round(t2.elapsed, 3)
    elif args.cmd == "windsweep":
        from .obs.metrics import Timer
        from .parallel import make_mesh
        from .parallel.batch import wind_sweep

        import jax

        mesh = make_mesh(len(jax.devices()))
        kw = dict(
            batch=args.batch, steps=args.steps, wind=args.wind,
            compensate=not args.nominal, mesh=mesh,
        )
        with Timer() as t:
            res, summary = wind_sweep(**kw)
            t.fence(res.states)
        summary["wall_s"] = round(t.elapsed, 3)
        with Timer() as t2:
            res2, _ = wind_sweep(key=jax.random.PRNGKey(1), **kw)
            t2.fence(res2.states)
        summary["solves_per_s"] = round(
            args.batch * args.steps / t2.elapsed, 1
        )
        summary["wall_steady_s"] = round(t2.elapsed, 3)
    elif args.cmd == "sweep":
        from .parallel import make_mesh, parking_sweep
        from .obs.metrics import Timer

        import jax

        mesh = make_mesh(len(jax.devices()))
        with Timer() as t:
            res, summary = parking_sweep(
                batch=args.batch,
                steps=args.steps,
                N=args.horizon,
                rel_scale=args.rel_scale,
                controller_knows=args.controller_knows,
                solver=args.solver,
                backend=args.backend,
                sqp_iters=args.sqp_iters,
                mesh=mesh,
                checkpoint_path=args.checkpoint,
                checkpoint_every=args.checkpoint_every,
            )
            t.fence(res.states)
        summary["wall_s"] = round(t.elapsed, 3)
        summary["solves_per_s"] = round(args.batch * args.steps / t.elapsed, 1)
        # steady-state throughput: the first call pays trace+compile; a second
        # run (fresh key, jitted-segment cache hit) measures the device loop
        with Timer() as t2:
            res2, _ = parking_sweep(
                batch=args.batch,
                steps=args.steps,
                key=jax.random.PRNGKey(1),
                N=args.horizon,
                rel_scale=args.rel_scale,
                controller_knows=args.controller_knows,
                solver=args.solver,
                backend=args.backend,
                sqp_iters=args.sqp_iters,
                mesh=mesh,
            )
            t2.fence(res2.states)
        summary["wall_s_steady"] = round(t2.elapsed, 3)
        summary["solves_per_s_steady"] = round(
            args.batch * args.steps / t2.elapsed, 1
        )
    elif args.cmd == "podscale":
        summary = _podscale(args)
    else:  # pragma: no cover
        parser.error(f"unknown command {args.cmd}")

    print(json.dumps(summary))
    return 0


def _podscale(args) -> dict:
    """Batched closed-loop throughput over all local devices (BASELINE config 5
    at configurable scale; ``bench.py`` runs the fixed 65k headline shape)."""
    import jax
    import jax.numpy as jnp

    if getattr(args, "scaling", False):
        from .parallel.podscale import weak_scaling

        return weak_scaling(
            batch_per_device=args.batch, steps=args.steps,
            horizon=args.horizon, iters=args.iters,
        )

    from . import make_linear_mpc, session2_problem
    from .control.batch_loop import simulate_batch
    from .obs.metrics import Timer
    from .parallel.mesh import DATA_AXIS, batch_sharding, make_mesh

    problem = session2_problem(N=args.horizon)
    ctrl = jax.jit(
        lambda: make_linear_mpc(
            problem, solver="admm", iters=args.iters, dtype=jnp.float32
        )
    )()
    system = problem.system(jnp.float32)
    policy = ctrl.batched_policy(backend=args.backend)

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    sharding = batch_sharding(mesh)
    B = (args.batch // mesh.shape[DATA_AXIS]) * mesh.shape[DATA_AXIS]

    kp, kv = jax.random.split(jax.random.PRNGKey(0))
    x0s = jax.device_put(
        jnp.stack(
            [
                jax.random.uniform(kp, (B,), minval=-140.0, maxval=-20.0),
                jax.random.uniform(kv, (B,), minval=-15.0, maxval=24.0),
            ],
            axis=1,
        ).astype(jnp.float32),
        sharding,
    )

    def run_batch(x0s):
        carry = ctrl.presolve_batch_carry(x0s, iters_mult=4, backend=args.backend)
        res = simulate_batch(x0s, system, args.steps, policy, carry)
        return res.states[-1], res.logs["solver_success"]

    run_jit = jax.jit(run_batch)
    out = run_jit(x0s)  # compile + warm
    jax.block_until_ready(out)
    with Timer() as t:
        out = run_jit(x0s)
        t.fence(out)

    _, success = out
    solves = B * args.steps
    return {
        "metric": "closed_loop_mpc_solves_per_s",
        "batch": B,
        "steps": args.steps,
        "devices": n_dev,
        "backend": args.backend,
        "solves_per_s": round(solves / t.elapsed, 1),
        "success_rate": round(
            float(jnp.mean(success.astype(jnp.float32))), 4
        ),
        "wall_s": round(t.elapsed, 4),
    }


if __name__ == "__main__":
    raise SystemExit(main())
