"""Robustness demo: nominal vs tube vs stochastic vs offset-free, one scenario.

The round-2 robustness layers side by side on the session-2 braking-wall
scenario (``session_2/problem.py:4-33``), each against the disturbance class
it is designed for — the linear-session generalization of the reference's
exercise-5 mismatch methodology (``session4_sol.py:443-488``):

1. **bounded** disturbances (uniform in a box): nominal MPC violates the wall,
   rigid-tube MPC does not (hard guarantee);
2. **Gaussian** noise on the v_max-riding cruise: nominal violates ~50% of
   near-limit steps, chance-constrained MPC caps the rate at ε;
3. **constant actuator bias**: nominal MPC settles with a steady-state offset,
   offset-free MPC estimates the bias and tracks exactly;
4. **nonlinear (round 3)**: parking on a slope with ``friction × 0.8`` — the
   reference's exercise-5 mismatch axis plus a persistent disturbance — where
   the nominal NMPC parks ~0.3 m off and the disturbance-augmented-EKF
   offset-free NMPC (:mod:`..solvers.offset_free_nmpc`) parks at the
   matched-model accuracy level.

Everything is batched over disturbance realizations with ``jax.vmap`` over the
closed-loop scan (realizations are just another scenario axis).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..control.simulate import simulate
from ..solvers.linear_mpc import make_linear_mpc, session2_problem
from ..solvers.offset_free import make_offset_free_mpc
from ..solvers.stochastic import make_stochastic_mpc
from ..solvers.tube import make_tube_mpc

W_HALF = np.array([0.0, 0.45])
SIGMA_V = 0.12
EPS = 0.1
BIAS = 1.5
R_POS = -5.0


def _vmap_runs(ctrl_policy, carry, x0, sys, steps, ws):
    def run_one(w):
        return simulate(
            x0, sys, steps=steps, policy=ctrl_policy, policy_carry=carry,
            disturbances=w,
        )

    return jax.vmap(run_one)(ws)


SLOPE_ACCEL = 0.35  # m/s² downhill component on the v̇ row (section 4)


def nonlinear_offset_free_demo(
    steps: int = 320,
    N: int = 12,
    ts: float = 0.05,
    slope: float = SLOPE_ACCEL,
    friction_scale: float = 0.8,
    dtype=jnp.float32,
) -> dict:
    """Slope-parking comparison: nominal :class:`..solvers.parking.ILQRMPC`
    vs :class:`..solvers.offset_free_nmpc.OffsetFreeNMPC`, both predicting
    with the nominal Euler bicycle against an exact-integration plant with
    ``friction × friction_scale`` plus a constant downhill acceleration."""
    import dataclasses

    from ..models.bicycle import kinematic_bicycle_ode
    from ..models.parameters import VehicleParameters
    from ..ops.integrators import euler, rk4_fine
    from ..solvers.offset_free_nmpc import OffsetFreeNMPC
    from ..solvers.parking import (
        ILQRMPC,
        Q_SOL,
        QN_SCALE_SOL,
        make_parking_ilqr,
    )

    params = VehicleParameters()
    p_true = dataclasses.replace(
        params, friction=params.friction * friction_scale
    )
    drift = jnp.asarray([0.0, 0.0, 0.0, -slope], dtype)
    plant = rk4_fine(
        lambda x, u: kinematic_bicycle_ode(p_true, x, u) + drift,
        ts, substeps=16,
    )
    x0 = jnp.asarray([0.6, -0.25, 0.0, 0.0], dtype)  # session4_sol.py:350

    prob, cons, nc = make_parking_ilqr(
        params, N=N, ts=ts, x_obs=None, Q=Q_SOL, qn_scale=QN_SCALE_SOL,
        dtype=dtype,
    )
    nominal = ILQRMPC(prob, cons, nc, outer_iters=6, inner_iters=15)
    res_nom = simulate(
        x0, plant, steps=steps, policy=nominal.policy(),
        policy_carry=nominal.initial_carry(dtype),
    )

    step_fn = euler(lambda x, u: kinematic_bicycle_ode(params, x, u), ts)
    Q = jnp.asarray(Q_SOL, dtype)
    of = OffsetFreeNMPC(
        step_fn, nx=4, nu=2, N=N, Q=Q, R=jnp.asarray([1.0, 0.01], dtype),
        QN=QN_SCALE_SOL * Q,
        u_lb=[params.min_drive, -params.max_steer],
        u_ub=[params.max_drive, params.max_steer],
        r=[0.0, 0.0], dtype=dtype,
    )
    res_of = simulate(
        x0, plant, steps=steps, policy=of.policy(),
        policy_carry=of.initial_carry(x0),
    )
    return {
        "slope": float(slope),
        "friction_scale": float(friction_scale),
        "nominal_final_dist": float(
            jnp.linalg.norm(res_nom.states[-1, :2])
        ),
        "offset_free_final_dist": float(
            jnp.linalg.norm(res_of.states[-1, :2])
        ),
        "offset_free_success": float(
            np.asarray(res_of.logs["solver_success"]).mean()
        ),
        "d_hat_v_row": float(res_of.logs["disturbance_estimate"][-1, 3]),
        "d_true_v_row": float(-slope * ts),
    }


def run(
    batch: int = 64,
    steps: int = 50,
    N: int = 8,
    iters: int = 300,
    seed: int = 0,
    dtype=jnp.float32,
    outdir=None,
    nonlinear: bool = True,
    nonlinear_steps: int = 320,
):
    """Run all comparisons; returns (results dict, summary dict)."""
    problem = session2_problem(N=N)
    sys = problem.system(dtype)
    rng = np.random.default_rng(seed)
    results = {}

    # -- 1. bounded disturbances: nominal vs tube -------------------------
    x0_b = jnp.asarray([-60.0, 18.0], dtype)
    # adversarially biased uniform noise (worst direction = toward the wall)
    wb = rng.uniform(0.2, 1.0, size=(batch, steps, 2)) * W_HALF
    wb = jnp.asarray(wb, dtype)
    nominal = make_linear_mpc(problem, iters=iters, dtype=dtype, terminal="dare")
    tube = make_tube_mpc(problem, W_HALF, iters=iters, dtype=dtype)
    res_nom = _vmap_runs(
        nominal.policy(), nominal.initial_carry(dtype), x0_b, sys, steps, wb
    )
    res_tube = _vmap_runs(
        tube.policy(), tube.initial_carry(x0_b), x0_b, sys, steps, wb
    )
    wall = problem.p_max
    results["bounded"] = {
        "nominal_violation_frac": float(
            np.asarray(res_nom.states[:, :, 0] > wall).any(axis=1).mean()
        ),
        "tube_violation_frac": float(
            np.asarray(res_tube.states[:, :, 0] > wall).any(axis=1).mean()
        ),
        "tube_ok_frac": float(np.asarray(res_tube.logs["tube_ok"]).mean()),
    }

    # -- 2. Gaussian noise: nominal vs chance-constrained -----------------
    x0_g = jnp.asarray([-100.0, 20.0], dtype)
    wg = np.zeros((batch, steps, 2))
    wg[:, :, 1] = SIGMA_V * rng.standard_normal((batch, steps))
    wg = jnp.asarray(wg, dtype)
    stoch = make_stochastic_mpc(
        problem, np.diag([0.0, SIGMA_V**2]), eps=EPS, iters=iters, dtype=dtype
    )
    res_ng = _vmap_runs(
        nominal.policy(), nominal.initial_carry(dtype), x0_g, sys, steps, wg
    )
    res_st = _vmap_runs(
        stoch.policy(), stoch.initial_carry(dtype), x0_g, sys, steps, wg
    )

    def _vrate(res):
        v = np.asarray(res.states[:, 1:, 1])
        near = v > problem.v_max - 3.0 * SIGMA_V
        return float((v > problem.v_max).sum() / max(near.sum(), 1))

    results["gaussian"] = {
        "eps": EPS,
        "nominal_violation_rate": _vrate(res_ng),
        "stochastic_violation_rate": _vrate(res_st),
    }

    # -- 3. actuator bias: nominal (x_ref) vs offset-free ------------------
    x0_o = jnp.asarray([-20.0, 0.0], dtype)
    biased = lambda x, u: sys.A @ x + sys.B @ (u + BIAS)
    nominal_ref = make_linear_mpc(
        problem, iters=iters, dtype=dtype, terminal="dare",
        x_ref=jnp.asarray([R_POS, 0.0], dtype),
    )
    offset_free = make_offset_free_mpc(problem, r=R_POS, iters=iters, dtype=dtype)
    res_nr = simulate(
        x0_o, biased, steps=80, policy=nominal_ref.policy(),
        policy_carry=nominal_ref.initial_carry(dtype),
    )
    res_of = simulate(
        x0_o, biased, steps=80, policy=offset_free.policy(),
        policy_carry=offset_free.initial_carry(x0_o, dtype),
    )
    results["bias"] = {
        "bias": BIAS,
        "nominal_offset": float(abs(res_nr.states[-1, 0] - R_POS)),
        "offset_free_offset": float(abs(res_of.states[-1, 0] - R_POS)),
        "disturbance_estimate": float(
            res_of.logs["disturbance_estimate"][-1, 0]
        ),
    }

    # -- 4. nonlinear: slope parking, nominal NMPC vs offset-free NMPC -----
    if nonlinear:
        results["nonlinear"] = nonlinear_offset_free_demo(
            steps=nonlinear_steps, dtype=dtype
        )

    summary = {
        "batch": batch,
        "steps": steps,
        **{f"{k}.{kk}": vv for k, v in results.items() for kk, vv in v.items()},
    }
    if outdir is not None:
        _save_plots(res_nom, res_tube, res_nr, res_of, problem, outdir)
    return results, summary


def _save_plots(res_nom, res_tube, res_nr, res_of, problem, outdir):
    import pathlib

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    outdir = pathlib.Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    fig, axes = plt.subplots(1, 2, figsize=(11, 4), sharey=False)
    for ax, res, title in (
        (axes[0], res_nom, "nominal MPC"),
        (axes[1], res_tube, "rigid-tube MPC"),
    ):
        p = np.asarray(res.states[:, :, 0]).T
        ax.plot(p, lw=0.5, alpha=0.4, color="C0")
        ax.axhline(problem.p_max, color="r", ls="--", label="wall p = 1")
        ax.set_title(title)
        ax.set_xlabel("step")
    axes[0].set_ylabel("position [m]")
    axes[0].legend()
    fig.savefig(outdir / "robust_bounded.png", dpi=120)
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(np.asarray(res_nr.states[:, 0]), label="nominal (x_ref)")
    ax.plot(np.asarray(res_of.states[:, 0]), label="offset-free")
    ax.axhline(R_POS, color="k", ls=":", label="reference")
    ax.set_xlabel("step")
    ax.set_ylabel("position [m]")
    ax.legend()
    fig.savefig(outdir / "robust_bias.png", dpi=120)
    plt.close(fig)
