"""Racing demo: dynamic single-track (Pacejka) lap tracking with nonlinear MPC.

The reference's course context is a miniature race-car class (the external
"rcracers" simulator, SURVEY.md §0), and its parameter file carries full
Magic-Formula tire and motor constants (``session_4/parameters.py:24-43``) that
no committed exercise ever drives. This driver completes that surface: a
closed-loop lap around an ellipse track with the dynamic bicycle
(:func:`...models.bicycle.dynamic_bicycle_ode`) under the nonlinear tracking
MPC (:class:`...solvers.nmpc_tracking.TrackingNMPC`), with the kinematic tier
(``exercise``-grade model) available for comparison.

Plant/prediction split mirrors the reference's mismatch methodology
(``session4_sol.py:443-488``): prediction and plant use different integration
tiers, so the tracking numbers include realistic model error, not a
self-fulfilling same-model loop. Kinematic tier: Euler prediction (the
reference's tier, ``main.py:76``) vs RK4 plant. Dynamic tier: 4-substep RK4
prediction vs 16-substep RK4 plant — Euler prediction is unstable on the stiff
Pacejka yaw mode at this scale (see the inline analysis in
:func:`make_racing_mpc`).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..control.simulate import simulate
from ..models.bicycle import (
    NX,
    NX_DYNAMIC,
    dynamic_bicycle_ode,
    kinematic_bicycle_ode,
)
from ..models.parameters import VehicleParameters
from ..ops.integrators import euler, rk4, rk4_fine
from ..solvers.nmpc_tracking import TrackingNMPC

# track + scenario constants (miniature scale: the car is 0.17 m long and the
# state box is ±3 m × ±2 m, parameters.py:38-41 — the ellipse fits inside it)
ELLIPSE_A = 1.5
ELLIPSE_B = 1.0
SPEED = 1.2  # m/s — beyond the kinematic tier's 0.5 m/s cap; racing is the dynamic tier
TS = 0.05
HORIZON = 15

Q_DYNAMIC = (40.0, 40.0, 4.0, 1.0, 0.2, 0.05)
R_DYNAMIC = (0.5, 0.5)
Q_KINEMATIC = (40.0, 40.0, 4.0, 1.0)
R_KINEMATIC = (0.5, 0.5)
QN_SCALE = 5.0


def ellipse_reference(
    n: int,
    a: float = ELLIPSE_A,
    b: float = ELLIPSE_B,
    speed: float = SPEED,
    ts: float = TS,
    dynamic: bool = True,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Constant-speed state reference along an ellipse, ``(n, nx)`` rows.

    Host-side setup (float64 numpy): dense arclength table → resample the curve
    parameter at ``s = speed · t`` so the reference moves at constant ground
    speed; heading is the unwrapped path tangent; the dynamic tier adds body
    velocities ``(v_x = speed, v_y = 0)`` and yaw rate ``ω = ψ̇``.
    """
    theta_dense = np.linspace(0.0, 2.0 * np.pi, 20_000)
    dx = -a * np.sin(theta_dense)
    dy = b * np.cos(theta_dense)
    seg_speed = np.hypot(dx, dy)
    s_dense = np.concatenate(
        [[0.0], np.cumsum(0.5 * (seg_speed[1:] + seg_speed[:-1])
                          * np.diff(theta_dense))]
    )
    s_wanted = speed * ts * np.arange(n)
    theta = np.interp(np.mod(s_wanted, s_dense[-1]), s_dense, theta_dense)
    # unwrap the curve parameter across laps so psi can unwrap too
    theta = theta + 2.0 * np.pi * np.floor(s_wanted / s_dense[-1])

    px = a * np.cos(theta)
    py = b * np.sin(theta)
    psi = np.unwrap(np.arctan2(b * np.cos(theta), -a * np.sin(theta)))
    if not dynamic:
        ref = np.stack([px, py, psi, np.full(n, speed)], axis=1)
        return jnp.asarray(ref, dtype=dtype)
    omega = np.gradient(psi, ts)
    ref = np.stack(
        [px, py, psi, np.full(n, speed), np.zeros(n), omega], axis=1
    )
    return jnp.asarray(ref, dtype=dtype)


def make_racing_mpc(
    params: VehicleParameters | None = None,
    N: int = HORIZON,
    ts: float = TS,
    steps: int = 200,
    dynamic: bool = True,
    tube_radius: float | None = 0.25,
    speed: float = SPEED,
    dtype=jnp.float32,
) -> tuple[TrackingNMPC, jnp.ndarray]:
    """Build the lap-tracking controller and its reference trajectory."""
    params = params or VehicleParameters()
    if dynamic:
        # The Pacejka lateral dynamics are STIFF at miniature scale: the yaw
        # mode's eigenvalue is ≈ (C_f l_f² + C_r l_r²)/(I_z v_x) ≈ 80 1/s at
        # 1.2 m/s, so forward Euler at ts = 0.05 (λ·ts ≈ 4 > 2) is an unstable
        # prediction model — measured 25 cm tracking error and oscillating
        # saturated steering. RK4 with 4 substeps (effective λ·ts ≈ 1) is
        # stable and cheap; the plant uses 16 substeps so prediction/plant
        # model error remains (the reference's mismatch methodology).
        ode = lambda x, u: dynamic_bicycle_ode(params, x, u)
        nx, Q, R = NX_DYNAMIC, Q_DYNAMIC, R_DYNAMIC
        pred_step = rk4_fine(ode, ts, substeps=4)
    else:
        ode = lambda x, u: kinematic_bicycle_ode(params, x, u)
        nx, Q, R = NX, Q_KINEMATIC, R_KINEMATIC
        pred_step = euler(ode, ts)
    ref = ellipse_reference(
        steps + N + 1, speed=speed, ts=ts, dynamic=dynamic, dtype=dtype
    )
    ctrl = TrackingNMPC(
        step_fn=pred_step,
        nx=nx,
        nu=2,
        N=N,
        Q=jnp.asarray(Q, dtype=dtype),
        R=jnp.asarray(R, dtype=dtype),
        QN=QN_SCALE * jnp.asarray(Q, dtype=dtype),
        u_lb=jnp.asarray([params.min_drive, -params.max_steer], dtype=dtype),
        u_ub=jnp.asarray([params.max_drive, params.max_steer], dtype=dtype),
        ref_traj=ref,
        tube_radius=tube_radius,
    )
    return ctrl, ref


def run(
    steps: int = 200,
    N: int = HORIZON,
    ts: float = TS,
    dynamic: bool = True,
    speed: float = SPEED,
    tube_radius: float | None = 0.25,
    dtype=jnp.float32,
    outdir=None,
):
    """Closed-loop lap with a prediction/plant integration mismatch (dynamic:
    4-substep-RK4 MPC vs 16-substep-RK4 plant; kinematic: Euler MPC vs RK4
    plant). Returns ``(SimResult, summary)``."""
    params = VehicleParameters()
    ctrl, ref = make_racing_mpc(
        params, N=N, ts=ts, steps=steps, dynamic=dynamic,
        tube_radius=tube_radius, speed=speed, dtype=dtype,
    )
    ode = (
        (lambda x, u: dynamic_bicycle_ode(params, x, u))
        if dynamic
        else (lambda x, u: kinematic_bicycle_ode(params, x, u))
    )
    plant = rk4_fine(ode, ts, substeps=16) if dynamic else rk4(ode, ts)
    x0 = ref[0]
    res = simulate(
        x0, plant, steps=steps, policy=ctrl.policy(),
        policy_carry=ctrl.initial_carry(dtype),
    )
    err = np.asarray(res.logs["tracking_error"])
    summary = {
        "model": "dynamic" if dynamic else "kinematic",
        "steps": steps,
        "speed": float(speed),
        "lap_time_s": float(steps * ts),
        "mean_tracking_error_m": float(err.mean()),
        "max_tracking_error_m": float(err.max()),
        "success_rate": float(np.asarray(res.logs["solver_success"]).mean()),
        "unstable": bool(res.unstable),
    }
    if outdir is not None:
        _save_plots(res, ref, steps, summary, outdir)
    return res, summary


def _save_plots(res, ref, steps, summary, outdir):
    import pathlib

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    outdir = pathlib.Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    states = np.asarray(res.states)
    refn = np.asarray(ref)
    fig, ax = plt.subplots(figsize=(7, 5))
    ax.plot(refn[:steps, 0], refn[:steps, 1], "k--", lw=1, label="reference")
    ax.plot(states[:, 0], states[:, 1], lw=1.5, label="car")
    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.legend()
    ax.set_title(
        f"{summary['model']} lap @ {summary['speed']} m/s — "
        f"mean err {summary['mean_tracking_error_m']*100:.1f} cm"
    )
    fig.savefig(outdir / "racing_track.png", dpi=120)
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(7, 3))
    ax.plot(np.asarray(res.logs["tracking_error"]) * 100.0)
    ax.set_xlabel("step")
    ax.set_ylabel("tracking error [cm]")
    fig.savefig(outdir / "racing_error.png", dpi=120)
    plt.close(fig)


def crosswind_comparison(
    steps: int = 120,
    N: int = HORIZON,
    ts: float = TS,
    speed: float = 0.35,
    wind: float = 0.004,
    dtype=jnp.float32,
) -> dict:
    """Offset-free racing demo (round 3): nominal lap tracker vs
    :class:`...solvers.offset_free_nmpc.DisturbanceCompensatedTracking`
    under a persistent lateral crosswind (kinematic tier — the compensated
    tracker's reference re-projection assumes the 4-state layout).

    Returns the steady tracking errors of both and the EKF's wind estimate.
    """
    from ..control.simulate import simulate as _simulate
    from ..models.bicycle import kinematic_bicycle_ode as _kin
    from ..solvers.nmpc_tracking import TrackingNMPC as _Nom
    from ..solvers.offset_free_nmpc import DisturbanceCompensatedTracking

    params = VehicleParameters()
    ref = ellipse_reference(
        steps + N + 1, speed=speed, ts=ts, dynamic=False, dtype=dtype
    )
    step_fn = euler(lambda x, u: _kin(params, x, u), ts)
    plant_base = rk4(lambda x, u: _kin(params, x, u), ts)
    w = jnp.asarray([0.0, -wind, 0.0, 0.0], dtype)
    plant = lambda x, u: plant_base(x, u) + w
    Q = jnp.asarray(Q_KINEMATIC, dtype)
    R = jnp.asarray(R_KINEMATIC, dtype)
    u_lb = jnp.asarray([params.min_drive, -params.max_steer], dtype)
    u_ub = jnp.asarray([params.max_drive, params.max_steer], dtype)

    nom = _Nom(step_fn, nx=NX, nu=2, N=N, Q=Q, R=R, QN=QN_SCALE * Q,
               u_lb=u_lb, u_ub=u_ub, ref_traj=ref)
    res_n = _simulate(ref[0], plant, steps=steps, policy=nom.policy(),
                      policy_carry=nom.initial_carry(dtype))
    comp = DisturbanceCompensatedTracking(
        step_fn, nx=NX, nu=2, N=N, Q=Q, R=R, QN=QN_SCALE * Q,
        u_lb=u_lb, u_ub=u_ub, ref_traj=ref, ts=ts, dtype=dtype,
    )
    res_c = _simulate(ref[0], plant, steps=steps, policy=comp.policy(),
                      policy_carry=comp.initial_carry(ref[0]))
    tail = slice(-max(10, steps // 3), None)
    return {
        "wind_per_step": float(wind),
        "nominal_steady_error_m": float(
            np.asarray(res_n.logs["tracking_error"])[tail].mean()
        ),
        "compensated_steady_error_m": float(
            np.asarray(res_c.logs["tracking_error"])[tail].mean()
        ),
        "compensated_success": float(
            np.asarray(res_c.logs["solver_success"], dtype=np.float32).mean()
        ),
        "wind_estimate": float(res_c.logs["disturbance_estimate"][-1, 1]),
    }
