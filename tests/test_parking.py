"""Session-4 capability tests: single-shooting SQP parking MPC vs the SLSQP
oracle (IPOPT stand-in), obstacle avoidance, closed-loop with plant mismatch.

Scenarios mirror the reference drivers: exercise 3 open-loop (session4_sol.py:340),
the obstacle main() scenario (main.py:241-250), exercise 5 closed loop with
friction mismatch (session4_sol.py:443-465).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle-heavy / long-running (full tier)

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.models.parameters import VehicleParameters
from model_predictive_control_tpu.solvers.parking import (
    NonlinearMPC,
    Q_SOL,
    QN_SCALE_SOL,
    make_parking_ocp,
)
from model_predictive_control_tpu.oracle.parking_oracle import solve_parking_nlp
from model_predictive_control_tpu.utils.geometry import (
    cover_circle_offsets,
    pairwise_sq_distances,
    transform_circles,
)

X_OBS = jnp.asarray([0.25, 0.0, 0.0, 0.0], dtype=jnp.float64)  # main.py:247
X0_MAIN = jnp.asarray([0.3, -0.1, 0.0, 0.0], dtype=jnp.float64)  # main.py:248
X0_SOL = jnp.asarray([0.6, -0.25, 0.0, 0.0], dtype=jnp.float64)  # sol.py:350


def test_open_loop_plain_matches_oracle():
    """Exercise-3 scenario (N=50, ts=0.05, sol weights): u-traj ≤ 1e-4."""
    ocp = make_parking_ocp(
        VehicleParameters(), N=50, ts=0.05, x_obs=None,
        Q=Q_SOL, qn_scale=QN_SCALE_SOL, dtype=jnp.float64,
    )
    u_ref, info = solve_parking_nlp(ocp, X0_SOL)
    sol = mpc.sqp_solve(ocp, X0_SOL, iters=30, qp_iters=40)
    assert bool(sol.converged)
    assert np.max(np.abs(np.asarray(sol.u) - u_ref)) < 1e-4
    assert abs(float(sol.cost) - info["cost"]) < 1e-8


def test_open_loop_obstacle_matches_oracle():
    """main() scenario (N=30, ts=0.08, obstacle): the BASELINE 1e-4 gate."""
    ocp = make_parking_ocp(
        VehicleParameters(), N=30, ts=0.08, x_obs=X_OBS, dtype=jnp.float64
    )
    u_ref, info = solve_parking_nlp(ocp, X0_MAIN)
    sol = mpc.sqp_solve(ocp, X0_MAIN, iters=150, qp_iters=60, tol=2e-6)
    assert bool(sol.converged)
    assert float(sol.viol) < 1e-7
    assert np.max(np.abs(np.asarray(sol.u) - u_ref)) < 1e-4
    assert abs(float(sol.cost) - info["cost"]) < 1e-8


def test_collision_constraint_holds_along_plan():
    """Every planned stage keeps all 9 circle pairs outside (r + r_p)²."""
    params = VehicleParameters()
    N = 30
    ocp = make_parking_ocp(params, N=N, ts=0.08, x_obs=X_OBS, dtype=jnp.float64)
    sol = mpc.sqp_solve(ocp, X0_MAIN, iters=100, qp_iters=40)

    # replay the plan through the prediction model and check geometry directly
    from model_predictive_control_tpu.models.bicycle import kinematic_bicycle_ode
    from model_predictive_control_tpu.ops.integrators import euler

    step = euler(lambda x, u: kinematic_bicycle_ode(params, x, u), 0.08)
    xs = mpc.rollout(X0_MAIN, step, sol.u.reshape(N, 2))
    offsets, r = cover_circle_offsets(params.length, params.width, 3)
    obs = transform_circles(X_OBS, offsets.astype(jnp.float64))
    for x in xs[1:]:
        veh = transform_circles(x, offsets.astype(jnp.float64))
        d2 = pairwise_sq_distances(veh, obs)
        assert float(d2.min()) >= (2 * r) ** 2 - 1e-7


def test_closed_loop_golden_match_obstacle():
    """Closed-loop u-sequence (solve → apply u0 → accurate plant) vs an oracle
    loop that re-solves with SLSQP each step. 12 steps keeps the oracle fast."""
    params = VehicleParameters()
    N, ts, steps = 30, 0.08, 12
    ocp = make_parking_ocp(params, N=N, ts=ts, x_obs=X_OBS, dtype=jnp.float64)
    ctrl = NonlinearMPC(ocp, sqp_iters=100, qp_iters=40)

    ode = mpc.KinematicBicycle(params)
    plant = mpc.rk4_fine(ode, ts, substeps=32)  # the odeint-grade tier

    res = mpc.simulate(
        X0_MAIN, plant, steps=steps, policy=ctrl.policy(),
        policy_carry=ctrl.initial_carry(jnp.float64), instability_norm=1e9,
    )

    # oracle closed loop
    x = np.asarray(X0_MAIN)
    u_warm = None
    u_oracle = []
    for _ in range(steps):
        u_flat, _ = solve_parking_nlp(ocp, x, u_init=u_warm)
        u_oracle.append(u_flat[:2])
        x = np.asarray(plant(jnp.asarray(x), jnp.asarray(u_flat[:2])))
        u_warm = np.concatenate([u_flat[2:], u_flat[-2:]])
    u_oracle = np.stack(u_oracle)

    err = np.max(np.abs(np.asarray(res.inputs) - u_oracle))
    assert err < 1e-4, f"closed-loop u err {err:.2e}"
    assert bool(np.all(np.asarray(res.logs["solver_success"])))


def test_closed_loop_mismatch_parks_the_car():
    """Exercise-5 robustness: prediction model Euler, plant = accurate integration
    with friction × 0.8 (session4_sol.py:461-465). The car must still park."""
    params = VehicleParameters()
    N, ts, steps = 50, 0.05, 60
    ocp = make_parking_ocp(
        params, N=N, ts=ts, x_obs=None, Q=Q_SOL, qn_scale=QN_SCALE_SOL,
        dtype=jnp.float64,
    )
    ctrl = NonlinearMPC(ocp, sqp_iters=40, qp_iters=40)

    from model_predictive_control_tpu.utils.pytree import replace

    params_true = replace(params, friction=params.friction * 0.8)
    plant = mpc.rk4_fine(mpc.KinematicBicycle(params_true), ts, substeps=16)

    res = mpc.simulate(
        X0_SOL, plant, steps=steps, policy=ctrl.policy(),
        policy_carry=ctrl.initial_carry(jnp.float64), instability_norm=1e9,
    )
    final = np.asarray(res.states[-1])
    assert np.linalg.norm(final[:2]) < 5e-2  # parked near origin
    assert abs(final[3]) < 5e-2  # stopped
    # state bounds respected by the *controller's plan*; the true plant may
    # deviate slightly, but positions must stay in the arena
    states = np.asarray(res.states)
    assert states[:, 0].min() > params.min_pos_x - 0.1
    assert states[:, 0].max() < params.max_pos_x + 0.1


def test_sqp_vmaps_over_scenarios():
    """Batch axis: vmap sqp_solve over initial states (the pod-scale pattern)."""
    ocp = make_parking_ocp(
        VehicleParameters(), N=20, ts=0.08, x_obs=None, dtype=jnp.float64
    )
    x0s = jnp.asarray(
        np.array([[0.3, -0.1, 0, 0], [0.5, 0.2, 0.3, 0], [-0.4, 0.15, -0.2, 0.1]]),
        dtype=jnp.float64,
    )
    sols = jax.jit(jax.vmap(lambda x: mpc.sqp_solve(ocp, x, iters=40, qp_iters=40).u))(
        x0s
    )
    single = mpc.sqp_solve(ocp, x0s[1], iters=40, qp_iters=40)
    np.testing.assert_allclose(np.asarray(sols[1]), np.asarray(single.u), atol=1e-10)


def test_rk4_prediction_variant_matches_native_oracle():
    """template.py:141 builds its OCP on an RK4 prediction model: the in-repo
    builder's ``integrator="rk4"`` variant must land on the same KKT point as
    the independent C++ dual-number-AD oracle (and differ from Euler)."""
    from model_predictive_control_tpu.oracle.native_nlp import (
        solve_parking_native,
    )
    from model_predictive_control_tpu.solvers.parking import QN_SCALE_TEMPLATE

    params = VehicleParameters()
    N, ts = 8, 0.05
    ocp = make_parking_ocp(
        params, N=N, ts=ts, x_obs=None, Q=Q_SOL, qn_scale=QN_SCALE_TEMPLATE,
        dtype=jnp.float64, integrator="rk4",
    )
    u_sci, info_sci = solve_parking_nlp(ocp, X0_MAIN)
    u_nat, info_nat = solve_parking_native(
        params, N, ts, np.asarray(X0_MAIN), Q=Q_SOL,
        qn_scale=QN_SCALE_TEMPLATE, integrator="rk4", tol=1e-7,
    )
    assert info_nat["converged"]
    assert float(np.max(np.abs(np.asarray(u_sci) - u_nat))) < 1e-4

    ocp_eul = make_parking_ocp(
        params, N=N, ts=ts, x_obs=None, Q=Q_SOL, qn_scale=QN_SCALE_TEMPLATE,
        dtype=jnp.float64, integrator="euler",
    )
    u_eul, _ = solve_parking_nlp(ocp_eul, X0_MAIN)
    assert float(np.max(np.abs(np.asarray(u_sci) - np.asarray(u_eul)))) > 1e-6


def test_rk4_prediction_ilqr_matches_sqp():
    """The stagewise (AL-iLQR) form of the RK4 variant reaches the same
    unconstrained-interior solution as the condensed SQP form."""
    from model_predictive_control_tpu.solvers.parking import (
        QN_SCALE_TEMPLATE,
        make_parking_ilqr,
    )

    params = VehicleParameters()
    N, ts = 8, 0.05
    ocp = make_parking_ocp(
        params, N=N, ts=ts, x_obs=None, Q=Q_SOL, qn_scale=QN_SCALE_TEMPLATE,
        dtype=jnp.float64, integrator="rk4",
    )
    sol_sqp = mpc.sqp_solve(ocp, X0_MAIN, iters=40, qp_iters=40)
    prob, cons, nc = make_parking_ilqr(
        params, N=N, ts=ts, x_obs=None, Q=Q_SOL, qn_scale=QN_SCALE_TEMPLATE,
        dtype=jnp.float64, integrator="rk4",
    )
    sol_ilqr = mpc.al_ilqr_solve(
        prob, cons, nc, X0_MAIN, outer_iters=8, inner_iters=30
    )
    np.testing.assert_allclose(
        np.asarray(sol_ilqr.us).reshape(-1), np.asarray(sol_sqp.u), atol=2e-4
    )
