"""iLQR / AL-iLQR solver family (solvers/ilqr.py) against LQR and NLP oracles."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.oracle.parking_oracle import solve_parking_nlp
from model_predictive_control_tpu.solvers.parking import (
    Q_SOL,
    QN_SCALE_SOL,
    make_parking_ilqr,
    make_parking_ocp,
)

X0 = jnp.asarray([0.3, -0.1, 0.0, 0.0], jnp.float64)
X_OBS = jnp.asarray([0.25, 0.0, 0.0, 0.0], jnp.float64)


def _lqr_problem(N):
    A = jnp.asarray([[1.0, 0.5], [0.0, 1.0]], jnp.float64)
    B = jnp.asarray([[0.0], [0.5]], jnp.float64)
    Q = jnp.diag(jnp.asarray([10.0, 1.0]))
    R = jnp.asarray([[0.01]])
    prob = mpc.ILQRProblem(
        dynamics=lambda x, u, t: A @ x + B @ u,
        stage_cost=lambda x, u, t: x @ (Q @ x) + u @ (R @ u),
        terminal_cost=lambda x: x @ (Q @ x),
        N=N,
        nx=2,
        nu=1,
    )
    return prob, A, B, Q, R


class TestILQR:
    @pytest.mark.smoke
    def test_matches_lqr_on_linear_quadratic(self):
        """On an LQ problem iLQR must reproduce the Riccati solution exactly
        (the backward pass IS the Riccati recursion there)."""
        N = 12
        prob, A, B, Q, R = _lqr_problem(N)
        x0 = jnp.asarray([-3.0, 2.0], jnp.float64)
        sol = mpc.ilqr_solve(prob, x0, iters=10)
        assert bool(sol.converged)
        _, K = mpc.riccati_recursion(A, B, Q, R, Q, N)
        x, us_lqr = x0, []
        for k in range(N):
            u = K[k] @ x
            us_lqr.append(u)
            x = A @ x + B @ u
        np.testing.assert_allclose(sol.us, jnp.stack(us_lqr), atol=1e-7)

    def test_jit_and_vmap(self):
        prob, *_ = _lqr_problem(8)
        x0s = jnp.asarray([[-3.0, 2.0], [1.0, -1.0], [0.5, 0.0]], jnp.float64)
        f = jax.jit(jax.vmap(lambda x0: mpc.ilqr_solve(prob, x0, iters=8).us))
        us = f(x0s)
        assert us.shape == (3, 8, 1)
        assert bool(jnp.all(jnp.isfinite(us)))


class TestALILQR:
    def test_parking_sol_variant_matches_oracle(self):
        p = mpc.VehicleParameters()
        N, ts = 10, 0.05
        prob, cons, nc = make_parking_ilqr(
            p, N, ts, Q=Q_SOL, qn_scale=QN_SCALE_SOL, dtype=jnp.float64
        )
        sol = mpc.al_ilqr_solve(prob, cons, nc, X0, outer_iters=10, inner_iters=30)
        assert bool(sol.converged)
        assert float(sol.viol) < 1e-6
        ocp = make_parking_ocp(
            p, N, ts, x_obs=None, Q=Q_SOL, qn_scale=QN_SCALE_SOL, dtype=jnp.float64
        )
        u_sci, info = solve_parking_nlp(ocp, np.asarray(X0))
        assert abs(float(sol.cost) - info["cost"]) < 1e-8
        # ≤1e-4 u-trajectory gate (BASELINE north star)
        assert float(jnp.max(jnp.abs(sol.us.reshape(-1) - jnp.asarray(u_sci)))) < 1e-4

    def test_parking_obstacle_matches_oracle(self):
        """Covering-circle clearances via augmented Lagrangian — third
        independent path (after JAX SQP and native C++ SQP) to the same KKT
        point as scipy on the obstacle OCP."""
        p = mpc.VehicleParameters()
        N, ts = 12, 0.08
        prob, cons, nc = make_parking_ilqr(p, N, ts, x_obs=X_OBS, dtype=jnp.float64)
        sol = mpc.al_ilqr_solve(prob, cons, nc, X0, outer_iters=12, inner_iters=40)
        assert bool(sol.converged)
        assert float(sol.viol) < 1e-6
        ocp = make_parking_ocp(p, N, ts, x_obs=X_OBS, dtype=jnp.float64)
        u_sci, info = solve_parking_nlp(ocp, np.asarray(X0))
        assert abs(float(sol.cost) - info["cost"]) < 1e-6
        assert float(jnp.max(jnp.abs(sol.us.reshape(-1) - jnp.asarray(u_sci)))) < 1e-4

    def test_constraint_rows_feasible_on_solution(self):
        p = mpc.VehicleParameters()
        prob, cons, nc = make_parking_ilqr(p, 8, 0.08, x_obs=X_OBS, dtype=jnp.float64)
        sol = mpc.al_ilqr_solve(prob, cons, nc, X0, outer_iters=10, inner_iters=30)
        ts = jnp.arange(8)
        cs = jax.vmap(cons)(sol.xs[:-1], sol.us, ts)
        assert float(jnp.max(cs)) < 1e-6  # every c ≤ 0 row holds


class TestILQRMPC:
    def test_closed_loop_parks_the_car(self):
        """Receding-horizon AL-iLQR drives the session-4 car to the origin
        under the accurate plant (exercise-5 shape, session4_sol.py:443-488)."""
        from model_predictive_control_tpu.models.bicycle import KinematicBicycle
        from model_predictive_control_tpu.ops.integrators import rk4_fine
        from model_predictive_control_tpu.solvers.parking import ILQRMPC

        p = mpc.VehicleParameters()
        prob, cons, nc = make_parking_ilqr(p, 10, 0.08, x_obs=X_OBS, dtype=jnp.float64)
        ctrl = ILQRMPC(prob, cons, nc, outer_iters=8, inner_iters=25)
        plant = rk4_fine(KinematicBicycle(p), 0.08)
        res = mpc.simulate(
            X0, plant, steps=25, policy=ctrl.policy(),
            policy_carry=ctrl.initial_carry(jnp.float64),
        )
        assert bool(jnp.all(jnp.isfinite(res.states)))
        assert float(jnp.mean(res.logs["solver_success"].astype(jnp.float64))) > 0.8
        start = float(jnp.linalg.norm(res.states[0, :2]))
        end = float(jnp.linalg.norm(res.states[-1, :2]))
        assert end < 0.4 * start
