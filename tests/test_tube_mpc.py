"""Rigid-tube robust MPC: invariance certificates + closed-loop robustness.

The robust claim is checked the way the theory states it, not by box-invariance
of the outer approximation (which the theory does not promise): the *error
process* e⁺ = (A+BK) e + w must stay inside the certified supports for every
admissible disturbance sequence, and the closed loop under the tube controller
must respect the ORIGINAL constraint boxes under adversarial disturbances where
the nominal (non-robust) controller violates them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.solvers.tube import (
    _np_dare,
    make_tube_mpc,
    mrpi_box_margins,
)

W_HALF = np.array([0.0, 0.45])  # disturbance enters the velocity row (like u)


def _gains(problem):
    Ts = problem.Ts
    A = np.array([[1.0, Ts], [0.0, 1.0]])
    B = np.array([[0.0], [Ts]])
    Q = np.diag(np.asarray(problem.Q, float))
    R = np.diag(np.asarray(problem.R, float))
    P = _np_dare(A, B, Q, R)
    BtP = B.T @ P
    K = -np.linalg.solve(R + BtP @ B, BtP @ A)
    return A, B, K


@pytest.mark.smoke
def test_error_process_stays_inside_certified_supports():
    problem = mpc.session2_problem(N=8)
    A, B, K = _gains(problem)
    z_margin, u_margin, s, alpha = mrpi_box_margins(A + B @ K, W_HALF, K)
    assert 0.0 < alpha <= 0.5 and s >= 1

    # worst-case-ish disturbances: random corner sequences of the box W
    rng = np.random.default_rng(0)
    A_K = A + B @ K
    for _ in range(20):
        signs = rng.choice([-1.0, 1.0], size=(300, 2))
        e = np.zeros(2)
        for w in signs * W_HALF:
            e = A_K @ e + w
            assert np.all(np.abs(e) <= z_margin + 1e-9)
            assert np.all(np.abs(K @ e) <= u_margin + 1e-9)


@pytest.mark.smoke
def test_margins_scale_linearly_and_zero_disturbance_is_free():
    problem = mpc.session2_problem(N=8)
    A, B, K = _gains(problem)
    z1, u1, _, _ = mrpi_box_margins(A + B @ K, W_HALF, K)
    z2, u2, _, _ = mrpi_box_margins(A + B @ K, 2.0 * W_HALF, K)
    np.testing.assert_allclose(z2, 2.0 * z1, rtol=1e-9)
    np.testing.assert_allclose(u2, 2.0 * u1, rtol=1e-9)
    z0, u0, s0, _ = mrpi_box_margins(A + B @ K, np.zeros(2), K)
    assert s0 == 0 and np.all(z0 == 0) and np.all(u0 == 0)


def test_tube_too_large_raises():
    problem = mpc.session2_problem(N=8)
    with pytest.raises(ValueError, match="tube does not fit"):
        make_tube_mpc(problem, np.array([0.0, 40.0]))


class TestClosedLoop:
    """Session-2 braking wall (p ≤ 1) under adversarial velocity disturbance."""

    STEPS = 60
    X0 = jnp.array([-60.0, 18.0])

    def _run(self, ctrl_policy, carry, disturbances, dtype=jnp.float64):
        problem = mpc.session2_problem(N=8)
        sys = problem.system(dtype)
        return mpc.simulate(
            self.X0.astype(dtype),
            sys,
            steps=self.STEPS,
            policy=ctrl_policy,
            policy_carry=carry,
            disturbances=disturbances,
        )

    def _adversarial_w(self, dtype=jnp.float64):
        # push velocity forward every step — maximally drives p past the wall
        w = np.zeros((self.STEPS, 2))
        w[:, 1] = W_HALF[1]
        return jnp.asarray(w, dtype=dtype)

    def test_tube_mpc_respects_original_constraints_under_disturbance(self):
        problem = mpc.session2_problem(N=8)
        tube = make_tube_mpc(problem, W_HALF, iters=400, dtype=jnp.float64)
        res = self._run(
            tube.policy(),
            tube.initial_carry(self.X0.astype(jnp.float64)),
            self._adversarial_w(),
        )
        assert bool(res.logs["solver_success"].all())
        assert bool(res.logs["tube_ok"].all())
        tol = 1e-6
        assert float(res.states[:, 0].max()) <= problem.p_max + tol
        assert float(res.states[:, 0].min()) >= problem.p_min - tol
        assert float(res.states[:, 1].max()) <= problem.v_max + tol
        assert float(res.states[:, 1].min()) >= problem.v_min - tol
        assert float(jnp.abs(res.inputs).max()) <= max(
            -problem.u_min, problem.u_max
        ) + tol
        # and it still does its job: comes to rest near the wall
        assert abs(float(res.states[-1, 1])) < 1.0

    def test_nominal_mpc_violates_where_tube_does_not(self):
        problem = mpc.session2_problem(N=8)
        nominal = mpc.make_linear_mpc(
            problem, iters=400, dtype=jnp.float64, terminal="dare"
        )
        res = self._run(
            nominal.policy(),
            nominal.initial_carry(jnp.float64),
            self._adversarial_w(),
        )
        # the non-robust controller rides p ≤ 1 exactly and the disturbance
        # pushes it over: this is the violation the tube design removes
        assert float(res.states[:, 0].max()) > problem.p_max + 1e-3

    def test_zero_disturbance_reduces_to_nominal_behavior(self):
        problem = mpc.session2_problem(N=8)
        tube = make_tube_mpc(problem, W_HALF, iters=400, dtype=jnp.float64)
        res = self._run(
            tube.policy(),
            tube.initial_carry(self.X0.astype(jnp.float64)),
            None,
        )
        # without disturbance the error stays 0 and u == v (pure nominal MPC)
        err = np.asarray(res.logs["error"])
        assert np.max(np.abs(err)) < 1e-8
        np.testing.assert_allclose(
            np.asarray(res.inputs),
            np.asarray(res.logs["input_prediction"][:, 0]),
            atol=1e-8,
        )

    def test_batched_disturbance_realizations_vmap(self):
        problem = mpc.session2_problem(N=8)
        tube = make_tube_mpc(problem, W_HALF, iters=300, dtype=jnp.float64)
        rng = np.random.default_rng(3)
        ws = jnp.asarray(
            rng.choice([-1.0, 1.0], size=(8, self.STEPS, 2)) * W_HALF,
            dtype=jnp.float64,
        )
        sys = problem.system(jnp.float64)
        x0 = self.X0.astype(jnp.float64)

        def run_one(w):
            return mpc.simulate(
                x0, sys, steps=self.STEPS, policy=tube.policy(),
                policy_carry=tube.initial_carry(x0), disturbances=w,
            )

        res = jax.vmap(run_one)(ws)
        assert res.states.shape == (8, self.STEPS + 1, 2)
        assert bool(res.logs["tube_ok"].all())
        assert float(res.states[:, :, 0].max()) <= problem.p_max + 1e-6
