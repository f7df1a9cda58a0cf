"""Chance-constrained stochastic MPC.

Gates the claim the controller actually makes: under Gaussian process noise,
per-stage/per-row constraint violations happen with frequency ≤ ε (checked by
Monte Carlo over many noise realizations on the braking-wall scenario, where
the nominal controller's violation rate is ~50% by construction — it rides the
constraint, so any positive noise pushes it over).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.solvers.stochastic import (
    gaussian_stage_margins,
    make_stochastic_mpc,
)
from model_predictive_control_tpu.solvers.tube import _np_dare

SIGMA_V = 0.12  # process noise std on the velocity row
SIGMA_W = np.diag([0.0, SIGMA_V**2])


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
class TestMargins:
    def test_margins_ramp_and_saturate(self):
        problem = mpc.session2_problem(N=25)
        A, B, K = _gains(problem)
        sm, im, beta = gaussian_stage_margins(A, B, K, SIGMA_W, 25, eps=0.05)
        assert beta == pytest.approx(1.6449, abs=1e-3)  # Φ⁻¹(0.95)
        # stage-0 input keeps full authority (state measured exactly)
        assert np.all(im[0] == 0.0) and np.all(im[1] > 0.0)
        # margins are monotone nondecreasing and saturate near the end
        assert np.all(np.diff(sm, axis=0) >= -1e-12)
        assert np.all(np.diff(im, axis=0) >= -1e-12)
        assert np.allclose(sm[-1], sm[-2], rtol=1e-3)
        # first-stage state margin is exactly β·sqrt(diag Σ_w)
        np.testing.assert_allclose(
            sm[0], beta * np.sqrt(np.diag(SIGMA_W)), rtol=1e-12
        )

    def test_smaller_eps_means_larger_margins(self):
        problem = mpc.session2_problem(N=10)
        A, B, K = _gains(problem)
        sm5, _, _ = gaussian_stage_margins(A, B, K, SIGMA_W, 10, eps=0.05)
        sm1, _, _ = gaussian_stage_margins(A, B, K, SIGMA_W, 10, eps=0.01)
        assert np.all(sm1[:, 1] > sm5[:, 1])

    def test_eps_validation_and_box_emptying(self):
        problem = mpc.session2_problem(N=10)
        with pytest.raises(ValueError, match="eps"):
            make_stochastic_mpc(problem, SIGMA_W, eps=0.7)
        with pytest.raises(ValueError, match="empties"):
            make_stochastic_mpc(problem, np.diag([0.0, 900.0]), eps=0.01)


class TestMonteCarlo:
    """Cruise phase of the session-2 scenario: starting far from the origin
    (p = −100) the optimal controller accelerates to the speed limit and RIDES
    ``v = v_max`` — exactly the regime where Gaussian noise makes the nominal
    controller violate ~50% of the time and the chance constraint must cap the
    conditional violation rate at ε."""

    STEPS = 30
    BATCH = 256
    X0 = jnp.array([-100.0, 20.0], jnp.float64)

    def _run_batch(self, ctrl, key):
        problem = mpc.session2_problem(N=8)
        sys = problem.system(jnp.float64)
        Lw = jnp.asarray(np.sqrt(SIGMA_W), jnp.float64)
        ws = jax.random.normal(
            key, (self.BATCH, self.STEPS, 2), jnp.float64
        ) @ Lw.T

        def run_one(w):
            return mpc.simulate(
                self.X0, sys, steps=self.STEPS, policy=ctrl.policy(),
                policy_carry=ctrl.initial_carry(jnp.float64),
                disturbances=w,
            )

        return jax.vmap(run_one)(ws)

    def _rates(self, res, problem):
        v = np.asarray(res.states[:, 1:, 1])
        viol = v > problem.v_max
        # conditional rate: only steps whose PRE-noise plan could have been
        # riding the limit (v within one noise std + margin of it)
        near = v > problem.v_max - 3.0 * SIGMA_V
        return viol.sum() / max(near.sum(), 1), viol

    @pytest.mark.slow
    def test_conditional_chance_constraint_holds_empirically(self):
        problem = mpc.session2_problem(N=8)
        eps = 0.1
        ctrl = make_stochastic_mpc(
            problem, SIGMA_W, eps=eps, iters=300, dtype=jnp.float64
        )
        res = self._run_batch(ctrl, jax.random.PRNGKey(0))
        assert bool(res.logs["solver_success"].all())
        rate, viol = self._rates(res, problem)
        assert rate <= eps + 0.03, f"violation rate {rate:.3f} > eps {eps}"
        # and the constraint was genuinely exercised (cruise reached the
        # tightened limit region) — otherwise the gate is vacuous
        v = np.asarray(res.states[:, :, 1])
        assert (v > problem.v_max - 1.0).mean() > 0.05

    @pytest.mark.slow
    def test_nominal_controller_violates_far_more(self):
        problem = mpc.session2_problem(N=8)
        eps = 0.1
        nominal = mpc.make_linear_mpc(
            problem, iters=300, dtype=jnp.float64, terminal="dare"
        )
        res_n = self._run_batch(nominal, jax.random.PRNGKey(0))
        rate_n, viol_n = self._rates(res_n, problem)
        # riding the hard limit under zero-mean noise → ~half the near-limit
        # steps violate
        assert rate_n > 0.3

        ctrl = make_stochastic_mpc(
            problem, SIGMA_W, eps=eps, iters=300, dtype=jnp.float64
        )
        res_s = self._run_batch(ctrl, jax.random.PRNGKey(0))
        rate_s, viol_s = self._rates(res_s, problem)
        assert viol_s.mean() < viol_n.mean() / 3.0


def test_batched_xla_path_matches_scalar_path():
    """The tightened QP rides the batch machinery unchanged: the batched
    (vmapped XLA) policy must produce the scalar policy's inputs exactly."""
    problem = mpc.session2_problem(N=8)
    ctrl = make_stochastic_mpc(
        problem, SIGMA_W, eps=0.1, iters=200, dtype=jnp.float64
    )
    x0s = jnp.asarray(
        [[-100.0, 20.0], [-30.0, 5.0], [-5.0, -2.0], [0.5, 0.0]], jnp.float64
    )
    bp = ctrl.batched_policy(backend="xla")
    u_b, _, aux_b = bp(x0s, 0, ctrl.inner.initial_batch_carry(4, jnp.float64))
    for i in range(4):
        u_traj, _ = ctrl.inner.solve(x0s[i])
        np.testing.assert_allclose(
            np.asarray(u_b[i]), np.asarray(u_traj[0]), atol=1e-10
        )
    assert bool(aux_b["solver_success"].all())
