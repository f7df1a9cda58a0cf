"""Slack-softened linear MPC: graceful degradation where the hard QP is infeasible.

Session 3 exists because session 2's problem goes infeasible in closed loop; the
reference hand-relaxes bounds (``session_3/problem.py:15,17``). The soft tier keeps
the QP feasible at every measured state via per-stage slacks with an exact ℓ1+ℓ2
penalty (``ops/condensed.py::soften_condensed_qp``).
"""

import pytest

pytestmark = pytest.mark.slow  # oracle-heavy / long-running (full tier)
import jax
import jax.numpy as jnp
import numpy as np

import model_predictive_control_tpu as mpc


def _controllers(N=10, **soft_kw):
    problem = mpc.session2_problem(N=N)
    hard = mpc.make_linear_mpc(problem, solver="admm", iters=400, dtype=jnp.float64)
    soft = mpc.make_linear_mpc(
        problem, solver="admm", iters=400, dtype=jnp.float64,
        soft_state=True, **soft_kw,
    )
    return problem, hard, soft


class TestSoftLinearMPC:
    def test_exact_penalty_matches_hard_when_feasible(self):
        """At a comfortably feasible state the slacks are 0 and the soft
        solution coincides with the hard one (exact ℓ1 penalty)."""
        _, hard, soft = _controllers(slack_weight=100.0, slack_linear=50.0)
        x0 = jnp.asarray([-40.0, 5.0], jnp.float64)
        u_h, sol_h = hard.solve(x0)
        u_s, sol_s = soft.solve(x0)
        assert bool(sol_h.converged) and bool(sol_s.converged)
        ns = soft.qp.n_slack
        max_slack = float(jnp.max(sol_s.x[-ns:]))
        assert max_slack < 1e-6
        np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_h), atol=1e-5)

    def test_infeasible_state_still_solves(self):
        """Beyond the braking wall (p > p_max) no hard-feasible input exists;
        the soft QP still returns a sensible full-braking command."""
        problem, hard, soft = _controllers()
        x0 = jnp.asarray([0.5, 24.0], jnp.float64)  # fast, about to overshoot
        u_s, sol_s = soft.solve(x0)
        assert bool(sol_s.converged)
        ns = soft.qp.n_slack
        assert float(jnp.max(sol_s.x[-ns:])) > 1e-3  # slack actually engaged
        # full braking on the first input
        assert abs(float(u_s[0, 0]) - problem.u_min) < 1e-6

    def test_closed_loop_recovers_and_slack_decays(self):
        problem, _, soft = _controllers(N=10)
        system = problem.system(jnp.float64)
        res = mpc.simulate(
            jnp.asarray([-0.5, 20.0], jnp.float64),  # will overshoot p_max
            system,
            steps=50,
            policy=soft.policy(),
            policy_carry=soft.initial_carry(jnp.float64),
        )
        assert bool(res.logs["solver_success"].all())
        slack = np.asarray(res.logs["max_slack"])
        assert slack[0] > 1e-3            # infeasible transient engages slack
        assert np.max(slack[-10:]) < 1e-5  # feasibility restored
        # position settles at/below the wall, velocity to 0
        assert float(res.states[-1, 0]) < problem.p_max + 1e-3
        assert abs(float(res.states[-1, 1])) < 1e-2

    def test_batched_policy_soft(self):
        problem, _, soft = _controllers(N=8)
        from model_predictive_control_tpu.control.batch_loop import simulate_batch

        B = 16
        key = jax.random.PRNGKey(0)
        x0s = jnp.stack(
            [
                jax.random.uniform(key, (B,), minval=-50.0, maxval=0.5),
                jax.random.uniform(jax.random.PRNGKey(1), (B,), minval=0.0, maxval=24.0),
            ],
            axis=1,
        ).astype(jnp.float64)
        system = problem.system(jnp.float64)
        policy = soft.batched_policy(backend="xla")
        res = simulate_batch(
            x0s, system, 20, policy, soft.initial_batch_carry(B, jnp.float64)
        )
        assert bool(jnp.all(res.logs["solver_success"]))
        assert bool(jnp.all(jnp.isfinite(res.states)))

    def test_warm_shift_layout(self):
        """The soft warm-start shift preserves shapes and stage alignment."""
        _, _, soft = _controllers(N=6)
        n, m = soft.qp.n, soft.qp.m
        x = jnp.arange(n, dtype=jnp.float64)
        y = jnp.arange(m, dtype=jnp.float64)
        xs, ys = soft._shift_warm(x, y)
        assert xs.shape == (n,) and ys.shape == (m,)
        nu, nx, N = soft.qp.nu, soft.qp.nx, soft.qp.N
        # input part shifted by nu with last block repeated
        np.testing.assert_allclose(xs[: N * nu - nu], x[nu : N * nu])
        np.testing.assert_allclose(xs[N * nu - nu : N * nu], x[N * nu - nu : N * nu])
        # slack part shifted by nx
        np.testing.assert_allclose(
            xs[N * nu : N * nu + (N - 1) * nx], x[N * nu + nx :]
        )
