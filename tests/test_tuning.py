"""Gradient-based MPC weight tuning (differentiable closed loop).

The loss is the TRUE closed-loop cost of a plant driven by an MPC with
internal weights theta; gradients flow through qp_setup + the implicit ADMM
solve + the rollout scan. Gates: gradient vs central finite differences, and
a few Adam updates must strictly reduce the true cost when the controller's
weights start far from the true objective's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import model_predictive_control_tpu as mpc

pytestmark = pytest.mark.slow  # dense KKT solves per step per scenario


def _setup(N=6, steps=8, B=3):
    # near-origin regulation regime: far-field starts are bang-bang constraint-
    # dominated, where the weights barely shape the trajectory (measured: 0.3%
    # tunable cost); near the origin the weighting is what matters.
    problem = mpc.session2_problem(N=N)
    key = jax.random.PRNGKey(3)
    kp, kv = jax.random.split(key)
    x0s = jnp.stack(
        [
            jax.random.uniform(kp, (B,), minval=-10.0, maxval=-2.0),
            jax.random.uniform(kv, (B,), minval=-2.0, maxval=5.0),
        ],
        axis=1,
    )
    # true objective: comfort-heavy (input changes are expensive, velocity
    # matters more than the default controller assumes)
    true_Q = jnp.diag(jnp.asarray([2.0, 6.0]))
    true_R = jnp.asarray([[1.5]])
    return problem, x0s, true_Q, true_R, steps


def test_grad_matches_finite_differences():
    problem, x0s, true_Q, true_R, steps = _setup()
    loss = mpc.make_closed_loop_cost(
        problem, x0s, steps, true_Q, true_R, iters=400, dtype=jnp.float64
    )
    theta = jnp.log(jnp.asarray([4.0, 2.0, 0.1], dtype=jnp.float64))
    g = jax.grad(loss)(theta)
    eps = 1e-5
    for i in range(theta.size):
        d = jnp.zeros_like(theta).at[i].set(eps)
        fd = (float(loss(theta + d)) - float(loss(theta - d))) / (2 * eps)
        np.testing.assert_allclose(float(g[i]), fd, rtol=5e-3, atol=1e-6)


def test_tuning_reduces_true_cost():
    problem, x0s, true_Q, true_R, steps = _setup()
    # start from the session-2 defaults: position-heavy, near-free inputs —
    # badly matched to the comfort-heavy true objective
    res = mpc.tune_mpc_weights(
        problem, x0s, steps * 2, true_Q, true_R,
        updates=12, learning_rate=0.3, iters=400, dtype=jnp.float64,
    )
    losses = np.asarray(res.losses)
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.7 * losses[0], losses
    # tuned weights moved toward the true objective's shape: R must grow
    # (inputs are 150x more expensive under the true cost than the default)
    assert float(res.R[0, 0]) > float(jnp.asarray(problem.R)[0])
