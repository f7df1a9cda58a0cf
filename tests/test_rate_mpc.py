"""Rate-limited linear MPC: slew constraints + Δu smoothing.

Gates: closed loop honors |Δu| ≤ du_max at every step while still regulating;
with inactive rate bounds and zero weight the controller IS the plain MPC
(trajectory equivalence); one solve matches the float64 QP oracle on the
stacked constraint set; smoothing weight reduces total input variation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.oracle.qp_oracle import solve_qp_np


def _loop(ctrl, x0, steps, dtype=jnp.float64, u_prev=None):
    problem = mpc.session2_problem(N=ctrl.N)
    system = problem.system(dtype)
    carry = ctrl.initial_carry(u_prev=u_prev, dtype=dtype)
    return mpc.simulate(jnp.asarray(x0, dtype), system, steps, ctrl.policy(), carry)


def test_closed_loop_honors_rate_bound():
    problem = mpc.session2_problem(N=20)
    du_max = 3.0  # much tighter than the natural bang-bang jumps (~30)
    ctrl = mpc.make_rate_limited_mpc(problem, du_max=du_max, iters=400, dtype=jnp.float64)
    res = _loop(ctrl, [-60.0, 5.0], 80)
    assert bool(jnp.all(res.logs["solver_success"]))
    dus = np.asarray(res.logs["du"])
    assert np.abs(dus).max() <= du_max + 1e-5
    # still regulates (slower than unconstrained, but it gets there)
    assert float(jnp.linalg.norm(res.states[-1])) < 1.0


def test_inactive_rate_bound_recovers_plain_mpc():
    problem = mpc.session2_problem(N=12)
    loose = mpc.make_rate_limited_mpc(problem, du_max=1e4, iters=400, dtype=jnp.float64)
    res_r = _loop(loose, [-30.0, 4.0], 40)
    plain = mpc.make_linear_mpc(problem, solver="admm", iters=400, dtype=jnp.float64)
    system = problem.system(jnp.float64)
    res_p = mpc.simulate(
        jnp.asarray([-30.0, 4.0], jnp.float64), system, 40,
        plain.policy(), plain.initial_carry(jnp.float64),
    )
    assert bool(jnp.all(res_r.logs["solver_success"]))
    np.testing.assert_allclose(
        np.asarray(res_r.states), np.asarray(res_p.states), atol=1e-3
    )


@pytest.mark.slow
def test_single_solve_matches_oracle():
    problem = mpc.session2_problem(N=10)
    ctrl = mpc.make_rate_limited_mpc(
        problem, du_max=3.0, du_weight=0.5, iters=600, dtype=jnp.float64
    )
    x0 = jnp.asarray([-25.0, 6.0], jnp.float64)
    u_prev = jnp.asarray([1.0], jnp.float64)
    u_traj, sol = ctrl.solve(x0, u_prev)
    assert bool(sol.converged)
    q, l, u = ctrl.qp.qp_vectors(x0, u_prev)
    x_ref, _ = solve_qp_np(
        np.asarray(ctrl.qp.P), np.asarray(q), np.asarray(ctrl.qp.A_c),
        np.asarray(l), np.asarray(u),
    )
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=2e-4)
    # the rate bound binds in this scenario (otherwise the test is vacuous)
    du0 = float(np.abs(np.asarray(u_traj)[0] - np.asarray(u_prev)).max())
    assert du0 >= 3.0 - 1e-6 or np.abs(np.diff(np.asarray(u_traj)[:, 0])).max() >= 3.0 - 1e-4


def test_smoothing_weight_reduces_variation():
    problem = mpc.session2_problem(N=20)
    rough = mpc.make_rate_limited_mpc(problem, du_max=1e4, iters=400, dtype=jnp.float64)
    smooth = mpc.make_rate_limited_mpc(
        problem, du_max=1e4, du_weight=50.0, iters=400, dtype=jnp.float64
    )
    res_r = _loop(rough, [-40.0, 5.0], 50)
    res_s = _loop(smooth, [-40.0, 5.0], 50)
    assert bool(jnp.all(res_s.logs["solver_success"]))
    tv_r = float(jnp.sum(jnp.abs(res_r.logs["du"])))
    tv_s = float(jnp.sum(jnp.abs(res_s.logs["du"])))
    # the floor is one 0 -> full-brake -> 0 excursion; w=50 takes ~35% off
    assert tv_s < 0.75 * tv_r
    assert float(jnp.linalg.norm(res_s.states[-1])) < 2.0


@pytest.mark.slow
def test_batched_policy_matches_scalar_loop():
    """Batched rate-limited closed loop (Pallas interpret + XLA backends) vs the
    per-scenario scalar loop: success everywhere, same regulation."""
    from model_predictive_control_tpu.control.batch_loop import simulate_batch

    problem = mpc.session2_problem(N=12)
    # 400 iters: the tile-shared-rho pallas path needs a little more than the
    # per-scenario XLA path on the hardest cold scenario here
    ctrl = mpc.make_rate_limited_mpc(problem, du_max=4.0, iters=400, dtype=jnp.float64)
    system = problem.system(jnp.float64)
    x0s = jnp.asarray([[-50.0, 4.0], [-30.0, -2.0], [-60.0, 6.0]], jnp.float64)
    steps = 40

    # bound slack: the per-scenario XLA path's active-set polish lands on the
    # bound to ~1e-5; the tile-batched pallas path converges to the
    # scale-relative band (eps_abs * scale ~ 0.2 on early cold-ish steps)
    for backend, slack in (("pallas", 0.2), ("xla", 1e-5)):
        policy = ctrl.batched_policy(backend=backend, tile=4)
        carry = ctrl.initial_batch_carry(x0s.shape[0], dtype=jnp.float64)
        res = simulate_batch(x0s, system, steps, policy, carry)
        assert bool(jnp.all(res.logs["solver_success"])), backend
        assert float(jnp.abs(res.logs["du"]).max()) <= 4.0 + slack, backend
        assert float(jnp.linalg.norm(res.states[-1], axis=1).max()) < 2.0

    # scalar-loop cross-check on one scenario
    res1 = _loop(ctrl, [-50.0, 4.0], steps)
    policy = ctrl.batched_policy(backend="xla")
    carry = ctrl.initial_batch_carry(3, dtype=jnp.float64)
    res_b = simulate_batch(x0s, system, steps, policy, carry)
    np.testing.assert_allclose(
        np.asarray(res_b.states[:, 0]), np.asarray(res1.states), atol=1e-4
    )
