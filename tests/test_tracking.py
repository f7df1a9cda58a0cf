"""Reference-tracking MPC: baked constant reference and preview tracking.

BASELINE config 3 is "session_3 tracking MPC: reference-tracking QP with
terminal cost/set, warm-started solves". The baked constant reference
(``make_linear_mpc(x_ref=...)``) and the preview form
(``LinearMPC.tracking_policy`` — a receding reference window sliced per step)
must agree when the reference is constant, and the preview form must
anticipate a moving reference.
"""

import jax
import jax.numpy as jnp
import numpy as np

import model_predictive_control_tpu as mpc


def _ctrl(problem, dtype=jnp.float64, **kw):
    return mpc.make_linear_mpc(
        problem, solver="pdip", iters=40, dtype=dtype, **kw
    )


def test_ref_linear_term_matches_baked_constant():
    problem = mpc.session3_problem(N=10)
    x_ref = jnp.asarray([-30.0, 0.0], jnp.float64)
    baked = _ctrl(problem, x_ref=x_ref)
    plain = _ctrl(problem)
    window = jnp.tile(x_ref[None], (10, 1))
    np.testing.assert_allclose(
        np.asarray(plain.qp.ref_linear_term(window)),
        np.asarray(baked.qp.q_const),
        rtol=1e-12,
    )


def test_preview_constant_ref_equals_baked_closed_loop():
    problem = mpc.session3_problem(N=10)
    x_ref = jnp.asarray([-30.0, 0.0], jnp.float64)
    system = problem.system(jnp.float64)
    x0 = jnp.asarray([-80.0, 10.0], jnp.float64)
    steps = 30

    baked = _ctrl(problem, x_ref=x_ref)
    res_b = mpc.simulate(
        x0, system, steps=steps,
        policy=baked.policy(), policy_carry=baked.initial_carry(jnp.float64),
    )
    plain = _ctrl(problem)
    ref_traj = jnp.tile(x_ref[None], (steps + 10, 1))
    res_p = mpc.simulate(
        x0, system, steps=steps,
        policy=plain.tracking_policy(ref_traj),
        policy_carry=plain.initial_carry(jnp.float64),
    )
    assert bool(jnp.all(res_b.logs["solver_success"]))
    assert bool(jnp.all(res_p.logs["solver_success"]))
    np.testing.assert_allclose(
        np.asarray(res_p.states), np.asarray(res_b.states), atol=1e-8
    )


def test_preview_tracks_moving_reference():
    """A position ramp (constant-velocity reference): preview tracking locks on
    with small steady-state error and anticipates the ramp's end."""
    N, steps = 12, 120  # the 60 m ramp at 2 m/s spans 100 steps of Ts=0.3
    problem = mpc.session3_problem(N=N)
    system = problem.system(jnp.float64)
    Ts = problem.Ts

    # ramp from -90 to -30 at 2 m/s, then hold
    v_ref = 2.0
    t = np.arange(steps + N + 1) * Ts
    p = np.minimum(-90.0 + v_ref * t, -30.0)
    v = np.where(p < -30.0, v_ref, 0.0)
    ref_traj = jnp.asarray(np.stack([p, v], axis=1)[1:], jnp.float64)

    ctrl = _ctrl(problem)
    x0 = jnp.asarray([-90.0, v_ref], jnp.float64)
    res = mpc.simulate(
        x0, system, steps=steps,
        policy=ctrl.tracking_policy(ref_traj),
        policy_carry=ctrl.initial_carry(jnp.float64),
    )
    assert bool(jnp.all(res.logs["solver_success"]))
    states = np.asarray(res.states)
    refs = np.asarray(res.logs["ref"])
    # lock-on: position error < 0.3 m over the whole ramp after a short
    # transient, and the hold point is reached exactly
    # states[t+1] is the outcome of step t, whose stage-1 reference is refs[t]
    err = np.abs(states[1:][5:, 0] - refs[5:, 0])
    assert float(err.max()) < 0.3
    np.testing.assert_allclose(states[-1], [-30.0, 0.0], atol=1e-3)


def test_preview_tracking_with_soft_constraints():
    """Soft (slack) QP + preview tracking compose: q_extra lands on the ū block
    only, slacks stay at zero on a feasible tracking task."""
    N, steps = 10, 25
    problem = mpc.session3_problem(N=N)
    system = problem.system(jnp.float64)
    ctrl = _ctrl(problem, soft_state=True)
    ref_traj = jnp.tile(jnp.asarray([[-40.0, 0.0]], jnp.float64), (steps + N, 1))
    res = mpc.simulate(
        jnp.asarray([-60.0, 5.0], jnp.float64), system, steps=steps,
        policy=ctrl.tracking_policy(ref_traj),
        policy_carry=ctrl.initial_carry(jnp.float64),
    )
    assert bool(jnp.all(res.logs["solver_success"]))
    assert float(np.abs(np.asarray(res.states)[-1][0] + 40.0)) < 0.5
    assert float(np.max(np.asarray(res.logs["max_slack"]))) < 1e-6
