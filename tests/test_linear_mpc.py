"""Sessions-2/3 capability tests: condensed QP construction, receding-horizon
closed loop with warm starts, golden u-trajectory match vs the float64 oracle
(the BASELINE 1e-4 gate), and constraint satisfaction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.oracle.mpc_oracle import (
    closed_loop_mpc_np,
    condensed_qp_np,
    prediction_matrices_np,
)

X0 = np.array([-100.0, 20.0])  # canonical braking scenario: far out, fast


def problem_dict(p: mpc.Problem, QN=None):
    sys = p.system(jnp.float64)
    Q = np.diag(p.Q)
    return {
        "A": np.asarray(sys.A),
        "B": np.asarray(sys.B),
        "Q": Q,
        "R": np.diag(p.R),
        "QN": Q if QN is None else QN,
        "N": p.N,
        "u_min": np.array([p.u_min]),
        "u_max": np.array([p.u_max]),
        "x_min": np.array([p.p_min, p.v_min]),
        "x_max": np.array([p.p_max, p.v_max]),
    }


@pytest.mark.smoke
def test_prediction_matrices_match_numpy():
    p = mpc.session2_problem(N=7)
    sys = p.system(jnp.float64)
    Phi, Gamma = mpc.prediction_matrices(sys.A, sys.B, 7)
    Phi_np, Gamma_np = prediction_matrices_np(sys.A, sys.B, 7)
    np.testing.assert_allclose(Phi, Phi_np, atol=1e-13)
    np.testing.assert_allclose(Gamma, Gamma_np, atol=1e-13)


@pytest.mark.smoke
def test_condensed_qp_matches_numpy():
    p = mpc.session2_problem(N=6)
    sys = p.system(jnp.float64)
    Q = jnp.asarray(np.diag(p.Q), dtype=jnp.float64)
    R = jnp.asarray(np.diag(p.R), dtype=jnp.float64)
    qp = mpc.build_condensed_qp(
        sys.A, sys.B, Q, R, Q, 6,
        u_min=jnp.asarray([p.u_min]), u_max=jnp.asarray([p.u_max]),
        x_min=jnp.asarray([p.p_min, p.v_min]), x_max=jnp.asarray([p.p_max, p.v_max]),
    )
    P_np, q_x0_np, q_const_np, Phi_np, Gamma_np = condensed_qp_np(
        sys.A, sys.B, np.diag(p.Q), np.diag(p.R), np.diag(p.Q), 6
    )
    np.testing.assert_allclose(qp.P, P_np, atol=1e-10)
    np.testing.assert_allclose(qp.q_x0, q_x0_np, atol=1e-10)
    x0 = jnp.asarray(X0)
    q, l, u = qp.qp_vectors(x0)
    shift = Phi_np @ X0
    np.testing.assert_allclose(q, q_x0_np @ X0, atol=1e-9)
    np.testing.assert_allclose(
        l, np.concatenate([np.tile([p.u_min], 6), np.tile([p.p_min, p.v_min], 6) - shift]),
        atol=1e-9,
    )


@pytest.mark.parametrize("solver,iters", [("pdip", 50), ("admm", 400)])
def test_closed_loop_golden_match(solver, iters):
    """Single-scenario closed-loop u-sequence vs float64 oracle ≤ 1e-4 (BASELINE)."""
    p = mpc.session2_problem(N=20)
    ctrl = mpc.make_linear_mpc(p, solver=solver, iters=iters, dtype=jnp.float64)
    sys = p.system(jnp.float64)
    steps = 40
    res = mpc.simulate(
        jnp.asarray(X0), sys, steps=steps, policy=ctrl.policy(),
        policy_carry=ctrl.initial_carry(jnp.float64),
        instability_norm=1e9,
    )
    ref = closed_loop_mpc_np(problem_dict(p), X0, steps)
    err_u = np.max(np.abs(np.asarray(res.inputs) - ref["inputs"]))
    err_x = np.max(np.abs(np.asarray(res.states) - ref["states"]))
    assert err_u < 1e-4, f"{solver}: u-traj err {err_u:.2e}"
    assert err_x < 1e-3, f"{solver}: x-traj err {err_x:.2e}"
    assert bool(np.all(np.asarray(res.logs["solver_success"])))


@pytest.mark.smoke
def test_constraints_respected_in_closed_loop():
    p = mpc.session2_problem(N=20)
    ctrl = mpc.make_linear_mpc(p, solver="pdip", iters=50, dtype=jnp.float64)
    sys = p.system(jnp.float64)
    res = mpc.simulate(
        jnp.asarray(X0), sys, steps=60, policy=ctrl.policy(),
        policy_carry=ctrl.initial_carry(jnp.float64),
        instability_norm=1e9,
    )
    tol = 1e-6
    states = np.asarray(res.states)
    inputs = np.asarray(res.inputs)
    assert states[:, 0].max() <= p.p_max + tol  # braking wall
    assert states[:, 1].max() <= p.v_max + tol
    assert inputs.min() >= p.u_min - tol and inputs.max() <= p.u_max + tol
    # reaches the origin
    assert np.linalg.norm(states[-1]) < 1e-1


def test_session3_relaxed_bounds_feasible_where_session2_tight():
    """Session-3 exists because session-2 bounds can pinch; verify the relaxation
    changes the feasible set as committed (p_min -150→-120, v_min -20→-50)."""
    p2, p3 = mpc.session2_problem(), mpc.session3_problem()
    assert (p2.p_min, p2.v_min) == (-150.0, -20.0)
    assert (p3.p_min, p3.v_min) == (-120.0, -50.0)
    # downward start at v = -25: violates session-2's v_min = -20 outright, but
    # session-3 (v_min = -50) can recover before p hits its floor
    x0 = np.array([-50.0, -25.0])
    ctrl3 = mpc.make_linear_mpc(p3, solver="pdip", iters=50, dtype=jnp.float64)
    u_traj, sol = ctrl3.solve(jnp.asarray(x0))
    assert bool(sol.converged)
    ctrl2 = mpc.make_linear_mpc(p2, solver="pdip", iters=50, dtype=jnp.float64)
    _, sol2 = ctrl2.solve(jnp.asarray(x0))
    assert not bool(sol2.converged)  # v0 = -25 violates v_min = -20 hard


def test_tracking_reference_mpc():
    """Session-3 tracking variant: drive (p, v) to a nonzero reference point."""
    p = mpc.session3_problem(N=20)
    x_ref = np.array([-10.0, 0.0])
    ctrl = mpc.make_linear_mpc(
        p, solver="pdip", iters=50, dtype=jnp.float64, terminal="dare",
        x_ref=jnp.asarray(x_ref),
    )
    sys = p.system(jnp.float64)
    res = mpc.simulate(
        jnp.asarray([-60.0, 5.0]), sys, steps=60, policy=ctrl.policy(),
        policy_carry=ctrl.initial_carry(jnp.float64),
        instability_norm=1e9,
    )
    final = np.asarray(res.states[-1])
    assert np.linalg.norm(final - x_ref) < 0.5
    ref_loop = closed_loop_mpc_np(
        problem_dict(p, QN=np.asarray(ctrl.terminal_P)), np.array([-60.0, 5.0]),
        60, x_ref=x_ref,
    )
    err_u = np.max(np.abs(np.asarray(res.inputs) - ref_loop["inputs"]))
    assert err_u < 1e-4


def test_batched_closed_loop_vmap():
    """The throughput pattern: vmap the whole closed loop over initial states."""
    p = mpc.session2_problem(N=10)
    ctrl = mpc.make_linear_mpc(p, solver="admm", iters=150, dtype=jnp.float64)
    sys = p.system(jnp.float64)

    def run(x0):
        return mpc.simulate(
            x0, sys, steps=20, policy=ctrl.policy(),
            policy_carry=ctrl.initial_carry(jnp.float64),
            instability_norm=1e9,
        )

    x0s = jnp.asarray(
        np.stack([X0, [-80.0, 10.0], [-50.0, -5.0], [-120.0, 15.0]])
    )
    batch = jax.jit(jax.vmap(run))(x0s)
    assert batch.states.shape == (4, 21, 2)
    # each row matches its single-scenario run
    single = run(x0s[1])
    np.testing.assert_allclose(batch.inputs[1], single.inputs, atol=1e-10)
    assert bool(np.all(np.asarray(batch.logs["solver_success"])))
