"""Session-1 capability tests: Riccati scan, DARE, closed-loop LQR.

Mirrors the reference's executable validations (SURVEY.md §4): recursion vs float64
oracle, cost-to-go convergence to the DARE value (``FHC.py:117-131``), and the
short-horizon instability demonstration (``session1_sol.py:152-185``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.smoke  # fast representative tier

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.oracle.lqr_oracle import (
    dare_np,
    lqr_gain_np,
    riccati_recursion_np,
    simulate_np,
)


def session1_setup(dtype=jnp.float64):
    """Constants from FHC.py:134-144 / session1_sol.py:136-144."""
    sys = mpc.double_integrator_discrete(0.5, dtype=dtype)
    C = np.array([[1.0, -2.0 / 3.0]])
    Q = jnp.asarray(C.T @ C + 1e-3 * np.eye(2), dtype=dtype)
    R = jnp.asarray([[0.1]], dtype=dtype)
    return sys, Q, R


def test_riccati_matches_oracle():
    sys, Q, R = session1_setup()
    N = 20
    P, K = mpc.riccati_recursion(sys.A, sys.B, Q, R, Q, N)
    P_np, K_np = riccati_recursion_np(sys.A, sys.B, Q, R, Q, N)
    np.testing.assert_allclose(P, P_np, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(K, K_np, rtol=1e-12, atol=1e-12)


def test_dare_sda_matches_lapack():
    sys, Q, R = session1_setup()
    P_inf = mpc.dare_sda(sys.A, sys.B, Q, R)
    P_ref = dare_np(sys.A, sys.B, Q, R)
    np.testing.assert_allclose(P_inf, P_ref, rtol=1e-10, atol=1e-10)
    assert float(mpc.dare_residual(sys.A, sys.B, Q, R, P_inf)) < 1e-10


def test_cost_to_go_converges_to_dare_value():
    """compare_term_cost semantics (FHC.py:117-131): V_N → V∞ monotonically-ish."""
    sys, Q, R = session1_setup()
    x0 = jnp.array([10.0, 10.0])
    V_inf = float(x0 @ dare_np(sys.A, sys.B, Q, R) @ x0)
    V_N = []
    for N in range(1, 10):
        sol = mpc.solve_finite_horizon(sys, Q, R, Pf=Q, N=N)
        V_N.append(float(mpc.cost_to_go(sol, x0)))
    # converges to the infinite-horizon value from below-ish; final gap small
    assert abs(V_N[-1] - V_inf) / V_inf < 5e-2
    assert abs(V_N[-1] - V_inf) < abs(V_N[0] - V_inf)


def test_closed_loop_matches_oracle_rollout():
    sys, Q, R = session1_setup()
    N = 10
    sol = mpc.solve_finite_horizon(sys, Q, R, Pf=Q, N=N)
    x0 = 10.0 * jnp.ones(2)

    res = mpc.simulate(
        x0, sys, steps=30, policy=mpc.receding_horizon_policy(sol)
    )

    A_np, B_np = np.asarray(sys.A), np.asarray(sys.B)
    _, K_np = riccati_recursion_np(sys.A, sys.B, Q, R, Q, N)
    states_np, unstable = simulate_np(
        np.asarray(x0),
        lambda x, u: A_np @ x + B_np @ u,
        lambda x, t: K_np[0] @ x,
        steps=30,
    )
    np.testing.assert_allclose(res.states, states_np, rtol=1e-10, atol=1e-12)
    assert not bool(res.unstable)
    assert not unstable


def test_short_horizon_instability_flagged():
    """N=4 destabilizes the session-1 system (the point of exercise 4)."""
    sys, Q, R = session1_setup()
    x0 = 10.0 * jnp.ones(2)
    flags = {}
    for N in (4, 10):
        sol = mpc.solve_finite_horizon(sys, Q, R, Pf=Q, N=N)
        res = mpc.simulate(
            x0, sys, steps=30, policy=mpc.receding_horizon_policy(sol)
        )
        flags[N] = bool(res.unstable)
    assert flags[4] is True
    assert flags[10] is False


def test_infinite_horizon_controller_stabilizes():
    sys, Q, R = session1_setup()
    sol = mpc.solve_infinite_horizon(sys, Q, R)
    x0 = 10.0 * jnp.ones(2)
    res = mpc.simulate(
        x0, sys, steps=60, policy=mpc.receding_horizon_policy(sol)
    )
    assert not bool(res.unstable)
    assert float(jnp.linalg.norm(res.states[-1])) < 1e-2
    K_ref = lqr_gain_np(sys.A, sys.B, R, dare_np(sys.A, sys.B, Q, R))
    np.testing.assert_allclose(sol.K[0], K_ref, rtol=1e-9, atol=1e-10)


def test_riccati_vmaps_over_batch():
    """Batched solves over a stack of (Q, x0) scenarios — scenario axis is free."""
    sys, Q, R = session1_setup()
    scales = jnp.array([1.0, 2.0, 5.0])
    Qs = scales[:, None, None] * Q[None]

    batched = jax.vmap(
        lambda Qb: mpc.riccati_recursion(sys.A, sys.B, Qb, R, Qb, 10)
    )
    P, K = batched(Qs)
    assert P.shape == (3, 11, 2, 2)
    assert K.shape == (3, 10, 1, 2)
    for i, s in enumerate(scales):
        P_np, K_np = riccati_recursion_np(
            sys.A, sys.B, float(s) * np.asarray(Q), R, float(s) * np.asarray(Q), 10
        )
        np.testing.assert_allclose(P[i], P_np, rtol=1e-12, atol=1e-12)


def test_prediction_policy_open_loop():
    """prediction() semantics (LinearSystem.py:28-35): time-varying gains."""
    sys, Q, R = session1_setup()
    sol = mpc.solve_finite_horizon(sys, Q, R, Pf=Q, N=6)
    x0 = jnp.array([3.0, -1.0])
    res = mpc.simulate(x0, sys, steps=6, policy=mpc.prediction_policy(sol))
    # manual unroll
    x = np.asarray(x0)
    for t in range(6):
        u = np.asarray(sol.K[t]) @ x
        x = np.asarray(sys.A) @ x + np.asarray(sys.B) @ u
    np.testing.assert_allclose(res.states[-1], x, rtol=1e-12)


def test_output_equation():
    """set_output_eq semantics (LinearSystem.py:12-14): y = Cx + Du."""
    import jax.numpy as jnp
    from model_predictive_control_tpu.models.linear import LinearSystem

    sys_ = LinearSystem(
        A=jnp.eye(2), B=jnp.asarray([[0.0], [1.0]])
    ).with_output(C=jnp.asarray([[1.0, 0.0]]), D=jnp.asarray([[2.0]]))
    x = jnp.asarray([3.0, -1.0])
    u = jnp.asarray([0.5])
    np.testing.assert_allclose(np.asarray(sys_.output(x, u)), [4.0])
    np.testing.assert_allclose(np.asarray(sys_.output(x)), [3.0])
    # identity output when unset; dynamics unchanged by with_output
    base = LinearSystem(A=jnp.eye(2), B=jnp.asarray([[0.0], [1.0]]))
    np.testing.assert_allclose(np.asarray(base.output(x)), np.asarray(x))
    np.testing.assert_allclose(np.asarray(sys_(x, u)), np.asarray(base(x, u)))
