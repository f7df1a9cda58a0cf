"""Native C++ QP oracle tests: certify it against the Python float64 oracle, then
use it to cross-check the JAX ADMM solver on the session-2 MPC family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.oracle.native_qp import (
    kkt_residual_native,
    solve_qp_family_native,
    solve_qp_native,
)
from model_predictive_control_tpu.oracle.qp_oracle import solve_qp_np


def _random_box_qp(rng, n=10, m=16):
    G = rng.standard_normal((n, n))
    P = G @ G.T + 0.5 * np.eye(n)
    q = rng.standard_normal(n)
    A = rng.standard_normal((m, n))
    center = rng.standard_normal(m)
    width = np.abs(rng.standard_normal(m)) + 0.3
    l = center - width
    u = center + width
    # some one-sided rows (±inf like the collision constraints)
    l[: m // 4] = -np.inf
    u[-m // 4 :] = np.inf
    return P, q, A, l, u


def test_native_matches_python_oracle_random_qps():
    rng = np.random.default_rng(0)
    for _ in range(8):
        P, q, A, l, u = _random_box_qp(rng)
        x_n, y_n, conv = solve_qp_native(P, q, A, l, u)
        assert conv
        x_p, y_p = solve_qp_np(P, q, A, l, u)
        np.testing.assert_allclose(x_n, x_p, atol=1e-6)
        assert kkt_residual_native(P, q, A, l, u, x_n, y_n) < 1e-7


def test_native_polish_reaches_tight_kkt():
    rng = np.random.default_rng(3)
    P, q, A, l, u = _random_box_qp(rng, n=8, m=12)
    x, y, conv = solve_qp_native(P, q, A, l, u, iters=2000)
    assert kkt_residual_native(P, q, A, l, u, x, y) < 1e-9


def test_native_family_batch_consistency():
    """Family API (factor once, many instances) == per-instance solves."""
    rng = np.random.default_rng(1)
    P, _, A, _, _ = _random_box_qp(rng, n=6, m=10)
    B = 5
    Qb = rng.standard_normal((B, 6))
    # feasible boxes: centered on A @ x_rand so l ≤ Ax ≤ u is reachable
    center = rng.standard_normal((B, 6)) @ A.T
    Lb = center - 1.0
    Ub = center + 1.0
    X, Y, conv = solve_qp_family_native(P, A, Qb, Lb, Ub)
    assert conv.all()
    for b in range(B):
        xb, yb, _ = solve_qp_native(P, Qb[b], A, Lb[b], Ub[b])
        np.testing.assert_allclose(X[b], xb, atol=1e-10)


def test_native_certifies_jax_admm_on_session2_family():
    """The JAX ADMM solver's solutions pass the native KKT certificate and match
    the native solver on the condensed session-2 QP family."""
    problem = mpc.session2_problem(N=10)
    ctrl = mpc.make_linear_mpc(
        problem, solver="admm", iters=2000, dtype=jnp.float64
    )
    qp = ctrl.qp
    P = np.asarray(qp.P)
    A = np.asarray(qp.A_c)

    x0s = np.array([[-100.0, 20.0], [-60.0, 5.0], [-10.0, -3.0]])
    for x0 in x0s:
        q, l, u = (np.asarray(v) for v in qp.qp_vectors(jnp.asarray(x0)))
        u_jax, sol = ctrl.solve(jnp.asarray(x0))
        x_native, y_native, conv = solve_qp_native(P, q, A, l, u)
        assert conv
        np.testing.assert_allclose(np.asarray(sol.x), x_native, atol=2e-5)
        assert (
            kkt_residual_native(P, q, A, l, u, np.asarray(sol.x), np.asarray(sol.y))
            < 1e-3
        )


def test_native_infeasible_direction_unbounded_guard():
    """Equality-like rows (l == u) survive polish with either dual sign."""
    n = 4
    P = np.eye(n)
    q = np.array([1.0, -2.0, 0.5, 0.0])
    A = np.vstack([np.eye(n), np.ones((1, n))])
    l = np.array([-1.0, -1.0, -1.0, -1.0, 0.5])
    u = np.array([1.0, 1.0, 1.0, 1.0, 0.5])  # last row: equality Σx = 0.5
    x, y, conv = solve_qp_native(P, q, A, l, u)
    assert abs(float(A[-1] @ x) - 0.5) < 1e-8
    assert kkt_residual_native(P, q, A, l, u, x, y) < 1e-8
