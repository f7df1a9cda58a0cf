"""Box-QP solver tests vs the float64 oracle (SURVEY.md §4 plan, item 3):
KKT residuals → 0, active-set correctness, convergence masks honest."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from model_predictive_control_tpu.solvers.qp import (
    admm_solve,
    pdip_solve,
    qp_setup,
)
from model_predictive_control_tpu.oracle.qp_oracle import solve_qp_np


def random_qp(rng, n=12, m=20, one_sided=True):
    L = rng.normal(size=(n, n))
    P = L @ L.T + 0.1 * np.eye(n)
    A = rng.normal(size=(m, n))
    q = rng.normal(size=n)
    center = A @ rng.normal(size=n)
    l = center - rng.uniform(0.05, 1.0, m)
    u = center + rng.uniform(0.05, 1.0, m)
    if one_sided:
        u[:3] = np.inf
        l[3:5] = -np.inf
    return P, A, q, l, u


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_pdip_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    P, A, q, l, u = random_qp(rng)
    x_ref, _ = solve_qp_np(P, q, A, l, u)
    op = qp_setup(jnp.asarray(P), jnp.asarray(A))
    sol = pdip_solve(op, jnp.asarray(q), jnp.asarray(l), jnp.asarray(u), iters=50)
    assert bool(sol.converged)
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=1e-7)


@pytest.mark.parametrize("seed", [0, 1, 3, 4])
@pytest.mark.smoke
def test_admm_polish_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    P, A, q, l, u = random_qp(rng)
    x_ref, _ = solve_qp_np(P, q, A, l, u)
    op = qp_setup(jnp.asarray(P), jnp.asarray(A))
    sol = admm_solve(op, jnp.asarray(q), jnp.asarray(l), jnp.asarray(u), iters=400)
    assert bool(sol.converged), (
        float(sol.prim_res),
        float(sol.dual_res),
    )
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=1e-6)


def test_unconstrained_limit():
    """With bounds at ±inf both solvers return the Newton step -P⁻¹q."""
    rng = np.random.default_rng(7)
    n, m = 8, 10
    L = rng.normal(size=(n, n))
    P = L @ L.T + 0.5 * np.eye(n)
    A = rng.normal(size=(m, n))
    q = rng.normal(size=n)
    l = np.full(m, -np.inf)
    u = np.full(m, np.inf)
    x_star = np.linalg.solve(P, -q)
    op = qp_setup(jnp.asarray(P), jnp.asarray(A))
    for solve, iters in ((admm_solve, 200), (pdip_solve, 30)):
        sol = solve(op, jnp.asarray(q), jnp.asarray(l), jnp.asarray(u), iters=iters)
        np.testing.assert_allclose(np.asarray(sol.x), x_star, atol=1e-7)


@pytest.mark.smoke
def test_active_set_correctness():
    """1-D: min (x-3)² s.t. x ≤ 1 → x*=1, dual = f'(1) = -2·(1-3) = 4 (upper)."""
    P = jnp.asarray([[2.0]])
    A = jnp.asarray([[1.0]])
    q = jnp.asarray([-6.0])
    l = jnp.asarray([-jnp.inf])
    u = jnp.asarray([1.0])
    op = qp_setup(P, A)
    for solve, iters in ((admm_solve, 200), (pdip_solve, 30)):
        sol = solve(op, q, l, u, iters=iters)
        np.testing.assert_allclose(float(sol.x[0]), 1.0, atol=1e-9)
        np.testing.assert_allclose(float(sol.y[0]), 4.0, atol=1e-7)


def test_infeasible_reports_not_converged():
    """x ≤ -1 and x ≥ 1 simultaneously: must flag non-convergence, not crash."""
    P = jnp.asarray([[2.0]])
    A = jnp.asarray([[1.0], [1.0]])
    q = jnp.asarray([0.0])
    l = jnp.asarray([-jnp.inf, 1.0])
    u = jnp.asarray([-1.0, jnp.inf])
    op = qp_setup(P, A)
    sol = admm_solve(op, q, l, u, iters=200)
    assert not bool(sol.converged)
    assert np.isfinite(float(sol.prim_res))
    sol_p = pdip_solve(op, q, l, u, iters=30)
    assert not bool(sol_p.converged)


def test_batched_solve_vmaps():
    """vmap over (q, l, u) with a shared operator — the throughput pattern."""
    rng = np.random.default_rng(11)
    P, A, q, l, u = random_qp(rng, one_sided=False)
    op = qp_setup(jnp.asarray(P), jnp.asarray(A))
    B = 16
    qs = jnp.asarray(rng.normal(size=(B, q.shape[0])))
    ls = jnp.tile(jnp.asarray(l), (B, 1))
    us = jnp.tile(jnp.asarray(u), (B, 1))
    batched = jax.jit(
        jax.vmap(lambda qq, ll, uu: pdip_solve(op, qq, ll, uu, iters=40).x)
    )
    xs = batched(qs, ls, us)
    for i in range(0, B, 5):
        x_ref, _ = solve_qp_np(P, np.asarray(qs[i]), A, l, u)
        np.testing.assert_allclose(np.asarray(xs[i]), x_ref, atol=1e-6)


def test_warm_start_accelerates_admm():
    """Warm-started ADMM from the exact solution stays converged in few iters."""
    rng = np.random.default_rng(3)
    P, A, q, l, u = random_qp(rng, one_sided=False)
    op = qp_setup(jnp.asarray(P), jnp.asarray(A))
    qj, lj, uj = jnp.asarray(q), jnp.asarray(l), jnp.asarray(u)
    ref = pdip_solve(op, qj, lj, uj, iters=50)
    cold = admm_solve(op, qj, lj, uj, iters=20, polish=False)
    hot = admm_solve(op, qj, lj, uj, iters=20, polish=False, warm=(ref.x, ref.y))
    assert float(hot.prim_res) <= float(cold.prim_res) * 0.5 or float(
        hot.prim_res
    ) < 1e-8
    assert float(hot.dual_res) < float(cold.dual_res)
