"""Parallel-in-horizon ops match their sequential oracles (SURVEY.md §5.7)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle-heavy / long-running (full tier)

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.control.simulate import rollout
from model_predictive_control_tpu.ops.parallel_horizon import (
    affine_rollout_parallel,
    lqt_solve_parallel,
    riccati_recursion_parallel,
    rollout_parallel,
)
from model_predictive_control_tpu.solvers.riccati_ip import (
    lq_affine_solve,
    lq_factor,
)


def _session1_matrices():
    sys_ = mpc.double_integrator_discrete(0.5)
    C = np.array([[1.0, -2.0 / 3.0]])
    Q = jnp.asarray(C.T @ C + 1e-3 * np.eye(2))
    R = jnp.asarray([[0.1]])
    return sys_.A, sys_.B, Q, R


def _random_system(key, nx, nu):
    kA, kB = jax.random.split(key)
    A = jnp.eye(nx) + 0.1 * jax.random.normal(kA, (nx, nx))
    B = jax.random.normal(kB, (nx, nu))
    return A, B


class TestAffineRolloutParallel:
    def test_matches_sequential_lti(self):
        A, B, _, _ = _session1_matrices()
        us = jnp.sin(jnp.arange(31, dtype=jnp.float64))[:, None]
        x0 = jnp.asarray([10.0, 10.0])
        seq = rollout(x0, lambda x, u: A @ x + B @ u, us)
        par = affine_rollout_parallel(A, B, x0, us)
        np.testing.assert_allclose(par, seq, rtol=0, atol=1e-10)

    def test_time_varying(self):
        key = jax.random.PRNGKey(3)
        N, nx, nu = 17, 3, 2
        As = jnp.eye(nx) + 0.05 * jax.random.normal(key, (N, nx, nx))
        Bs = jax.random.normal(jax.random.PRNGKey(4), (N, nx, nu))
        us = jax.random.normal(jax.random.PRNGKey(5), (N, nu))
        x0 = jnp.ones(nx)
        x, seq = x0, [x0]
        for k in range(N):
            x = As[k] @ x + Bs[k] @ us[k]
            seq.append(x)
        par = affine_rollout_parallel(As, Bs, x0, us)
        np.testing.assert_allclose(par, jnp.stack(seq), rtol=0, atol=1e-9)

    def test_rollout_parallel_takes_system(self):
        sys_ = mpc.double_integrator_discrete(0.5)
        us = jnp.ones((5, 1))
        x0 = jnp.asarray([1.0, -1.0])
        seq = rollout(x0, sys_, us)
        par = rollout_parallel(sys_, x0, us)
        np.testing.assert_allclose(par, seq, atol=1e-12)


class TestRiccatiParallel:
    @pytest.mark.parametrize("N", [1, 4, 20, 33])
    def test_matches_sequential_session1(self, N):
        A, B, Q, R = _session1_matrices()
        P_seq, K_seq = mpc.riccati_recursion(A, B, Q, R, Q, N)
        P_par, K_par = riccati_recursion_parallel(A, B, Q, R, Q, N)
        np.testing.assert_allclose(P_par, P_seq, rtol=0, atol=1e-9)
        np.testing.assert_allclose(K_par, K_seq, rtol=0, atol=1e-9)

    def test_matches_sequential_random(self):
        A, B = _random_system(jax.random.PRNGKey(0), 4, 2)
        Q = jnp.eye(4) * jnp.asarray([1.0, 6.0, 0.2, 0.05])
        R = jnp.diag(jnp.asarray([1.0, 0.01]))
        Pf = 100.0 * Q
        P_seq, K_seq = mpc.riccati_recursion(A, B, Q, R, Pf, 64)
        P_par, K_par = riccati_recursion_parallel(A, B, Q, R, Pf, 64)
        np.testing.assert_allclose(P_par, P_seq, rtol=1e-7, atol=1e-7)
        np.testing.assert_allclose(K_par, K_seq, rtol=1e-7, atol=1e-7)

    def test_time_varying_stages(self):
        key = jax.random.PRNGKey(7)
        N, nx, nu = 9, 3, 1
        As = jnp.eye(nx) + 0.05 * jax.random.normal(key, (N, nx, nx))
        Bs = jax.random.normal(jax.random.PRNGKey(8), (N, nx, nu))
        Qk = jnp.eye(nx)
        Rk = jnp.asarray([[0.5]])
        Pf = 2.0 * jnp.eye(nx)
        # sequential oracle on the time-varying recursion
        P = Pf
        P_seq, K_seq = [Pf], []
        for k in range(N - 1, -1, -1):
            Ak, Bk = As[k], Bs[k]
            K = -jnp.linalg.solve(Rk + Bk.T @ P @ Bk, Bk.T @ P @ Ak)
            P = Qk + Ak.T @ P @ (Ak + Bk @ K)
            P_seq.insert(0, P)
            K_seq.insert(0, K)
        P_par, K_par = riccati_recursion_parallel(As, Bs, Qk, Rk, Pf, N)
        np.testing.assert_allclose(P_par, jnp.stack(P_seq), rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(K_par, jnp.stack(K_seq), rtol=1e-8, atol=1e-8)

    def test_jit_and_vmap(self):
        A, B, Q, R = _session1_matrices()
        Pfs = jnp.stack([Q, 2.0 * Q, 5.0 * Q])
        f = jax.jit(
            jax.vmap(
                lambda Pf: riccati_recursion_parallel(A, B, Q, R, Pf, 8)[0]
            )
        )
        Ps = f(Pfs)
        assert Ps.shape == (3, 9, 2, 2)
        P_seq, _ = mpc.riccati_recursion(A, B, Q, R, 2.0 * Q, 8)
        np.testing.assert_allclose(Ps[1], P_seq, atol=1e-9)


def _random_lqt(seed, N, nx, nu):
    rng = np.random.default_rng(seed)
    As = jnp.asarray(rng.normal(size=(N, nx, nx)) * 0.3 + np.eye(nx))
    Bs = jnp.asarray(rng.normal(size=(N, nx, nu)))
    Qts = jnp.asarray(
        np.stack(
            [
                (lambda L: L @ L.T + np.eye(nx))(rng.normal(size=(nx, nx)))
                for _ in range(N + 1)
            ]
        )
    )
    Rts = jnp.asarray(
        np.stack([np.diag(rng.uniform(0.5, 2.0, nu)) for _ in range(N)])
    )
    qts = jnp.asarray(rng.normal(size=(N + 1, nx)))
    rts = jnp.asarray(rng.normal(size=(N, nu)))
    return As, Bs, Qts, Rts, qts, rts


class TestLqtSolveParallel:
    """The O(log N) affine LQT matches the sequential factor/affine-solve pair."""

    @pytest.mark.parametrize("N", [1, 2, 7, 40])
    def test_matches_sequential_newton_direction(self, N):
        nx, nu = 3, 2
        As, Bs, Qts, Rts, qts, rts = _random_lqt(11 + N, N, nx, nu)
        factors = lq_factor(As, Bs, Qts, Rts)
        dxs, dus = lq_affine_solve(factors, As, Bs, qts, rts)
        xs, us = lqt_solve_parallel(
            As, Bs, Qts, Rts, qts, rts, jnp.zeros((nx,), jnp.float64)
        )
        np.testing.assert_allclose(np.asarray(xs), np.asarray(dxs), atol=1e-9)
        np.testing.assert_allclose(np.asarray(us), np.asarray(dus), atol=1e-9)

    def test_nonzero_initial_state(self):
        N, nx, nu = 12, 4, 2
        As, Bs, Qts, Rts, qts, rts = _random_lqt(3, N, nx, nu)
        x0 = jnp.asarray([1.0, -2.0, 0.5, 3.0])
        factors = lq_factor(As, Bs, Qts, Rts)
        dxs, dus = lq_affine_solve(factors, As, Bs, qts, rts, x_init=x0)
        xs, us = lqt_solve_parallel(As, Bs, Qts, Rts, qts, rts, x0)
        np.testing.assert_allclose(np.asarray(xs), np.asarray(dxs), atol=1e-8)
        np.testing.assert_allclose(np.asarray(us), np.asarray(dus), atol=1e-8)

    def test_jit_vmap_over_x0(self):
        N, nx, nu = 8, 2, 1
        As, Bs, Qts, Rts, qts, rts = _random_lqt(5, N, nx, nu)
        x0s = jnp.asarray(np.random.default_rng(9).normal(size=(4, nx)))
        f = jax.jit(
            jax.vmap(lambda x0: lqt_solve_parallel(As, Bs, Qts, Rts, qts, rts, x0))
        )
        xs, us = f(x0s)
        assert xs.shape == (4, N + 1, nx) and us.shape == (4, N, nu)
        factors = lq_factor(As, Bs, Qts, Rts)
        _, us1 = lq_affine_solve(factors, As, Bs, qts, rts, x_init=x0s[2])
        np.testing.assert_allclose(np.asarray(us[2]), np.asarray(us1), atol=1e-8)


def test_solve_finite_horizon_parallel_flag():
    sys_ = mpc.double_integrator_discrete(0.5)
    C = np.array([[1.0, -2.0 / 3.0]])
    Q = jnp.asarray(C.T @ C + 1e-3 * np.eye(2))
    R = jnp.asarray([[0.1]])
    seq = mpc.solve_finite_horizon(sys_, Q, R, Pf=Q, N=20)
    par = mpc.solve_finite_horizon(sys_, Q, R, Pf=Q, N=20, parallel=True)
    np.testing.assert_allclose(par.P, seq.P, atol=1e-9)
    np.testing.assert_allclose(par.K, seq.K, atol=1e-9)
