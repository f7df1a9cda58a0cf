"""Fused Pallas ADMM kernel + batched closed-loop path.

Runs the same kernel code the TPU executes, in Pallas interpreter mode on CPU
(``admm_solve_pallas`` auto-selects interpret off-TPU), checked against the float64
oracle and against the per-scenario XLA path it must mirror (SURVEY.md §4 plan).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle-heavy / long-running (full tier)

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.control.batch_loop import simulate_batch
from model_predictive_control_tpu.ops.pallas.admm_kernel import admm_solve_pallas
from model_predictive_control_tpu.oracle.qp_oracle import solve_qp_np
from model_predictive_control_tpu.solvers.qp import admm_solve, qp_setup

from tests.test_qp import random_qp


def _batched_qp(seed=0, B=6, n=10, m=16):
    rng = np.random.default_rng(seed)
    P, A, _, l, u = random_qp(rng, n=n, m=m, one_sided=False)
    qs = rng.normal(size=(B, n))
    op = qp_setup(jnp.asarray(P, jnp.float32), jnp.asarray(A, jnp.float32))
    return (
        P,
        A,
        op,
        jnp.asarray(qs, jnp.float32),
        jnp.tile(jnp.asarray(l, jnp.float32), (B, 1)),
        jnp.tile(jnp.asarray(u, jnp.float32), (B, 1)),
        qs,
        l,
        u,
    )


def test_pallas_matches_oracle():
    P, A, op, qs, ls, us, qs_np, l_np, u_np = _batched_qp()
    sol = admm_solve_pallas(op, qs, ls, us, iters=400, tile=4)
    assert bool(jnp.all(sol.converged)), np.asarray(sol.prim_res)
    for i in range(qs.shape[0]):
        x_ref, _ = solve_qp_np(P, qs_np[i], A, l_np, u_np)
        np.testing.assert_allclose(np.asarray(sol.x[i]), x_ref, atol=2e-4)


def test_pallas_matches_xla_path():
    """Same splitting, scaling, and polish intent as vmap(admm_solve): solutions
    must agree to solver tolerance even though ρ adaptation granularity differs."""
    _, _, op, qs, ls, us, *_ = _batched_qp(seed=5)
    sol_k = admm_solve_pallas(op, qs, ls, us, iters=300, tile=8)
    sol_x = jax.vmap(lambda q, l, u: admm_solve(op, q, l, u, iters=300))(qs, ls, us)
    np.testing.assert_allclose(
        np.asarray(sol_k.x), np.asarray(sol_x.x), atol=5e-4
    )


def test_pallas_pads_ragged_batch():
    """Batch not a multiple of the tile: results for real rows must be unaffected
    by the zero-padded rows."""
    P, A, op, qs, ls, us, qs_np, l_np, u_np = _batched_qp(seed=2, B=5)
    sol = admm_solve_pallas(op, qs, ls, us, iters=300, tile=4)
    assert sol.x.shape[0] == 5
    x_ref, _ = solve_qp_np(P, qs_np[3], A, l_np, u_np)
    np.testing.assert_allclose(np.asarray(sol.x[3]), x_ref, atol=2e-4)


def test_pallas_warm_start_keeps_solution():
    """Warm-starting from the converged solution must stay at it (the hysteresis
    guard regression: ρ re-adaptation used to kick converged iterates away)."""
    _, _, op, qs, ls, us, *_ = _batched_qp(seed=7)
    ref = admm_solve_pallas(op, qs, ls, us, iters=400, tile=8)
    hot = admm_solve_pallas(
        op, qs, ls, us, warm_x=ref.x, warm_y=ref.y, iters=50, tile=8
    )
    assert bool(jnp.all(hot.converged))
    np.testing.assert_allclose(np.asarray(hot.x), np.asarray(ref.x), atol=1e-4)


def test_batched_closed_loop_matches_scalar_path():
    """simulate_batch + batched_policy(pallas) vs per-scenario simulate + policy():
    same plants, same inputs to MPC tolerance, high success."""
    problem = mpc.session2_problem(N=8)
    ctrl = mpc.make_linear_mpc(problem, solver="admm", iters=150, dtype=jnp.float32)
    system = problem.system(jnp.float32)
    B, STEPS = 4, 12
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        np.stack(
            [rng.uniform(-120, -30, B), rng.uniform(-10, 20, B)], axis=1
        ),
        jnp.float32,
    )

    res_b = simulate_batch(
        x0,
        system,
        STEPS,
        ctrl.batched_policy(backend="pallas", tile=4),
        ctrl.presolve_batch_carry(x0, iters_mult=3, tile=4),
    )
    success = np.asarray(res_b.logs["solver_success"])
    assert success.mean() > 0.9

    pol = ctrl.policy()
    for i in range(B):
        res_s = mpc.simulate(
            x0[i], system, steps=STEPS, policy=pol,
            policy_carry=ctrl.initial_carry(jnp.float32),
        )
        # paths may land on different sides of an active bound mid-transient
        # (one at u_max exactly, one 2e-2 inside); tolerance reflects that
        np.testing.assert_allclose(
            np.asarray(res_b.inputs[:, i]),
            np.asarray(res_s.inputs),
            atol=3e-2,
        )
        np.testing.assert_allclose(
            np.asarray(res_b.states[:, i]),
            np.asarray(res_s.states),
            atol=5e-2,
        )


def test_batched_policy_xla_backend():
    """The vmap reference backend drives the same loop (used on non-TPU hosts)."""
    problem = mpc.session2_problem(N=6)
    ctrl = mpc.make_linear_mpc(problem, solver="admm", iters=120, dtype=jnp.float32)
    system = problem.system(jnp.float32)
    x0 = jnp.asarray([[-80.0, 10.0], [-50.0, -5.0]], jnp.float32)
    res = simulate_batch(
        x0, system, 8,
        ctrl.batched_policy(backend="xla"),
        ctrl.initial_batch_carry(2),
    )
    assert np.asarray(res.logs["solver_success"])[2:].mean() > 0.9
    assert np.all(np.isfinite(np.asarray(res.states)))


def test_probe_respects_iteration_budget():
    """iters <= probe_iters must run EXACTLY iters iterations (the probe is the
    whole budget, no extra min-1-iteration chunks): the result must be bitwise
    identical to an explicit single-chunk schedule of the same depth."""
    _, _, op, qs, ls, us, *_ = _batched_qp(seed=7)
    a = admm_solve_pallas(
        op, qs, ls, us, iters=8, chunks=4, probe_iters=32, tile=4
    )
    b = admm_solve_pallas(
        op, qs, ls, us, iters=8, chunks=1, probe_iters=0, tile=4
    )
    np.testing.assert_array_equal(np.asarray(a.x), np.asarray(b.x))
    np.testing.assert_array_equal(np.asarray(a.y), np.asarray(b.y))
