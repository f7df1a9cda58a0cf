"""Fused Pallas stagewise interior-point kernel vs the XLA solver path.

Runs the same kernel code the TPU executes, in Pallas interpreter mode on CPU
(`stagewise_ip_solve_pallas` auto-selects interpret off-TPU), checked against
`solvers/riccati_ip.py::stagewise_ip_solve` — the oracle-gated reference
implementation (tests/test_riccati_ip.py certifies THAT path against the dense
KKT / condensed-PDIP float64 ground truths), plus a direct float64 oracle gate.
"""

import pytest

pytestmark = pytest.mark.slow  # oracle-heavy / long-running (full tier)
import jax
import jax.numpy as jnp
import numpy as np

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.experimental.riccati_ip_kernel import (
    stagewise_ip_solve_pallas,
)
from model_predictive_control_tpu.solvers.riccati_ip import stagewise_ip_solve


def _session2_data(dtype=jnp.float32, N=8):
    problem = mpc.session2_problem(N=N)
    sys_ = problem.system(dtype)
    Q = jnp.diag(jnp.asarray(problem.Q, dtype))
    R = jnp.diag(jnp.asarray(problem.R, dtype))
    x_lb = jnp.asarray([problem.p_min, problem.v_min], dtype)
    x_ub = jnp.asarray([problem.p_max, problem.v_max], dtype)
    u_lb = jnp.asarray([problem.u_min], dtype)
    u_ub = jnp.asarray([problem.u_max], dtype)
    return sys_.A, sys_.B, Q, R, x_lb, x_ub, u_lb, u_ub


def _x0_batch(n=6):
    kp, kv = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
    return jnp.stack(
        [
            jax.random.uniform(kp, (n,), minval=-140.0, maxval=-20.0),
            jax.random.uniform(kv, (n,), minval=-15.0, maxval=24.0),
        ],
        axis=1,
    ).astype(jnp.float32)


def _ref_solve(args, x0s, N, iters, u_init=None):
    A, B, Q, R, x_lb, x_ub, u_lb, u_ub = args
    if u_init is None:
        fn = lambda x: stagewise_ip_solve(
            A, B, Q, R, Q, x_lb, x_ub, u_lb, u_ub, x, N=N, iters=iters
        )
        return jax.vmap(fn)(x0s)
    fn = lambda x, u: stagewise_ip_solve(
        A, B, Q, R, Q, x_lb, x_ub, u_lb, u_ub, x, u_init=u, N=N, iters=iters
    )
    return jax.vmap(fn)(x0s, u_init)


def test_kernel_matches_xla_session2():
    args = _session2_data()
    A, B, Q, R, x_lb, x_ub, u_lb, u_ub = args
    x0s = _x0_batch(5)
    ref = _ref_solve(args, x0s, N=8, iters=15)
    sol = stagewise_ip_solve_pallas(
        A, B, Q, R, Q, x_lb, x_ub, u_lb, u_ub, x0s, N=8, iters=15, tile=128
    )
    assert bool(jnp.all(ref.success)) and bool(jnp.all(sol.success))
    np.testing.assert_allclose(np.asarray(sol.us), np.asarray(ref.us), atol=5e-4)
    np.testing.assert_allclose(np.asarray(sol.xs), np.asarray(ref.xs), atol=5e-4)


def test_kernel_long_horizon_and_infeasible_lane():
    """N=40 (the long-horizon regime the stagewise solver exists for) with one
    infeasible initial state: the bad lane reports success=False with finite-
    or-infinite (never silently wrong) output, and does not poison the batch."""
    args = _session2_data()
    A, B, Q, R, x_lb, x_ub, u_lb, u_ub = args
    x0s = jnp.concatenate(
        [_x0_batch(5), jnp.asarray([[50.0, 30.0]], jnp.float32)], axis=0
    )
    ref = _ref_solve(args, x0s, N=40, iters=20)
    sol = stagewise_ip_solve_pallas(
        A, B, Q, R, Q, x_lb, x_ub, u_lb, u_ub, x0s, N=40, iters=20, tile=128
    )
    np.testing.assert_array_equal(
        np.asarray(sol.success), np.asarray(ref.success)
    )
    assert not bool(sol.success[-1])
    good = np.asarray(ref.success)
    np.testing.assert_allclose(
        np.asarray(sol.us)[good], np.asarray(ref.us)[good], atol=1e-3
    )
    # good lanes are finite and NaN-free even next to the failed lane
    assert np.all(np.isfinite(np.asarray(sol.us)[good]))
    assert not np.any(np.isnan(np.asarray(sol.us)[good]))


def test_kernel_float64_oracle_gate():
    """Kernel (f32) vs the float64 XLA solve on the session-2 braking family.

    Mid-horizon controls are weakly determined at f32 (R = 0.01 makes the tail
    of u nearly cost-free; the f32 XLA path deviates from f64 identically —
    measured 0.135 for both, while kernel-vs-f32-XLA stays at 6e-5). The gates
    that matter for receding horizon: the applied control u₀ (≤ 3e-4 on a ±20
    span ≈ 1.5e-5 relative) and full agreement with the f32 reference path."""
    args32 = _session2_data(jnp.float32)
    args64 = _session2_data(jnp.float64)
    A, B, Q, R, x_lb, x_ub, u_lb, u_ub = args32
    x0s = _x0_batch(4)
    ref64 = _ref_solve(args64, x0s.astype(jnp.float64), N=12, iters=25)
    ref32 = _ref_solve(args32, x0s, N=12, iters=25)
    sol = stagewise_ip_solve_pallas(
        A, B, Q, R, Q, x_lb, x_ub, u_lb, u_ub, x0s, N=12, iters=25, tile=128
    )
    assert bool(jnp.all(ref64.success)) and bool(jnp.all(sol.success))
    np.testing.assert_allclose(
        np.asarray(sol.us[:, 0]),
        np.asarray(ref64.us[:, 0], dtype=np.float32),
        atol=3e-4,
    )
    np.testing.assert_allclose(
        np.asarray(sol.us), np.asarray(ref32.us), atol=5e-4
    )


def test_kernel_warm_start_matches():
    args = _session2_data()
    A, B, Q, R, x_lb, x_ub, u_lb, u_ub = args
    x0s = _x0_batch(4)
    cold = _ref_solve(args, x0s, N=10, iters=18)
    warm = cold.us * 0.9 + 0.05
    ref = _ref_solve(args, x0s, N=10, iters=18, u_init=warm)
    sol = stagewise_ip_solve_pallas(
        A, B, Q, R, Q, x_lb, x_ub, u_lb, u_ub, x0s, u_init=warm,
        N=10, iters=18, tile=128,
    )
    np.testing.assert_array_equal(
        np.asarray(sol.success), np.asarray(ref.success)
    )
    np.testing.assert_allclose(np.asarray(sol.us), np.asarray(ref.us), atol=5e-4)


def test_kernel_nu2_dense_cost_and_inf_bounds():
    """nx=3/nu=2 synthetic system: exercises the closed-form 2×2 Quu inverse,
    dense R with cross terms, and a mix of finite/infinite bounds."""
    f32 = jnp.float32
    A = jnp.asarray([[1.0, 0.1, 0.0], [0.0, 1.0, 0.1], [0.0, 0.0, 0.95]], f32)
    B = jnp.asarray([[0.0, 0.005], [0.1, 0.0], [0.0, 0.1]], f32)
    Q = jnp.diag(jnp.asarray([5.0, 1.0, 0.5], f32))
    R = jnp.asarray([[0.1, 0.01], [0.01, 0.2]], f32)
    x_lb = jnp.asarray([-4.0, -2.0, -jnp.inf], f32)
    x_ub = jnp.asarray([4.0, 2.0, 1.5], f32)
    u_lb = jnp.asarray([-1.0, -0.8], f32)
    u_ub = jnp.asarray([1.0, 0.8], f32)
    x0s = jnp.asarray(
        [[3.0, -1.5, 1.0], [-3.5, 1.9, -2.0], [0.2, 0.1, 0.0]], f32
    )
    ref = jax.vmap(
        lambda x: stagewise_ip_solve(
            A, B, Q, R, Q, x_lb, x_ub, u_lb, u_ub, x, N=12, iters=18
        )
    )(x0s)
    sol = stagewise_ip_solve_pallas(
        A, B, Q, R, Q, x_lb, x_ub, u_lb, u_ub, x0s, N=12, iters=18, tile=128
    )
    assert bool(jnp.all(ref.success)) and bool(jnp.all(sol.success))
    np.testing.assert_allclose(np.asarray(sol.us), np.asarray(ref.us), atol=2e-4)


def test_closed_loop_batched_policy_matches_xla():
    """Receding-horizon closed loop through simulate_batch: the kernel-backed
    batched policy brakes the session-2 car like the vmapped XLA policy."""
    from model_predictive_control_tpu.control.batch_loop import simulate_batch
    from model_predictive_control_tpu.solvers.riccati_ip import (
        make_stagewise_mpc,
    )

    problem = mpc.session2_problem(N=8)
    ctrl = make_stagewise_mpc(problem, iters=12, dtype=jnp.float32)
    system = problem.system(jnp.float32)
    x0s = _x0_batch(4)
    carry = ctrl.initial_batch_carry(4)
    res_k = simulate_batch(
        x0s, system, 6, ctrl.batched_policy(backend="pallas", tile=128), carry
    )
    res_x = simulate_batch(
        x0s, system, 6, ctrl.batched_policy(backend="xla"), carry
    )
    assert bool(jnp.all(res_k.logs["solver_success"]))
    assert bool(jnp.all(res_x.logs["solver_success"]))
    np.testing.assert_allclose(
        np.asarray(res_k.states), np.asarray(res_x.states), atol=2e-3
    )


def test_kernel_padding_and_sublane_tiles():
    """Batch not a tile multiple (padding lanes) and S=2 sublane packing give
    the same solutions as the S=1 layout."""
    args = _session2_data()
    A, B, Q, R, x_lb, x_ub, u_lb, u_ub = args
    x0s = _x0_batch(5)  # pads 5 -> 128 (S=1) and 5 -> 256 (S=2)
    a = stagewise_ip_solve_pallas(
        A, B, Q, R, Q, x_lb, x_ub, u_lb, u_ub, x0s, N=8, iters=12, tile=128
    )
    b = stagewise_ip_solve_pallas(
        A, B, Q, R, Q, x_lb, x_ub, u_lb, u_ub, x0s, N=8, iters=12, tile=256
    )
    assert a.us.shape == (5, 8, 1)
    np.testing.assert_array_equal(np.asarray(a.success), np.asarray(b.success))
    np.testing.assert_allclose(np.asarray(a.us), np.asarray(b.us), atol=1e-5)
