"""Stagewise Riccati interior-point solver tests.

Gates:
- the Riccati-structured Newton direction is the exact KKT solve (vs dense KKT);
- solutions match the condensed PDIP path / float64 oracle on session-2/3 families;
- long horizons (N=100) work where condensation is O(N²) — the solver's raison d'être;
- infeasible states report success=False without poisoning batches (masks, not NaNs);
- vmap batching matches single-scenario solves;
- closed-loop receding-horizon controller brakes the session-2 car like the
  condensed controller.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle-heavy / long-running (full tier)

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.ops.condensed import build_condensed_qp
from model_predictive_control_tpu.solvers.qp import pdip_solve, qp_setup
from model_predictive_control_tpu.solvers.riccati_ip import (
    lq_affine_solve,
    lq_factor,
    make_stagewise_mpc,
    stagewise_ip_solve,
)


def _problem_data(problem, dtype=jnp.float64):
    sys_ = problem.system(dtype)
    Q = jnp.diag(jnp.asarray(problem.Q, dtype))
    R = jnp.diag(jnp.asarray(problem.R, dtype))
    x_lb = jnp.asarray([problem.p_min, problem.v_min], dtype)
    x_ub = jnp.asarray([problem.p_max, problem.v_max], dtype)
    u_lb = jnp.asarray([problem.u_min], dtype)
    u_ub = jnp.asarray([problem.u_max], dtype)
    return sys_, Q, R, x_lb, x_ub, u_lb, u_ub


def _condensed_ref(problem, x0, iters=60):
    sys_, Q, R, x_lb, x_ub, u_lb, u_ub = _problem_data(problem)
    cqp = build_condensed_qp(
        sys_.A, sys_.B, Q, R, Q, problem.N, u_lb, u_ub, x_lb, x_ub
    )
    op = qp_setup(cqp.P, cqp.A_c)
    q, l, u = cqp.qp_vectors(x0)
    return pdip_solve(op, q, l, u, iters=iters)


def test_newton_direction_matches_dense_kkt():
    """lq_factor + lq_affine_solve solve the block-banded KKT system exactly."""
    rng = np.random.default_rng(0)
    N, nx, nu = 4, 3, 2
    As = jnp.asarray(rng.normal(size=(N, nx, nx)) * 0.4 + np.eye(nx))
    Bs = jnp.asarray(rng.normal(size=(N, nx, nu)))
    Qts = []
    for k in range(N + 1):
        L = rng.normal(size=(nx, nx))
        Qts.append(L @ L.T + np.eye(nx))
    Qts = jnp.asarray(np.stack(Qts))
    Rts = jnp.asarray(
        np.stack([np.diag(rng.uniform(0.5, 2.0, nu)) for _ in range(N)])
    )
    qts = jnp.asarray(rng.normal(size=(N + 1, nx)))
    rts = jnp.asarray(rng.normal(size=(N, nu)))

    factors = lq_factor(As, Bs, Qts, Rts)
    dxs, dus = lq_affine_solve(factors, As, Bs, qts, rts)

    # dense KKT: variables [u_0..u_{N-1}, x_1..x_N], constraints = dynamics
    nz = N * nu + N * nx
    H = np.zeros((nz, nz))
    g = np.zeros(nz)
    off = N * nu
    for k in range(N):
        H[k * nu : (k + 1) * nu, k * nu : (k + 1) * nu] = np.asarray(Rts[k])
        g[k * nu : (k + 1) * nu] = np.asarray(rts[k])
    for k in range(1, N + 1):
        sl = slice(off + (k - 1) * nx, off + k * nx)
        H[sl, sl] = np.asarray(Qts[k])
        g[sl.start : sl.stop] = np.asarray(qts[k])
    C = np.zeros((N * nx, nz))
    for k in range(N):
        C[k * nx : (k + 1) * nx, k * nu : (k + 1) * nu] = -np.asarray(Bs[k])
        C[k * nx : (k + 1) * nx, off + k * nx : off + (k + 1) * nx] = np.eye(nx)
        if k > 0:
            C[k * nx : (k + 1) * nx, off + (k - 1) * nx : off + k * nx] = -np.asarray(
                As[k]
            )
    KKT = np.block([[H, C.T], [C, np.zeros((N * nx, N * nx))]])
    sol = np.linalg.solve(KKT, np.concatenate([-g, np.zeros(N * nx)]))
    np.testing.assert_allclose(
        sol[:off].reshape(N, nu), np.asarray(dus), atol=1e-10
    )
    np.testing.assert_allclose(
        sol[off:nz].reshape(N, nx), np.asarray(dxs[1:]), atol=1e-10
    )


@pytest.mark.parametrize(
    "x0v",
    [(-100.0, 20.0), (-50.0, -10.0), (-3.0, 5.0), (-140.0, 24.0)],
)
def test_matches_condensed_pdip_session2(x0v):
    problem = mpc.session2_problem(N=20)
    sys_, Q, R, x_lb, x_ub, u_lb, u_ub = _problem_data(problem)
    x0 = jnp.asarray(x0v, jnp.float64)
    ref = _condensed_ref(problem, x0)
    assert bool(ref.converged)
    res = stagewise_ip_solve(
        sys_.A, sys_.B, Q, R, Q, x_lb, x_ub, u_lb, u_ub, x0, N=problem.N, iters=20
    )
    assert bool(res.success), (float(res.mu), float(res.prim_res))
    # both are optimal; degenerate flat directions allow ~1e-5 u-differences at
    # equal objective, so gate on objective + bound feasibility + tight u match
    u_mine = np.asarray(res.us).ravel()
    u_ref = np.asarray(ref.x).ravel()
    cqp = build_condensed_qp(
        sys_.A, sys_.B, Q, R, Q, problem.N, u_lb, u_ub, x_lb, x_ub
    )
    q, _, _ = cqp.qp_vectors(x0)
    P, qn = np.asarray(cqp.P), np.asarray(q)
    obj = lambda z: 0.5 * z @ P @ z + qn @ z
    assert obj(u_mine) <= obj(u_ref) + 1e-6 * (1 + abs(obj(u_ref)))
    np.testing.assert_allclose(u_mine, u_ref, atol=1e-4)


def test_infeasible_state_reports_failure():
    """Session 2's braking-too-late states make the hard QP infeasible; the
    solver must say so via the mask, with finite outputs."""
    problem = mpc.session2_problem(N=20)
    sys_, Q, R, x_lb, x_ub, u_lb, u_ub = _problem_data(problem)
    res = stagewise_ip_solve(
        sys_.A, sys_.B, Q, R, Q, x_lb, x_ub, u_lb, u_ub,
        jnp.asarray([-10.0, 24.0], jnp.float64), N=problem.N, iters=20,
    )
    assert not bool(res.success)
    assert bool(jnp.all(jnp.isfinite(res.us)))


def test_long_horizon_matches_condensed():
    problem = mpc.session2_problem(N=100)
    sys_, Q, R, x_lb, x_ub, u_lb, u_ub = _problem_data(problem)
    x0 = jnp.asarray([-140.0, 24.0], jnp.float64)
    ref = _condensed_ref(problem, x0)
    assert bool(ref.converged)
    res = stagewise_ip_solve(
        sys_.A, sys_.B, Q, R, Q, x_lb, x_ub, u_lb, u_ub, x0, N=100, iters=20
    )
    assert bool(res.success)
    np.testing.assert_allclose(
        np.asarray(res.us).ravel(), np.asarray(ref.x).ravel(), atol=1e-4
    )


def test_vmap_matches_single():
    problem = mpc.session2_problem(N=20)
    sys_, Q, R, x_lb, x_ub, u_lb, u_ub = _problem_data(problem)
    rng = np.random.default_rng(1)
    x0s = jnp.asarray(
        np.stack([rng.uniform(-140, -20, 8), rng.uniform(-15, 24, 8)], axis=1)
    )
    solve = lambda x0: stagewise_ip_solve(
        sys_.A, sys_.B, Q, R, Q, x_lb, x_ub, u_lb, u_ub, x0, N=problem.N, iters=20
    )
    batched = jax.vmap(solve)(x0s)
    for i in range(x0s.shape[0]):
        single = solve(x0s[i])
        np.testing.assert_allclose(
            np.asarray(batched.us[i]), np.asarray(single.us), atol=1e-10
        )
        assert bool(batched.success[i]) == bool(single.success)


def test_warm_start_converges_faster_or_equal():
    problem = mpc.session2_problem(N=20)
    sys_, Q, R, x_lb, x_ub, u_lb, u_ub = _problem_data(problem)
    x0 = jnp.asarray([-100.0, 20.0], jnp.float64)
    full = stagewise_ip_solve(
        sys_.A, sys_.B, Q, R, Q, x_lb, x_ub, u_lb, u_ub, x0, N=problem.N, iters=20
    )
    warm = stagewise_ip_solve(
        sys_.A, sys_.B, Q, R, Q, x_lb, x_ub, u_lb, u_ub, x0,
        u_init=full.us, N=problem.N, iters=10,
    )
    assert bool(warm.success)
    # late-horizon inputs are nearly free (R = 0.01, car already stopped), so two
    # optimal solutions can differ there; gate on the objective and the applied
    # first input, not the flat tail
    cqp = build_condensed_qp(
        sys_.A, sys_.B, Q, R, Q, problem.N, u_lb, u_ub, x_lb, x_ub
    )
    q, _, _ = cqp.qp_vectors(x0)
    P, qn = np.asarray(cqp.P), np.asarray(q)
    obj = lambda z: 0.5 * z @ P @ z + qn @ z
    z_w, z_f = np.asarray(warm.us).ravel(), np.asarray(full.us).ravel()
    assert obj(z_w) <= obj(z_f) + 1e-6 * (1 + abs(obj(z_f)))
    np.testing.assert_allclose(z_w[0], z_f[0], atol=1e-6)


def test_closed_loop_brakes_like_condensed():
    """Receding-horizon StagewiseMPC reproduces the condensed controller's
    closed loop on the session-2 braking scenario."""
    problem = mpc.session2_problem(N=20)
    dtype = jnp.float64
    system = problem.system(dtype)
    x0 = jnp.asarray([-100.0, 20.0], dtype)

    ctrl_sw = make_stagewise_mpc(problem, iters=20, dtype=dtype)
    res_sw = mpc.simulate(
        x0, system, steps=40, policy=ctrl_sw.policy(),
        policy_carry=ctrl_sw.initial_carry(dtype),
    )
    ctrl_cd = mpc.make_linear_mpc(problem, solver="pdip", iters=50, dtype=dtype)
    res_cd = mpc.simulate(
        x0, system, steps=40, policy=ctrl_cd.policy(),
        policy_carry=ctrl_cd.initial_carry(dtype),
    )
    assert bool(jnp.all(res_sw.logs["solver_success"]))
    # end state: stopped at the wall without crossing p_max
    assert float(res_sw.states[-1, 0]) <= problem.p_max + 1e-6
    assert abs(float(res_sw.states[-1, 1])) < 0.5
    np.testing.assert_allclose(
        np.asarray(res_sw.states), np.asarray(res_cd.states), atol=1e-3
    )


@pytest.mark.parametrize("N", [20, 100])
def test_parallel_kkt_matches_sequential(N):
    """parallel=True (associative-scan LQT inner solver) reproduces the
    sequential-Riccati IP solution on the session-2 family."""
    problem = mpc.session2_problem(N=N)
    sys_, Q, R, x_lb, x_ub, u_lb, u_ub = _problem_data(problem)
    x0 = jnp.asarray([-140.0, 24.0], jnp.float64)
    seq = stagewise_ip_solve(
        sys_.A, sys_.B, Q, R, Q, x_lb, x_ub, u_lb, u_ub, x0, N=N, iters=20
    )
    par = stagewise_ip_solve(
        sys_.A, sys_.B, Q, R, Q, x_lb, x_ub, u_lb, u_ub, x0, N=N, iters=20,
        parallel=True,
    )
    assert bool(seq.success) and bool(par.success)
    np.testing.assert_allclose(
        np.asarray(par.us), np.asarray(seq.us), atol=1e-6
    )


def test_ltv_stacked_dynamics():
    """Per-stage (A_k, B_k) stacks solve the time-varying problem (SQP-inner
    shape); verified against the dense KKT equality-constrained solution when no
    bounds are active."""
    rng = np.random.default_rng(2)
    N, nx, nu = 6, 2, 1
    As = jnp.asarray(np.stack([np.eye(nx) + 0.1 * rng.normal(size=(nx, nx)) for _ in range(N)]))
    Bs = jnp.asarray(rng.normal(size=(N, nx, nu)))
    Q = jnp.eye(nx)
    R = jnp.eye(nu)
    x0 = jnp.asarray([1.0, -0.5])
    inf = jnp.inf
    res = stagewise_ip_solve(
        As, Bs, Q, R, Q,
        jnp.asarray([-inf, -inf]), jnp.asarray([inf, inf]),
        jnp.asarray([-inf]), jnp.asarray([inf]),
        x0, N=N, iters=20,
    )
    # unconstrained LQ optimum via the factor/affine path directly
    Q_full = jnp.concatenate(
        [jnp.zeros((1, nx, nx)), jnp.tile(Q[None], (N, 1, 1))], axis=0
    )
    factors = lq_factor(As, Bs, Q_full, jnp.tile(R[None], (N, 1, 1)))
    xs_ref, us_ref = lq_affine_solve(
        factors, As, Bs, jnp.zeros((N + 1, nx)), jnp.zeros((N, nu)), x_init=x0
    )
    np.testing.assert_allclose(np.asarray(res.us), np.asarray(us_ref), atol=1e-8)
