"""Model-parametric fused tracker factory vs the XLA AL-iLQR oracle.

Proves ``ops/pallas/ilqr_factory.py`` is model-parametric *in practice*: the
same kernel body that ships the Pacejka tier compiles and solves for

- a **cart-pole** (nx=4, **nu=1** — exercising the scalar Quu branch), and
- a **planar quadrotor** (nx=6, nu=2, asymmetric thrust bounds ≥ 0, plus the
  factory's optional **state box** on the tilt angle),

in Pallas interpreter mode on CPU against ``solvers/ilqr.py::al_ilqr_solve``
on the identical OCP (same RK4-substepped prediction via ``rk4_fine`` +
``rowform_to_vector``, same diagonal tracking cost, same AL rows in the same
order). Interpreter-mode compiles are expensive, so each model family uses
ONE static kernel configuration and ONE kernel call whose solution feeds all
assertions (the pattern of ``test_pallas_ilqr_dyn.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from model_predictive_control_tpu.models.benchmarks import (
    CARTPOLE_PARAMS,
    NX_CARTPOLE,
    NX_QUADROTOR,
    QUADROTOR_PARAMS,
    make_cartpole_ode_rows,
    make_planar_quadrotor_ode_rows,
)
from model_predictive_control_tpu.ops.integrators import rk4_fine
from model_predictive_control_tpu.ops.pallas.ilqr_factory import (
    fused_tracker_solve,
    make_fused_tracker,
    rowform_to_vector,
)
from model_predictive_control_tpu.solvers.ilqr import ILQRProblem, al_ilqr_solve

N, TS, SUB, OUTER, INNER, TILE = 6, 0.1, 2, 6, 15, 8


def _xla_solve_batch(ode_rows, nx, nu, x0s, refs, limits, state_limits,
                     weights, u_init=None):
    """vmap(al_ilqr_solve) on the OCP the kernel solves — constraint rows in
    the kernel's order: [u-ub, lb-u] (+ [x-ubx, lbx-x] with a state box)."""
    ode = rowform_to_vector(ode_rows, nx, nu)
    pred = rk4_fine(ode, TS, substeps=SUB)
    lb_u = jnp.asarray(limits[0], jnp.float32)
    ub_u = jnp.asarray(limits[1], jnp.float32)
    Qd = jnp.asarray(weights[0], jnp.float32)
    Rd = jnp.asarray(weights[1], jnp.float32)
    QNd = weights[2] * Qd
    nc = 2 * nu
    if state_limits is not None:
        lb_x = jnp.asarray(state_limits[0], jnp.float32)
        ub_x = jnp.asarray(state_limits[1], jnp.float32)
        nc += 2 * nx

    def cons(xx, uu, t):
        rows = [uu - ub_u, lb_u - uu]
        if state_limits is not None:
            rows += [xx - ub_x, lb_x - xx]
        return jnp.concatenate(rows)

    def one(x0, window, ui):
        def stage_cost(xx, uu, t):
            e = xx - window[t]
            return e @ (Qd * e) + uu @ (Rd * uu)

        prob = ILQRProblem(
            dynamics=lambda xx, uu, t: pred(xx, uu),
            stage_cost=stage_cost,
            terminal_cost=lambda xx: (xx - window[N]) @ (QNd * (xx - window[N])),
            N=N, nx=nx, nu=nu,
        )
        return al_ilqr_solve(
            prob, cons, nc, x0, u_init=ui, outer_iters=OUTER,
            inner_iters=INNER, viol_tol=1e-4,
        )

    if u_init is None:
        u_init = jnp.zeros((x0s.shape[0], N, nu), jnp.float32)
    return jax.jit(jax.vmap(one))(x0s, refs, u_init)


def _ocp_cost(ode_rows, nx, nu, us, window, x0, weights):
    """f64 cost of a control sequence under the shared OCP."""
    ode = rowform_to_vector(ode_rows, nx, nu)
    pred = rk4_fine(ode, TS, substeps=SUB)
    Qd = np.asarray(weights[0], np.float64)
    Rd = np.asarray(weights[1], np.float64)
    QNd = weights[2] * Qd
    x = jnp.asarray(x0, jnp.float64)
    c = 0.0
    for t in range(N):
        e = np.asarray(x) - np.asarray(window[t], np.float64)
        u = np.asarray(us[t], np.float64)
        c += e @ (Qd * e) + u @ (Rd * u)
        x = pred(x, jnp.asarray(us[t], jnp.float64))
    e = np.asarray(x) - np.asarray(window[N], np.float64)
    return c + e @ (QNd * e)


def _check_against_oracle(ode_rows, nx, nu, x0s, refs, limits, state_limits,
                          weights, sol_k, atol):
    # stationarity certificate: the x64 XLA oracle STARTED AT the kernel's
    # solution must stay there (it may slide along a flat AL valley — an
    # active state box leaves near-equivalent points within tolerance, with
    # u-space tie-breaks between them — so the SHARP gate is cost
    # equivalence: the warm oracle must neither improve on the kernel's
    # cost nor land anywhere materially worse)
    sol_w = _xla_solve_batch(
        ode_rows, nx, nu, x0s, refs, limits, state_limits, weights,
        u_init=sol_k.us,
    )
    np.testing.assert_allclose(
        np.asarray(sol_w.us), np.asarray(sol_k.us), atol=atol
    )
    for i in range(x0s.shape[0]):
        ck = _ocp_cost(ode_rows, nx, nu, np.asarray(sol_k.us[i]), refs[i],
                       x0s[i], weights)
        cw = _ocp_cost(ode_rows, nx, nu, np.asarray(sol_w.us[i]), refs[i],
                       x0s[i], weights)
        # fixed-budget AL agreement: ≤ 0.05% relative cost gap (the final
        # inner solve after the last λ update is not a full re-polish)
        assert abs(cw - ck) <= 5e-4 * (1.0 + abs(ck)), (i, ck, cw)
    # and the kernel's point is never WORSE than the cold XLA solve
    sol_x = _xla_solve_batch(
        ode_rows, nx, nu, x0s, refs, limits, state_limits, weights
    )
    for i in range(x0s.shape[0]):
        ck = _ocp_cost(ode_rows, nx, nu, np.asarray(sol_k.us[i]), refs[i],
                       x0s[i], weights)
        cx = _ocp_cost(ode_rows, nx, nu, np.asarray(sol_x.us[i]), refs[i],
                       x0s[i], weights)
        assert ck <= cx + 5e-4 * (1.0 + abs(cx)), (i, ck, cx)


@pytest.mark.slow
def test_factory_cartpole_nu1_matches_oracle():
    """nu=1 instantiation: cart-pole regulation to the down equilibrium with
    a binding force box; fused kernel == XLA AL-iLQR on the same OCP."""
    ode_rows = make_cartpole_ode_rows(CARTPOLE_PARAMS)
    nx, nu = NX_CARTPOLE, 1
    limits = ((-3.0,), (3.0,))
    weights = ((1.0, 2.0, 0.1, 0.1), (0.01,), 10.0)

    x0s = jnp.asarray(
        [
            [0.4, 0.5, 0.0, -0.2],
            [-0.3, -0.4, 0.2, 0.0],
            [2.0, 0.2, 0.0, 0.0],  # far cart -> force saturates
        ],
        jnp.float32,
    )
    refs = jnp.zeros((3, N + 1, nx), jnp.float32)

    step = make_fused_tracker(
        ode_rows, nx, nu, N=N, ts=TS, substeps=SUB, limits=limits,
        weights=weights, outer_iters=OUTER, inner_iters=INNER,
        viol_tol=1e-4, tile=TILE,
    )
    sol = step(x0s, jnp.zeros((3, N, nu), jnp.float32), refs)
    assert bool(jnp.all(sol.converged))
    assert float(jnp.max(sol.viol)) < 1e-4
    us2 = np.asarray(sol.us[2])
    assert us2.min() >= -3.0 - 1e-3  # box respected ...
    assert us2.min() < -3.0 + 1e-2  # ... and actually binding
    _check_against_oracle(
        ode_rows, nx, nu, x0s, refs, limits, None, weights, sol, atol=5e-3
    )


@pytest.mark.slow
def test_factory_quadrotor_state_box_matches_oracle():
    """nx=6/nu=2 instantiation with asymmetric thrust bounds AND the optional
    state box (tilt |θ| ≤ 0.4): fused kernel == XLA AL-iLQR, box respected."""
    ode_rows = make_planar_quadrotor_ode_rows(QUADROTOR_PARAMS)
    nx, nu = NX_QUADROTOR, 2
    m, _, _, g = QUADROTOR_PARAMS
    u_max = 1.5 * m * g
    limits = ((0.0, 0.0), (u_max, u_max))
    big = 50.0
    state_limits = (
        (-big, -big, -0.4, -big, -big, -big),
        (big, big, 0.4, big, big, big),
    )
    weights = ((5.0, 5.0, 1.0, 0.5, 0.5, 0.1), (0.02, 0.02), 10.0)

    x0s = jnp.asarray(
        [
            [0.5, -0.3, 0.1, 0.0, 0.0, 0.0],
            [-0.8, 0.4, -0.2, 0.2, -0.1, 0.1],
            [1.5, 0.0, 0.3, 0.5, 0.0, 0.0],  # aggressive translation
        ],
        jnp.float32,
    )
    refs = jnp.zeros((3, N + 1, nx), jnp.float32)

    sol = fused_tracker_solve(
        x0s, jnp.zeros((3, N, nu), jnp.float32), refs,
        ode_rows=ode_rows, nx=nx, nu=nu, N=N, ts=TS, substeps=SUB,
        limits=limits, state_limits=state_limits, weights=weights,
        outer_iters=OUTER, inner_iters=INNER, viol_tol=1e-4, tile=TILE,
    )
    assert bool(jnp.all(sol.converged))
    assert float(jnp.max(sol.viol)) < 1e-4
    us = np.asarray(sol.us)
    assert us.min() >= -1e-3  # thrusts stay nonnegative
    assert us.max() <= u_max + 1e-3
    th = np.asarray(sol.xs[..., 2])
    assert np.abs(th).max() <= 0.4 + 1e-3  # state box respected
    _check_against_oracle(
        ode_rows, nx, nu, x0s, refs, limits, state_limits, weights, sol,
        atol=0.3,  # u-space tie-breaks on the box boundary; cost is the gate
    )


@pytest.mark.slow
def test_quadrotor_sweep_closed_loop():
    """The factory tier's gated workload (quadrotor_sweep) at toy size on the
    interpreter: the loop runs, every steady-state solve converges, and the
    loiter reference is actually tracked under plant mismatch."""
    from model_predictive_control_tpu.parallel.batch import quadrotor_sweep

    res, s = quadrotor_sweep(
        4, 6, key=jax.random.PRNGKey(0), N=4, pred_substeps=1,
        plant_substeps=4, outer_iters=3, inner_iters=6, tile=8,
    )
    assert s["model"] == "planar-quadrotor"
    succ = np.asarray(res.logs["solver_success"])
    assert succ[2:].all()  # steady state: every solve converges
    # tracked: final tracking error well under the initial perturbation scale
    err = np.asarray(res.logs["tracking_error"])
    assert err[-1].mean() < 0.1
    assert np.isfinite(np.asarray(res.states)).all()


def test_rowform_to_vector_adapter():
    """The adapter and the row form agree — one ODE definition serves both
    the fused kernel and the XLA/integrator paths."""
    ode_rows = make_cartpole_ode_rows(CARTPOLE_PARAMS)
    ode = rowform_to_vector(ode_rows, NX_CARTPOLE, 1)
    x = jnp.asarray([0.3, 0.7, -0.2, 0.5])
    u = jnp.asarray([1.5])
    xdot = ode(x, u)
    rows = ode_rows(tuple(x[i] for i in range(4)), (u[0],))
    np.testing.assert_allclose(np.asarray(xdot), np.asarray(jnp.stack(rows)))
    # sanity: velocities pass through
    np.testing.assert_allclose(np.asarray(xdot[:2]), np.asarray(x[2:]))


def test_factory_rejects_wide_inputs():
    """nu > 8 is an explicit scope guard, not a silent miscompile (nu <= 8 is
    in scope since round 5's unrolled-Cholesky Quu solve — see
    test_factory_nu3/nu4 for the certified wide-input paths)."""
    ode_rows = make_cartpole_ode_rows(CARTPOLE_PARAMS)
    with pytest.raises(NotImplementedError, match="nu <= 8"):
        fused_tracker_solve(
            jnp.zeros((2, 4), jnp.float32),
            jnp.zeros((2, N, 9), jnp.float32),
            jnp.zeros((2, N + 1, 4), jnp.float32),
            ode_rows=ode_rows, nx=4, nu=9, N=N, ts=TS, substeps=SUB,
            limits=((0.0,) * 9, (1.0,) * 9),
            weights=((1.0,) * 4, (0.1,) * 9, 10.0),
            tile=TILE,
        )
