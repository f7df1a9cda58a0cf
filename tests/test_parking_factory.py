"""The flagship obstacle-parking OCP through the fused-tracker FACTORY vs
the hand-specialized kernel and the XLA oracle.

Round 5 (VERDICT r4 item 2a): two independent fused implementations of the
reference's flagship problem (``session_4/main.py:41-113``) — the
hand-written ``ilqr_kernel.py`` (analytic pair-packed clearance derivatives)
and the factory instantiation ``parking_factory.py`` (packed-jvp derivatives
of user rows) — must land on the same solutions, and the factory's point
must survive the warm-started x64-oracle stationarity certificate.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpreter-mode kernels (full tier)

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.ops.pallas.ilqr_kernel import (
    al_ilqr_solve_pallas,
    parking_geometry,
)
from model_predictive_control_tpu.ops.pallas.parking_factory import (
    al_ilqr_parking_solve_factory,
)
from model_predictive_control_tpu.solvers.parking import (
    Q_MAIN,
    QN_SCALE_MAIN,
    R_MAIN,
    make_parking_ilqr,
)

X_OBS = (0.25, 0.0, 0.0, 0.0)
# outer/inner above the sweep budget: at (6, 15) two of the draws sit within
# 10% of the 1e-4 violation gate, where mere float-association changes flip
# the flag chaotically between two correct implementations; the deeper
# budget makes every draw settle decisively on both backends
N, TS, OUTER, INNER, TILE = 8, 0.08, 8, 25, 8


def _weights():
    return (
        tuple(float(q) for q in Q_MAIN),
        tuple(float(r) for r in R_MAIN),
        float(QN_SCALE_MAIN),
    )


def _setup(x_obs):
    params = mpc.VehicleParameters()
    geom, limits = parking_geometry(params, x_obs, n_circles=3)
    accv = float(params.acceleration)
    fricv = float(params.friction)
    return params, geom, limits, accv, fricv


def _factory_solve(x0s, x_obs, **kw):
    params, geom, limits, accv, fricv = _setup(x_obs)
    B = x0s.shape[0]
    return al_ilqr_parking_solve_factory(
        x0s,
        jnp.zeros((B, N, 2), jnp.float32),
        jnp.full((B,), accv, jnp.float32),
        jnp.full((B,), fricv, jnp.float32),
        N=N, ts=TS, geom=geom, limits=limits, weights=_weights(),
        n_circles=0 if x_obs is None else 3,
        outer_iters=OUTER, inner_iters=INNER, viol_tol=1e-4, tile=TILE,
        **kw,
    )


def _hand_solve(x0s, x_obs):
    params, geom, limits, accv, fricv = _setup(x_obs)
    B = x0s.shape[0]
    return al_ilqr_solve_pallas(
        x0s,
        jnp.zeros((B, N, 2), jnp.float32),
        jnp.full((B,), accv, jnp.float32),
        jnp.full((B,), fricv, jnp.float32),
        N=N, ts=TS, geom=geom, limits=limits, weights=_weights(),
        n_circles=0 if x_obs is None else 3,
        outer_iters=OUTER, inner_iters=INNER, viol_tol=1e-4, tile=TILE,
    )


def _ocp_cost_f64(us, x0, params, x_obs):
    """f64 parking cost of a control sequence (regulation, Euler model)."""
    from model_predictive_control_tpu.models.bicycle import (
        kinematic_bicycle_ode,
    )
    from model_predictive_control_tpu.ops.integrators import euler

    Qd = np.asarray(Q_MAIN, np.float64)
    Rd = np.asarray(R_MAIN, np.float64)
    QNd = QN_SCALE_MAIN * Qd
    step = euler(lambda x, u: kinematic_bicycle_ode(params, x, u), TS)
    x = jnp.asarray(x0, jnp.float64)
    c = 0.0
    for t in range(N):
        u = np.asarray(us[t], np.float64)
        c += np.asarray(x) @ (Qd * np.asarray(x)) + u @ (Rd * u)
        x = step(x, jnp.asarray(us[t], jnp.float64))
    return c + np.asarray(x) @ (QNd * np.asarray(x))


def test_parking_factory_matches_hand_kernel_obstacle():
    """Same OCP, two fused implementations (hand-analytic vs packed-jvp
    derivatives): agreeing convergence flags, controls within the
    hand-vs-XLA band, clearance respected, and cost equality to 0.1%."""
    params = mpc.VehicleParameters()
    x0s = jnp.asarray(
        [
            [0.3, -0.1, 0.0, 0.0],  # the reference main() start
            [0.15, -0.2, -0.2, -0.02],
            [0.5, 0.15, 0.3, 0.05],
        ],
        jnp.float32,
    )
    sol_f = _factory_solve(x0s, X_OBS)
    sol_h = _hand_solve(x0s, X_OBS)
    # the factory must never be WORSE than the hand kernel: every lane the
    # hand kernel converges, the factory converges too (measured: the factory
    # also converges the third draw — viol 9.4e-5 — where the hand kernel
    # lands at 1.4e-4, so flag equality would be too strict the right way)
    conv_h = np.asarray(sol_h.converged)
    conv_f = np.asarray(sol_f.converged)
    assert (conv_f | ~conv_h).all(), (conv_f, conv_h)
    assert float(jnp.max(sol_f.viol)) < 1e-4
    du = np.max(np.abs(np.asarray(sol_f.us) - np.asarray(sol_h.us)), axis=(1, 2))
    both = conv_f & conv_h
    # element gate is loose (the swing-around draw admits nearby distinct
    # local optima at ~1e-2 u-distance); the 0.1% cost-equality below is
    # the sharp equivalence statement
    assert np.all(du[both] < 5e-2), du
    for i in range(x0s.shape[0]):
        if not both[i]:
            continue
        cf = _ocp_cost_f64(np.asarray(sol_f.us[i]), x0s[i], params, X_OBS)
        ch = _ocp_cost_f64(np.asarray(sol_h.us[i]), x0s[i], params, X_OBS)
        assert abs(cf - ch) <= 1e-3 * (1.0 + abs(ch)), (i, cf, ch)


def test_parking_factory_stationarity_certificate():
    """The warm-started x64 XLA oracle (make_parking_ilqr semantics — the
    IPOPT-class bar, session_4/main.py:39,116) must not find a point that is
    both FEASIBLE (viol ≤ 1e-4, the solve's own tolerance class) and
    materially cheaper than the factory's solution.

    (A plain u-atol gate is fragile on this OCP: measured, the warm oracle
    can slide 0.08 along an ACTIVE clearance boundary, trading 0.2% cost for
    3× the constraint violation — that movement does not refute
    stationarity within the feasible class.)"""
    params = mpc.VehicleParameters()
    x0s = jnp.asarray(
        [[0.3, -0.1, 0.0, 0.0], [0.15, -0.2, -0.2, -0.02]], jnp.float32
    )
    sol_f = _factory_solve(x0s, X_OBS)
    assert bool(jnp.all(sol_f.converged))
    prob, cons, nc = make_parking_ilqr(
        params, N, TS, x_obs=jnp.asarray(X_OBS, jnp.float32),
        dtype=jnp.float32,
    )
    sol_w = jax.vmap(
        lambda x, ui: mpc.al_ilqr_solve(
            prob, cons, nc, x, u_init=ui, outer_iters=OUTER,
            inner_iters=INNER, viol_tol=1e-4,
        )
    )(x0s, sol_f.us)
    for i in range(x0s.shape[0]):
        cf = _ocp_cost_f64(np.asarray(sol_f.us[i]), x0s[i], params, X_OBS)
        cw = _ocp_cost_f64(np.asarray(sol_w.us[i]), x0s[i], params, X_OBS)
        if float(sol_w.viol[i]) <= 1e-4:
            # feasible warm point: it must not beat ours by more than 0.1%
            assert cw >= cf - 1e-3 * (1.0 + abs(cf)), (i, cf, cw)
        else:
            # the oracle left the feasible class; any cost gain is bought
            # with violation and does not refute the factory's point
            assert cw <= cf + 1.0  # sanity: it did not blow up


def test_parking_factory_no_obstacle_and_lam_roundtrip():
    """No-obstacle variant (n_extra=0 path) matches the hand kernel; feeding
    the converged multipliers back as lam_init reproduces the solution (the
    receding-horizon warm-start handle round-trips)."""
    x0s = jnp.asarray(
        [[0.3, -0.1, 0.0, 0.0], [0.45, 0.12, 0.3, 0.05]], jnp.float32
    )
    sol_f = _factory_solve(x0s, None)
    sol_h = _hand_solve(x0s, None)
    assert bool(jnp.all(sol_f.converged))
    np.testing.assert_allclose(
        np.asarray(sol_f.us), np.asarray(sol_h.us), atol=2e-3
    )
    sol_r = _factory_solve(x0s, None, lam_init=sol_f.lam)
    assert bool(jnp.all(sol_r.converged))
    np.testing.assert_allclose(
        np.asarray(sol_r.us), np.asarray(sol_f.us), atol=1e-3
    )
    # warm multipliers must not cost MORE work
    assert float(jnp.max(sol_r.inner_iters_executed)) <= float(
        jnp.max(sol_f.inner_iters_executed)
    )
