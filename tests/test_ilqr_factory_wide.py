"""Wide-input factory instantiations (nu = 3, nu = 4) vs the XLA oracle.

Round 5 (VERDICT r4 item 3): the factory's backward pass solves Quu by
unrolled Cholesky for nu > 2 (``utils/smallsolve.py`` pattern on (1, T)
lanes). Certified here on two models whose Quu is genuinely dense:

- **omnidirectional base** (nx=6, nu=3): body-frame force map rotated by the
  heading — B dense in θ, 3×3 Quu coupled through Vxx;
- **thrust cluster** (nx=6, nu=4): four redundant pyramid thrusters — BᵀVxxB
  rank-deficient, the 4×4 Quu positive definite only through R.

Both run in REGULATION mode (``refs=None`` — also new in round 5), so this
file doubles as the regulation-mode certification; a dedicated test pins
regulation == zero-reference tracking. Certificates are the warm-started
stationarity + cost-dominance pattern of test_pallas_ilqr_dyn.py, via the
shared helpers in ``factory_oracle.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpreter-mode kernels (full tier)

from factory_oracle import certify_against_oracle

from model_predictive_control_tpu.models.benchmarks import (
    NU_OMNIBASE,
    NU_THRUSTER,
    NX_OMNIBASE,
    NX_THRUSTER,
    OMNIBASE_PARAMS,
    THRUSTER_PARAMS,
    make_omnibase_ode_rows,
    make_thruster_ode_rows,
)
from model_predictive_control_tpu.ops.pallas.ilqr_factory import (
    make_fused_tracker,
)

N, TS, SUB, OUTER, INNER, TILE = 6, 0.1, 2, 6, 15, 8

OMNI_LIMITS = ((-12.0, -12.0, -3.0), (12.0, 12.0, 3.0))
OMNI_WEIGHTS = ((5.0, 5.0, 1.0, 0.5, 0.5, 0.1), (0.01, 0.01, 0.005), 10.0)

THR_UMAX = 6.0
THR_LIMITS = ((0.0,) * 4, (THR_UMAX,) * 4)
THR_WEIGHTS = ((5.0, 5.0, 5.0, 0.5, 0.5, 0.5), (0.02,) * 4, 10.0)


def _omni_step():
    return make_fused_tracker(
        make_omnibase_ode_rows(OMNIBASE_PARAMS), NX_OMNIBASE, NU_OMNIBASE,
        N=N, ts=TS, substeps=SUB, limits=OMNI_LIMITS, weights=OMNI_WEIGHTS,
        outer_iters=OUTER, inner_iters=INNER, viol_tol=1e-4, tile=TILE,
    )


def test_factory_omnibase_nu3_matches_oracle():
    """nu=3 Cholesky path: regulation from displaced poses; the far scenario
    saturates the drive force; fused kernel == XLA AL-iLQR."""
    ode_rows = make_omnibase_ode_rows(OMNIBASE_PARAMS)
    x0s = jnp.asarray(
        [
            [0.6, -0.4, 0.5, 0.0, 0.0, 0.0],
            [-0.5, 0.3, -0.8, 0.2, -0.1, 0.3],
            [2.5, 0.0, 1.0, 0.0, 0.0, 0.0],  # far start -> f_fwd saturates
        ],
        jnp.float32,
    )
    sol = _omni_step()(x0s, jnp.zeros((3, N, NU_OMNIBASE), jnp.float32))
    assert bool(jnp.all(sol.converged))
    assert float(jnp.max(sol.viol)) < 1e-4
    assert float(jnp.min(sol.inner_iters_executed)) > 0
    us = np.asarray(sol.us)
    assert np.abs(us[..., 0]).max() <= 12.0 + 1e-3
    assert np.abs(us[..., 0]).max() > 12.0 - 1e-1  # force box actually binds
    certify_against_oracle(
        ode_rows, NX_OMNIBASE, NU_OMNIBASE, x0s, None, OMNI_LIMITS, None,
        OMNI_WEIGHTS, sol, N=N, ts=TS, substeps=SUB, outer_iters=OUTER,
        inner_iters=INNER, atol=5e-2,  # the warm oracle slides ~3e-2 in u on
        rel_cost_gap=5e-4,  # the saturated scenario at near-identical cost;
    )  # the 0.05% cost gap is the sharp gate


def test_factory_thruster_nu4_matches_oracle():
    """nu=4 Cholesky path on REDUNDANT actuation: regulation under gravity;
    the u >= 0 floor binds on lateral moves; fused kernel == XLA AL-iLQR."""
    ode_rows = make_thruster_ode_rows(THRUSTER_PARAMS)
    x0s = jnp.asarray(
        [
            [0.4, -0.3, 0.5, 0.0, 0.0, 0.0],
            [-0.6, 0.2, -0.4, 0.1, 0.0, -0.2],
            [1.5, 1.5, 0.0, 0.5, -0.5, 0.0],  # hard lateral -> floor binds
        ],
        jnp.float32,
    )
    step = make_fused_tracker(
        ode_rows, NX_THRUSTER, NU_THRUSTER,
        N=N, ts=TS, substeps=SUB, limits=THR_LIMITS, weights=THR_WEIGHTS,
        outer_iters=OUTER, inner_iters=INNER, viol_tol=1e-4, tile=TILE,
    )
    sol = step(x0s, jnp.zeros((3, N, NU_THRUSTER), jnp.float32))
    assert bool(jnp.all(sol.converged))
    assert float(jnp.max(sol.viol)) < 1e-4
    us = np.asarray(sol.us)
    assert us.min() >= -1e-3  # thrust floor respected ...
    assert us.min() < 1e-2  # ... and actually binding on the lateral case
    assert us.max() <= THR_UMAX + 1e-3
    certify_against_oracle(
        ode_rows, NX_THRUSTER, NU_THRUSTER, x0s, None, THR_LIMITS, None,
        THR_WEIGHTS, sol, N=N, ts=TS, substeps=SUB, outer_iters=OUTER,
        inner_iters=INNER, atol=5e-2,  # redundant actuation: the warm oracle
        rel_cost_gap=5e-4,  # slides ~3e-2 in u near the u>=0 boundary at
    )  # near-identical cost; the 0.05% cost gap is the sharp gate


def test_thruster_sweep_closed_loop():
    """The nu=4 tier's gated workload (thruster_sweep) at toy size on the
    interpreter: the loop runs, steady-state solves converge, and the loiter
    is tracked under (mass, drag) plant mismatch."""
    from model_predictive_control_tpu.parallel.batch import thruster_sweep

    res, s = thruster_sweep(
        4, 6, key=jax.random.PRNGKey(0), N=4, pred_substeps=1,
        plant_substeps=4, outer_iters=3, inner_iters=6, tile=8,
    )
    assert s["model"] == "thrust-cluster-nu4"
    succ = np.asarray(res.logs["solver_success"])
    assert succ[2:].all()
    err = np.asarray(res.logs["tracking_error"])
    assert err[-1].mean() < 0.1
    assert np.isfinite(np.asarray(res.states)).all()


def test_regulation_equals_zero_reference_tracking():
    """refs=None (regulation mode, no ref buffer in VMEM) must reproduce the
    already-certified tracking path with an all-zero reference."""
    x0s = jnp.asarray(
        [[0.6, -0.4, 0.5, 0.0, 0.0, 0.0], [-0.5, 0.3, -0.8, 0.2, -0.1, 0.3]],
        jnp.float32,
    )
    u0 = jnp.zeros((2, N, NU_OMNIBASE), jnp.float32)
    step = _omni_step()
    sol_reg = step(x0s, u0)
    sol_trk = step(x0s, u0, jnp.zeros((2, N + 1, NX_OMNIBASE), jnp.float32))
    np.testing.assert_allclose(
        np.asarray(sol_reg.us), np.asarray(sol_trk.us), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(sol_reg.xs), np.asarray(sol_trk.xs), atol=1e-6
    )
    assert bool(jnp.all(sol_reg.converged == sol_trk.converged))
