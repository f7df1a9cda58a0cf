"""Native C++ NLP oracle (``native/nlp_oracle.cpp``) vs scipy and JAX solvers.

The reference's nonlinear solver tier is CasADi+IPOPT (native C++); this suite
certifies the in-repo native replacement: dual-number AD + SQP + Newton active-set
polish. Gates: tight self-certified KKT, u-trajectory agreement with the
independent scipy oracle, and certification of third-party solutions.
"""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle-heavy / long-running (full tier)

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.oracle.native_nlp import (
    closed_loop_parking_native,
    solve_parking_native,
)
from model_predictive_control_tpu.oracle.parking_oracle import solve_parking_nlp
from model_predictive_control_tpu.solvers.parking import (
    Q_SOL,
    QN_SCALE_SOL,
    make_parking_ocp,
)

X0 = np.array([0.3, -0.1, 0.0, 0.0])
X_OBS = np.array([0.25, 0.0, 0.0, 0.0])


@pytest.fixture(scope="module")
def params():
    return mpc.VehicleParameters()


class TestNativeNLP:
    def test_sol_variant_matches_scipy(self, params):
        """No-obstacle sol variant (session4_sol.py:132-217 semantics)."""
        N, ts = 10, 0.05
        u_nat, info = solve_parking_native(
            params, N, ts, X0, Q=Q_SOL, qn_scale=QN_SCALE_SOL, tol=1e-7
        )
        assert info["converged"]
        assert info["kkt_res"] < 1e-7
        assert info["viol"] < 1e-8
        ocp = make_parking_ocp(
            params, N, ts, x_obs=None, Q=Q_SOL, qn_scale=QN_SCALE_SOL,
            dtype=jnp.float64,
        )
        u_sci, sci_info = solve_parking_nlp(ocp, X0)
        # ≤1e-4 gate (BASELINE): both solvers at the same KKT point
        assert float(np.max(np.abs(u_nat - np.asarray(u_sci)))) < 1e-4
        assert abs(info["cost"] - sci_info["cost"]) < 1e-8

    def test_obstacle_variant_matches_scipy(self, params):
        """Obstacle variant (main.py:41-113), 9 clearance constraints/stage."""
        N, ts = 12, 0.08
        u_nat, info = solve_parking_native(params, N, ts, X0, x_obs=X_OBS, tol=1e-6)
        assert info["converged"]
        assert info["viol"] < 1e-8
        ocp = make_parking_ocp(
            params, N, ts, x_obs=jnp.asarray(X_OBS, jnp.float64),
            dtype=jnp.float64,
        )
        u_sci, _ = solve_parking_nlp(ocp, X0)
        assert float(np.max(np.abs(u_nat - np.asarray(u_sci)))) < 1e-4

    def test_certifies_foreign_solution(self, params):
        """Warm-started at scipy's optimum the solver certifies it in 0
        iterations — the oracle doubles as an independent KKT verifier."""
        N, ts = 30, 0.08
        ocp = make_parking_ocp(
            params, N, ts, x_obs=jnp.asarray(X_OBS, jnp.float64),
            dtype=jnp.float64,
        )
        u_sci, _ = solve_parking_nlp(ocp, X0)
        u_nat, info = solve_parking_native(
            params, N, ts, X0, x_obs=X_OBS, u_init=np.asarray(u_sci), tol=1e-6
        )
        assert info["converged"]
        assert info["iters"] == 0
        np.testing.assert_allclose(u_nat, np.asarray(u_sci), atol=0.0)

    def test_rk4_integrator_variant(self, params):
        """template.py:141 uses RK4 as the prediction model."""
        u_nat, info = solve_parking_native(
            params, 8, 0.05, X0, Q=Q_SOL, qn_scale=QN_SCALE_SOL,
            integrator="rk4", tol=1e-7,
        )
        assert info["converged"]
        # RK4 and Euler predictions differ → different optimal controls
        u_eul, _ = solve_parking_native(
            params, 8, 0.05, X0, Q=Q_SOL, qn_scale=QN_SCALE_SOL, tol=1e-7
        )
        assert float(np.max(np.abs(u_nat - u_eul))) > 1e-6

    def test_closed_loop_parks_the_car(self, params):
        """Native receding-horizon loop (exercise-5 semantics) drives the car
        toward the origin under the accurate (RK4-substeps) plant."""
        states, inputs, success = closed_loop_parking_native(
            params, N=10, ts=0.08, x0=X0, steps=15, x_obs=X_OBS,
            max_iters=60, tol=1e-5,
        )
        assert states.shape == (16, 4)
        assert np.all(np.isfinite(states))
        assert success.mean() > 0.5
        # position error shrinks substantially
        assert np.linalg.norm(states[-1, :2]) < 0.3 * np.linalg.norm(states[0, :2])
        # inputs respect the box
        assert np.all(inputs[:, 0] <= params.max_drive + 1e-12)
        assert np.all(np.abs(inputs[:, 1]) <= params.max_steer + 1e-12)
