"""Batched MHE-in-the-loop output feedback (round 4, VERDICT r3 item 2):
``parallel/batch.py::mhe_loop_sweep`` — session-2 braking closed on noisy
position measurements at batch scale, bounded linear-MHE windows + soft-state
MPC both on the fused ADMM kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from model_predictive_control_tpu.parallel.batch import mhe_loop_sweep


def test_mhe_loop_regulates_and_estimates():
    res, s = mhe_loop_sweep(
        6, 40, key=jax.random.PRNGKey(1), tile=8,
    )
    # estimation at the measurement-noise level once the window is real
    assert s["est_rmse_pos"] < 0.15, s
    assert s["est_rmse_vel"] < 0.15, s
    assert s["mhe_converged_rate"] > 0.99, s
    # the braking loop regulates to the origin from every start
    assert s["median_final_pos"] < 0.5, s
    # solver health (the ~5% failures are the slack-activation transient,
    # characterized in the sweep docstring; estimates are unaffected)
    assert s["success_rate"] > 0.85, s
    # per-scenario estimate tracks the true state after warm-up
    est = np.asarray(res.logs["state_estimate"])
    true = np.asarray(res.states[:-1])
    tail_err = np.abs(est - true)[s["M"] + 2 :]
    assert tail_err[..., 0].max() < 1.0  # position: worst case ~10 sigma
