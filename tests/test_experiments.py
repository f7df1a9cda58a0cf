"""Experiment-driver (L7) tests: the reference's exercise semantics as assertions
instead of plots (SURVEY.md §4 build-side plan)."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # oracle-heavy / long-running (full tier)

from model_predictive_control_tpu.experiments import (
    closed_loop_linear_mpc,
    cost_to_go_comparison,
    horizon_sweep,
    integrator_accuracy,
    mismatch_open_loop,
    open_loop_parking,
    relative_error,
)
from model_predictive_control_tpu import cli as mpc_cli


def test_horizon_sweep_short_horizon_destabilizes():
    # FHC.py exercise 3: N=4 diverges, N>=10 converges
    res = horizon_sweep(horizons=(4, 10), steps=30, dtype=jnp.float64)
    assert res[4]["unstable"] is True
    assert res[10]["unstable"] is False
    assert np.linalg.norm(res[10]["states"][-1]) < 1e-2
    # predictions: (steps, N+1, nx), starting at the closed-loop state
    preds = np.asarray(res[10]["predictions"])
    assert preds.shape == (30, 11, 2)
    np.testing.assert_allclose(
        preds[:, 0], np.asarray(res[10]["states"][:-1]), rtol=1e-12
    )


def test_cost_to_go_monotone_to_dare():
    hs, finite, v_inf, K_inf = cost_to_go_comparison(
        horizons=range(1, 10), dtype=jnp.float64
    )
    finite = np.asarray(finite)
    # finite-horizon cost-to-go with Pf=Q underestimates and converges to V∞
    assert abs(finite[-1] - v_inf) < abs(finite[0] - v_inf)
    assert abs(finite[-1] - v_inf) / v_inf < 0.05
    assert K_inf.shape == (1, 2)


def test_closed_loop_linear_mpc_summary():
    from model_predictive_control_tpu.experiments import session23

    summary = session23.run(session=2, N=10, steps=30, iters=150)
    assert summary["constraints_respected"]
    assert summary["success_rate"] > 0.9
    assert abs(summary["final_state"][0]) < 1.5  # stopped near the wall
    json.dumps(summary)  # JSON-able


def test_integrator_accuracy_ordering():
    errs = integrator_accuracy(ts_values=(0.1,), steps=40, dtype=jnp.float64)[0.1]
    # order: euler worst, rk4 best (exercise-1 semantics as an assertion)
    assert errs["euler"].max() > errs["heun"].max() > errs["rk4"].max()
    assert errs["rk4"].max() < 1e-5


def test_relative_error_formula():
    a = np.array([[2.0, 0.0], [4.0, 0.0]])
    b = np.array([[1.0, 0.0], [4.0, 0.0]])
    err = relative_error(a, b)
    np.testing.assert_allclose(err, [1.0 / 3.0, 0.0])


@pytest.mark.parametrize("fn", [open_loop_parking, mismatch_open_loop])
def test_open_loop_parking_experiments(fn):
    u_plan, x_a, x_b, rel = fn(N=12, ts=0.1, sqp_iters=10)
    assert u_plan.shape == (12, 2)
    assert x_a.shape == x_b.shape == (13, 4)
    assert np.all(np.isfinite(rel)) and rel.shape == (13,)
    # plans respect the input box
    assert float(jnp.max(jnp.abs(u_plan[:, 0]))) <= 1.0 + 1e-4
    if fn is mismatch_open_loop:
        assert rel[1:].max() > 0.0  # mismatch actually diverges the rollout


def test_cli_session1_and_session2(tmp_path, capsys):
    assert mpc_cli.main(["session1", "--steps", "12", "--outdir", str(tmp_path)]) == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "v_inf" in out1 and (tmp_path / "session1_cost_to_go.png").exists()

    assert (
        mpc_cli.main(
            ["session2", "--horizon", "8", "--steps", "15", "--iters", "120"]
        )
        == 0
    )
    out2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out2["constraints_respected"]


def test_cli_podscale_xla_backend(capsys):
    assert (
        mpc_cli.main(
            [
                "podscale",
                "--batch", "32",
                "--steps", "4",
                "--horizon", "6",
                "--iters", "40",
                "--backend", "xla",
            ]
        )
        == 0
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["solves_per_s"] > 0 and out["batch"] == 32


def test_sol_scenario_constants_match_reference():
    """Pins exercise-3/4/5's start state to session4_sol.py:344,393,447."""
    import inspect

    from model_predictive_control_tpu.experiments import session4

    assert session4.SOL_X0 == (0.6, -0.25, 0.0, 0.0)
    assert session4.SOL_N == 50 and session4.SOL_TS == 0.05
    assert session4.MAIN_X0 == (0.3, -0.1, 0.0, 0.0)
    for fn in (open_loop_parking, mismatch_open_loop):
        assert inspect.signature(fn).parameters["x0"].default == session4.SOL_X0


@pytest.mark.slow
def test_closed_loop_sol_variant_starts_from_reference_x0():
    from model_predictive_control_tpu.experiments import session4

    res, _, _ = session4.closed_loop_parking(
        variant="sol", steps=1, sqp_iters=2, qp_iters=10
    )
    np.testing.assert_allclose(
        np.asarray(res.states[0]), np.asarray(session4.SOL_X0), atol=0
    )


@pytest.mark.slow
def test_two_plant_closed_loop_exercise5():
    """Exercise-5 semantics (session4_sol.py:443-481): same controller, two
    plants; the mismatched run deviates from the model run but still parks."""
    from model_predictive_control_tpu.experiments import session4

    res_model, res_exact, rel, _ = session4.two_plant_closed_loop(
        steps=40, sqp_iters=10
    )
    assert np.asarray(res_model.states).shape == np.asarray(res_exact.states).shape
    assert np.all(np.isfinite(rel)) and rel.shape == (41,)
    assert rel[1:].max() > 1e-4  # the mismatch is visible
    # both runs drive toward the spot from [0.6, -0.25]
    assert np.linalg.norm(np.asarray(res_model.states)[-1, :2]) < 0.15
    assert np.linalg.norm(np.asarray(res_exact.states)[-1, :2]) < 0.25


def test_cli_tune_and_estimate(tmp_path, capsys):
    """Round-2 subcommands: gradient weight tuning + output-feedback demo."""
    assert (
        mpc_cli.main(
            ["tune", "--updates", "3", "--batch", "3", "--steps", "8",
             "--iters", "200", "--outdir", str(tmp_path)]
        )
        == 0
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["final_loss"] < out["initial_loss"]
    assert (tmp_path / "tuning_loss.png").exists()

    assert (
        mpc_cli.main(
            ["estimate", "--steps", "20", "--horizon", "10",
             "--outdir", str(tmp_path)]
        )
        == 0
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["success_rate"] == 1.0
    assert out["est_rmse_pos"] < 0.3
    assert (tmp_path / "estimation_demo.png").exists()
