"""Observability + visualization layer tests (SURVEY.md §5.1/§5.4/§5.5, L8).

The reference validates plots by eyeball (session_4/plotting.py); here we assert
the figures build headlessly and the metrics/checkpoint round-trips are exact.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.obs import (
    MetricsLogger,
    Timer,
    summarize_run,
    save_sweep_state,
    load_sweep_state,
    profile_trace,
)
from model_predictive_control_tpu.viz import (
    plot_input_sequence,
    plot_state_trajectory,
    plot_states_separately,
    plot_phase_trajectory,
    plot_cost_to_go_comparison,
    plot_integration_error,
    animate_parking,
)


def test_timer_fences_device_work():
    x = jnp.ones((256, 256))
    with Timer() as t:
        y = (x @ x).sum()
        t.fence(y)
    assert t.elapsed is not None and t.elapsed > 0.0


@pytest.mark.smoke
def test_metrics_logger_jsonl_roundtrip(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    with MetricsLogger(path) as log:
        log.write({"solves_per_s": jnp.float32(123.5), "batch": 64})
        log.write({"vec": jnp.arange(3)})
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["solves_per_s"] == pytest.approx(123.5)
    assert lines[0]["batch"] == 64 and "ts" in lines[0]
    assert lines[1]["vec"] == [0, 1, 2]


def test_summarize_run_health_fields():
    problem = mpc.session2_problem(N=5)
    ctrl = mpc.make_linear_mpc(problem, solver="admm", iters=60, dtype=jnp.float64)
    system = problem.system(jnp.float64)
    res = mpc.simulate(
        jnp.asarray([-10.0, 2.0], jnp.float64),
        system,
        steps=10,
        policy=ctrl.policy(),
        policy_carry=ctrl.initial_carry(jnp.float64),
    )
    summary = summarize_run(res)
    assert summary["steps"] == 10
    assert 0.0 <= summary["success_rate"] <= 1.0
    assert summary["prim_res_max"] >= summary["prim_res_p50"] >= 0.0


@pytest.mark.smoke
def test_checkpoint_resume_bitexact(tmp_path):
    path = str(tmp_path / "sweep.npz")
    state = {
        "x": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "key": jax.random.PRNGKey(7),
        "warm": (jnp.ones(4), jnp.zeros(2)),
    }
    save_sweep_state(path, step=17, state_pytree=state)
    step, loaded = load_sweep_state(path, state)
    assert step == 17
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_profile_trace_noop_and_real(tmp_path):
    with profile_trace(None):
        pass
    # real trace into a dir — degrades to no-op if profiler unavailable
    with profile_trace(str(tmp_path / "trace")):
        jnp.ones(8).sum().block_until_ready()


@pytest.fixture(scope="module")
def parking_run():
    """Tiny nonlinear parking closed loop: states, inputs, predictions."""
    T, N = 6, 4
    t = np.linspace(0.0, 1.0, T)
    states = np.stack([0.3 - 0.3 * t, -0.1 + 0.1 * t, 0.2 * t, 0.1 + 0 * t], 1)
    inputs = np.stack([np.cos(t), 0.1 * np.sin(t)], 1)
    preds = states[:, None, :] + 0.01 * np.arange(N + 1)[None, :, None]
    return states, inputs, preds


def test_plot_set_builds(tmp_path, parking_run):
    states, inputs, preds = parking_run
    params = mpc.VehicleParameters()
    assert plot_input_sequence(inputs, params, ts=0.08) is not None
    assert (
        plot_state_trajectory(
            states, params, save=str(tmp_path / "traj.png")
        )
        is not None
    )
    assert (tmp_path / "traj.png").exists()
    assert plot_states_separately(states, ts=0.08) is not None
    assert plot_phase_trajectory(states[:, :2], predictions=preds[..., :2]) is not None
    assert plot_cost_to_go_comparison([4, 6, 10], [3.0, 2.5, 2.2], 2.1) is not None
    from model_predictive_control_tpu.viz import plot_cover_circles

    assert plot_cover_circles(states[0], params) is not None
    assert (
        plot_integration_error(0.05, {"euler": np.abs(np.sin(t)) for t in [np.linspace(0, 1, 6)]})
        is not None
    )
    import matplotlib.pyplot as plt

    plt.close("all")


def test_animation_renders_gif(tmp_path, parking_run):
    states, _, preds = parking_run
    params = mpc.VehicleParameters()
    out = animate_parking(
        states,
        params,
        str(tmp_path / "park.gif"),
        predictions=preds,
        comparison=states[::-1],
        fps=5,
    )
    assert (tmp_path / "park.gif").stat().st_size > 0
    assert out.endswith(".gif")


def test_animation_shape_validation(parking_run):
    states, _, preds = parking_run
    params = mpc.VehicleParameters()
    from model_predictive_control_tpu.viz import ParkingAnimator

    anim = ParkingAnimator(params)
    with pytest.raises(ValueError):
        anim.add_car_trajectory(states[:, :2])  # needs pose columns
    with pytest.raises(ValueError):
        anim.bundle(preds[0])  # needs 3-D
