"""Multi-host layer tests on the single-process 8-virtual-device CPU backend:
the same global-program code paths run with process_count()==1 (SURVEY §4 item 4
— host-count-agnostic specs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from model_predictive_control_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    global_mesh,
    initialize,
    make_global_batch,
    process_batch_slice,
    scaling_efficiency,
)


def test_initialize_noop_single_process(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize() is False  # no cluster config → single-process no-op


def test_global_mesh_axes_and_shape():
    mesh = global_mesh()
    assert mesh.shape == {DATA_AXIS: 8, MODEL_AXIS: 1}
    mesh2 = global_mesh(model_parallel=2)
    assert mesh2.shape == {DATA_AXIS: 4, MODEL_AXIS: 2}
    with pytest.raises(ValueError):
        global_mesh(model_parallel=3)


def test_process_batch_slice_single_process():
    lo, hi = process_batch_slice(64)
    assert (lo, hi) == (0, 64)


def test_make_global_batch_shards_data_axis():
    mesh = global_mesh()
    local = np.arange(32, dtype=np.float32).reshape(16, 2)
    arr = make_global_batch(local, mesh)
    assert arr.shape == (16, 2)
    assert len(arr.sharding.device_set) == 8
    # a jitted mean over the sharded axis reduces across devices
    out = jax.jit(jnp.mean)(arr)
    np.testing.assert_allclose(float(out), local.mean(), rtol=1e-6)


def test_scaling_efficiency():
    assert scaling_efficiency(800.0, 8, 100.0) == pytest.approx(1.0)
    assert scaling_efficiency(400.0, 8, 100.0) == pytest.approx(0.5)
