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


def test_sharded_solve_determinism():
    """SURVEY §5.2 determinism contract: the same sharded program is bitwise
    reproducible run-to-run; a *different* partitioning compiles a different
    XLA program (different fusion/reduction order), so across shardings the
    guarantee is agreement to solver tolerance, not bit equality (measured
    ~1e-4 drift through 80 fp32 ADMM iterations)."""
    import model_predictive_control_tpu as mpc
    from jax.sharding import NamedSharding, PartitionSpec as P

    problem = mpc.session2_problem(N=8)
    ctrl = mpc.make_linear_mpc(problem, solver="admm", iters=80, dtype=jnp.float32)

    B = 32
    key = jax.random.PRNGKey(0)
    x0s = jnp.stack(
        [
            jax.random.uniform(key, (B,), minval=-120.0, maxval=-10.0),
            jax.random.uniform(jax.random.PRNGKey(1), (B,), minval=-10.0, maxval=20.0),
        ],
        axis=1,
    ).astype(jnp.float32)

    def solve_batch(xb):
        q, l, u = jax.vmap(ctrl.qp.qp_vectors)(xb)
        sol = jax.vmap(
            lambda qq, ll, uu: mpc.admm_solve(ctrl.op, qq, ll, uu, iters=80)
        )(q, l, u)
        return sol.x, sol.y

    mesh = global_mesh()
    sh = NamedSharding(mesh, P(DATA_AXIS))
    solve_jit = jax.jit(solve_batch)
    x_sharded = jax.device_put(x0s, sh)
    x_a, y_a = solve_jit(x_sharded)
    x_b, y_b = solve_jit(x_sharded)
    # bitwise run-to-run reproducibility of the sharded program
    np.testing.assert_array_equal(np.asarray(x_a), np.asarray(x_b))
    np.testing.assert_array_equal(np.asarray(y_a), np.asarray(y_b))
    # cross-sharding agreement at solver tolerance
    x_plain, _ = jax.jit(solve_batch)(x0s)
    np.testing.assert_allclose(
        np.asarray(x_plain), np.asarray(x_a), atol=1e-3
    )


def test_vmap_matches_single_scenario_solves():
    """Batched (vmapped) solve equals solving each scenario alone — no
    cross-scenario leakage anywhere in the solver."""
    import model_predictive_control_tpu as mpc

    problem = mpc.session2_problem(N=6)
    ctrl = mpc.make_linear_mpc(problem, solver="admm", iters=100, dtype=jnp.float64)
    x0s = jnp.asarray([[-80.0, 15.0], [-30.0, -5.0], [-120.0, 22.0]], jnp.float64)

    def one(x0):
        q, l, u = ctrl.qp.qp_vectors(x0)
        return mpc.admm_solve(ctrl.op, q, l, u, iters=100).x

    batched = jax.vmap(one)(x0s)
    singles = jnp.stack([one(x0s[i]) for i in range(3)])
    np.testing.assert_array_equal(np.asarray(batched), np.asarray(singles))


def test_weak_scaling_harness_plumbing():
    """Round-4 scaling instrument (VERDICT r3 item 6): the weak-scaling ladder
    runs end to end on the virtual mesh — every point executes its sharded
    closed loop and the report carries the efficiency profile + the
    non-performance label (CPU numbers say nothing about real chips)."""
    from model_predictive_control_tpu.parallel.podscale import weak_scaling

    out = weak_scaling(
        batch_per_device=8, steps=2, iters=40, tile=8, ladder=[1, 4, 8]
    )
    assert out["non_performance"] is True
    assert out["predicted_real_efficiency"] == 1.0
    assert [p["devices"] for p in out["points"]] == [1, 4, 8]
    for p in out["points"]:
        assert p["batch"] == 8 * p["devices"]
        assert p["solves_per_s"] > 0
        assert 0.0 <= p["success_rate"] <= 1.0
    assert out["points"][0]["efficiency_vs_1"] == 1.0


def test_sharded_batched_policy_matches_unsharded():
    """The mesh path of LinearMPCController.batched_policy (shard_mapped fused
    kernel per device) solves the same QPs as the unsharded call."""
    import model_predictive_control_tpu as mpc
    from model_predictive_control_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
    )

    problem = mpc.session2_problem(N=6)
    ctrl = mpc.make_linear_mpc(
        problem, solver="admm", iters=400, dtype=jnp.float32
    )
    mesh = make_mesh(8)
    B = 16
    kp = jax.random.PRNGKey(0)
    x0s = jnp.stack(
        [
            jax.random.uniform(kp, (B,), minval=-100.0, maxval=-20.0),
            jax.random.uniform(
                jax.random.fold_in(kp, 1), (B,), minval=-10.0, maxval=20.0
            ),
        ],
        axis=1,
    ).astype(jnp.float32)
    carry = ctrl.initial_batch_carry(B)

    # same tile in both so the early-exit chunking matches; compare lanes
    # that CONVERGED (unconverged cold iterates legitimately differ between
    # tile groupings)
    pol_plain = ctrl.batched_policy(backend="pallas", tile=2)
    pol_mesh = ctrl.batched_policy(backend="pallas", tile=2, mesh=mesh)
    u_a, _, aux_a = jax.jit(pol_plain)(x0s, 0, carry)
    x0_sh = jax.device_put(x0s, batch_sharding(mesh))
    carry_sh = jax.tree.map(
        lambda l: jax.device_put(l, batch_sharding(mesh)), carry
    )
    u_b, _, aux_b = jax.jit(pol_mesh)(x0_sh, 0, carry_sh)
    both = np.asarray(aux_a["solver_success"]) & np.asarray(
        aux_b["solver_success"]
    )
    assert both.sum() >= 8  # most scenarios converge at this budget
    np.testing.assert_allclose(
        np.asarray(u_a)[both], np.asarray(u_b)[both], atol=2e-3
    )
