"""Fused Pallas AL-iLQR kernel vs the XLA solver path.

Runs the same kernel code the TPU executes, in Pallas interpreter mode on CPU
(`al_ilqr_solve_pallas` auto-selects interpret off-TPU), checked against
`solvers/ilqr.py::al_ilqr_solve` — the oracle-gated reference implementation
(tests/test_ilqr.py certifies THAT path against scipy to 1e-6)."""

import pytest

pytestmark = pytest.mark.slow  # oracle-heavy / long-running (full tier)
import jax
import jax.numpy as jnp
import numpy as np

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.ops.pallas.ilqr_kernel import (
    al_ilqr_solve_pallas,
    parking_geometry,
)
from model_predictive_control_tpu.solvers.parking import (
    Q_MAIN,
    QN_SCALE_MAIN,
    R_MAIN,
    make_parking_ilqr,
)

X_OBS = (0.25, 0.0, 0.0, 0.0)


def _weights():
    return (
        tuple(float(q) for q in Q_MAIN),
        tuple(float(r) for r in R_MAIN),
        float(QN_SCALE_MAIN),
    )


def _solve_both(x0s, N, ts, x_obs, outer, inner):
    params = mpc.VehicleParameters()
    n_circ = 0 if x_obs is None else 3
    xo = None if x_obs is None else jnp.asarray(x_obs, jnp.float32)
    prob, cons, nc = make_parking_ilqr(params, N, ts, x_obs=xo, dtype=jnp.float32)
    ref = jax.vmap(
        lambda x: mpc.al_ilqr_solve(
            prob, cons, nc, x, outer_iters=outer, inner_iters=inner,
            viol_tol=1e-4,
        )
    )(x0s)
    geom, limits = parking_geometry(params, x_obs, n_circles=3)
    sol = al_ilqr_solve_pallas(
        x0s,
        jnp.zeros((x0s.shape[0], N, 2), jnp.float32),
        jnp.full((x0s.shape[0],), float(params.acceleration), jnp.float32),
        jnp.full((x0s.shape[0],), float(params.friction), jnp.float32),
        N=N, ts=ts, geom=geom, limits=limits, weights=_weights(),
        n_circles=n_circ, outer_iters=outer, inner_iters=inner,
        viol_tol=1e-4, tile=8,
    )
    return ref, sol


def test_kernel_matches_xla_no_obstacle():
    x0s = jnp.asarray(
        [[0.3, -0.1, 0.0, 0.0], [0.45, 0.12, 0.3, 0.05]], jnp.float32
    )
    ref, sol = _solve_both(x0s, N=6, ts=0.1, x_obs=None, outer=5, inner=12)
    assert bool(jnp.all(sol.converged == ref.converged))
    # same OCP, two f32 implementations with different adaptivity granularity
    np.testing.assert_allclose(
        np.asarray(sol.us), np.asarray(ref.us), atol=2e-3
    )
    assert float(jnp.max(sol.viol)) < 1e-4


def test_kernel_matches_xla_obstacle():
    x0s = jnp.asarray(
        [[0.3, -0.1, 0.0, 0.0], [0.15, -0.2, -0.2, -0.02]], jnp.float32
    )
    ref, sol = _solve_both(x0s, N=8, ts=0.08, x_obs=X_OBS, outer=6, inner=15)
    # convergence flags agree; converged scenarios agree on controls
    assert bool(jnp.all(sol.converged == ref.converged))
    conv = np.asarray(ref.converged)
    du = np.max(
        np.abs(np.asarray(sol.us) - np.asarray(ref.us)), axis=(1, 2)
    )
    assert np.all(du[conv] < 5e-3), du
    # rollout consistency: stored xs must equal re-rolling stored us
    from model_predictive_control_tpu.models.bicycle import (
        kinematic_bicycle_ode,
    )
    from model_predictive_control_tpu.ops.integrators import euler

    params = mpc.VehicleParameters()
    step = euler(lambda x, u: kinematic_bicycle_ode(params, x, u), 0.08)
    x = x0s[0]
    for t in range(8):
        x = step(x, sol.us[0, t])
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(sol.xs[0, t + 1]), atol=1e-5
        )


def test_sweep_pallas_backend_matches_xla_backend():
    from model_predictive_control_tpu.parallel.batch import parking_sweep

    common = dict(
        batch=4, steps=2, rel_scale=0.1, solver="ilqr",
        outer_iters=4, inner_iters=8, dtype=jnp.float32,
        N=6, ts=0.1, plant_substeps=4,
    )
    res_p, _ = parking_sweep(backend="pallas", tile=4, **common)
    res_x, _ = parking_sweep(backend="xla", **common)
    assert res_p.states.shape == res_x.states.shape
    assert np.all(np.isfinite(np.asarray(res_p.states)))
    # same plants + same solver family: trajectories agree to MPC tolerance
    np.testing.assert_allclose(
        np.asarray(res_p.states), np.asarray(res_x.states), atol=5e-2
    )


def test_sweep_pallas_falls_back_on_exotic_perturbation():
    """Perturbing a geometry field makes the kernel's static baking invalid —
    the policy must silently route to the vmapped XLA path and still run."""
    from model_predictive_control_tpu.parallel.batch import parking_sweep

    res, summary = parking_sweep(
        batch=3, steps=2, rel_scale=0.1, solver="ilqr", backend="pallas",
        perturb_fields=("friction", "axis_rear"), controller_knows=True,
        outer_iters=3, inner_iters=6, dtype=jnp.float32,
        N=5, ts=0.1, plant_substeps=4,
    )
    assert np.all(np.isfinite(np.asarray(res.states)))


def test_sweep_pallas_mesh_sharded_f32():
    """Pallas ilqr backend under an 8-device mesh: the solve is shard_mapped
    over the data axis; results must be finite and mesh-consistent."""
    from model_predictive_control_tpu.parallel import make_mesh
    from model_predictive_control_tpu.parallel.batch import parking_sweep

    mesh = make_mesh(8)
    res, summary = parking_sweep(
        batch=16, steps=2, rel_scale=0.1, solver="ilqr", backend="pallas",
        tile=2, mesh=mesh, dtype=jnp.float32,
        N=5, ts=0.1, plant_substeps=4, outer_iters=3, inner_iters=6,
    )
    assert res.states.shape == (3, 16, 4)
    assert np.all(np.isfinite(np.asarray(res.states)))
    # single-device run (no mesh) must agree: sharding is semantics-free
    res1, _ = parking_sweep(
        batch=16, steps=2, rel_scale=0.1, solver="ilqr", backend="pallas",
        tile=2, mesh=None, dtype=jnp.float32,
        N=5, ts=0.1, plant_substeps=4, outer_iters=3, inner_iters=6,
    )
    np.testing.assert_allclose(
        np.asarray(res.states), np.asarray(res1.states), atol=1e-5
    )


def test_kernel_deterministic():
    """Two identical invocations must agree bitwise (no PRNG, no atomics, no
    order-dependent reductions in the kernel)."""
    x0s = jnp.asarray(
        [[0.3, -0.1, 0.0, 0.0], [0.45, 0.12, 0.3, 0.05]], jnp.float32
    )
    _, a = _solve_both(x0s, N=6, ts=0.1, x_obs=X_OBS, outer=4, inner=8)
    _, b = _solve_both(x0s, N=6, ts=0.1, x_obs=X_OBS, outer=4, inner=8)
    np.testing.assert_array_equal(np.asarray(a.us), np.asarray(b.us))
    np.testing.assert_array_equal(np.asarray(a.viol), np.asarray(b.viol))
