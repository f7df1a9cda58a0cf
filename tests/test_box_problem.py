"""Engine-grade generality of the robust stack (round-3 upgrade).

Round 2 hard-wired the tube/stochastic/offset-free constructors to the
session-2 double integrator (``session_2/problem.py:22-24``). These tests pin
the generalization: every robust controller is built and exercised on a
3-state, 2-input system that is NOT the double integrator, through the same
:class:`~model_predictive_control_tpu.BoxProblem` path the session problems
now route through — plus the batched policies the stack gained (tube and
offset-free closed loops riding the fused/vmapped batch backends).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.control.batch_loop import simulate_batch
from model_predictive_control_tpu.solvers.tube import make_tube_mpc, mrpi_box_margins
from model_predictive_control_tpu.solvers.stochastic import make_stochastic_mpc
from model_predictive_control_tpu.solvers.offset_free import make_offset_free_mpc


def three_state_problem(N: int = 8) -> mpc.BoxProblem:
    """A controllable, open-loop-stable 3-state / 2-input plant with coupled
    dynamics and a non-diagonal state weight — nothing the session plant has."""
    A = np.array(
        [
            [0.95, 0.20, 0.00],
            [0.00, 0.90, 0.25],
            [0.05, 0.00, 0.85],
        ]
    )
    B = np.array(
        [
            [0.50, 0.00],
            [0.00, 0.30],
            [0.20, 0.40],
        ]
    )
    Q = np.array(
        [
            [5.0, 0.5, 0.0],
            [0.5, 1.0, 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    R = np.diag([0.1, 0.2])
    return mpc.BoxProblem(
        A=A,
        B=B,
        Q=Q,
        R=R,
        x_min=np.array([-10.0, -8.0, -5.0]),
        x_max=np.array([2.0, 8.0, 5.0]),
        u_min=np.array([-4.0, -4.0]),
        u_max=np.array([4.0, 4.0]),
        N=N,
    )


W_HALF3 = np.array([0.05, 0.12, 0.08])


@pytest.mark.smoke
def test_box_problem_normalizes_session_problem():
    """as_box_problem reproduces the session-2 matrices exactly, and the
    built controller solves identically to the legacy Problem path."""
    problem = mpc.session2_problem(N=6)
    box = mpc.as_box_problem(problem)
    np.testing.assert_allclose(box.A, [[1.0, 0.3], [0.0, 1.0]])
    np.testing.assert_allclose(box.B, [[0.0], [0.3]])
    assert box.n_state == 2 and box.n_input == 1 and box.N == 6

    a = mpc.make_linear_mpc(problem, iters=150, dtype=jnp.float64)
    b = mpc.make_box_mpc(box, iters=150, dtype=jnp.float64)
    x0 = jnp.asarray([-60.0, 8.0], jnp.float64)
    ua, _ = a.solve(x0)
    ub, _ = b.solve(x0)
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))


class TestTubeGeneral:
    STEPS = 40
    X0 = jnp.asarray([-8.0, 3.0, 1.0])

    def _adversarial_w(self, rng, dtype=jnp.float64):
        signs = rng.choice([-1.0, 1.0], size=(self.STEPS, 3))
        return jnp.asarray(signs * W_HALF3, dtype)

    def test_error_inside_certified_supports(self):
        box = three_state_problem()
        tube = make_tube_mpc(box, W_HALF3, iters=300, dtype=jnp.float64)
        assert tube.z_margin.shape == (3,) and tube.u_margin.shape == (2,)
        # the certified supports bound the true error process (dimension-generic
        # twin of the session test)
        A_K = np.asarray(tube.A) + np.asarray(tube.B) @ np.asarray(tube.K)
        rng = np.random.default_rng(0)
        for _ in range(10):
            signs = rng.choice([-1.0, 1.0], size=(200, 3))
            e = np.zeros(3)
            for w in signs * W_HALF3:
                e = A_K @ e + w
                assert np.all(np.abs(e) <= np.asarray(tube.z_margin) + 1e-9)
                assert np.all(
                    np.abs(np.asarray(tube.K) @ e)
                    <= np.asarray(tube.u_margin) + 1e-9
                )

    def test_closed_loop_respects_original_boxes(self):
        box = three_state_problem()
        tube = make_tube_mpc(box, W_HALF3, iters=300, dtype=jnp.float64)
        x0 = self.X0.astype(jnp.float64)
        res = mpc.simulate(
            x0,
            box.system(jnp.float64),
            steps=self.STEPS,
            policy=tube.policy(),
            policy_carry=tube.initial_carry(x0),
            disturbances=self._adversarial_w(np.random.default_rng(1)),
        )
        assert bool(res.logs["solver_success"].all())
        assert bool(res.logs["tube_ok"].all())
        tol = 1e-6
        for j in range(3):
            assert float(res.states[:, j].min()) >= box.x_min[j] - tol
            assert float(res.states[:, j].max()) <= box.x_max[j] + tol
        for j in range(2):
            assert float(res.inputs[:, j].min()) >= box.u_min[j] - tol
            assert float(res.inputs[:, j].max()) <= box.u_max[j] + tol

    def test_terminal_set_variant_builds_and_runs(self):
        """terminal_set=True (Mayne–Seron–Raković recursive-feasibility half)
        constrains the nominal z_N to the tightened problem's certified box."""
        box = three_state_problem()
        tube = make_tube_mpc(
            box, W_HALF3, iters=300, dtype=jnp.float64, terminal_set=True
        )
        x0 = jnp.asarray([-2.0, 1.0, 0.5], jnp.float64)
        res = mpc.simulate(
            x0,
            box.system(jnp.float64),
            steps=self.STEPS,
            policy=tube.policy(),
            policy_carry=tube.initial_carry(x0),
            disturbances=self._adversarial_w(np.random.default_rng(2)),
        )
        assert bool(res.logs["solver_success"].all())
        assert bool(res.logs["tube_ok"].all())

    def test_batched_policy_matches_scalar(self):
        """TubeMPC.batched_policy (xla backend) == per-scenario scalar loop."""
        box = three_state_problem()
        tube = make_tube_mpc(box, W_HALF3, iters=200, dtype=jnp.float64)
        Bn, STEPS = 4, 10
        rng = np.random.default_rng(3)
        x0s = jnp.asarray(
            rng.uniform([-8, -4, -2], [1, 4, 2], size=(Bn, 3)), jnp.float64
        )
        ws = jnp.asarray(
            rng.choice([-1.0, 1.0], size=(STEPS, Bn, 3)) * W_HALF3, jnp.float64
        )
        sys = box.system(jnp.float64)
        res_b = simulate_batch(
            x0s,
            sys,
            STEPS,
            tube.batched_policy(backend="xla"),
            tube.initial_batch_carry(x0s, dtype=jnp.float64),
            disturbances=ws,
        )
        assert bool(res_b.logs["tube_ok"].all())
        for i in range(Bn):
            res_s = mpc.simulate(
                x0s[i], sys, steps=STEPS, policy=tube.policy(),
                policy_carry=tube.initial_carry(x0s[i]),
                disturbances=ws[:, i],
            )
            np.testing.assert_allclose(
                np.asarray(res_b.inputs[:, i]), np.asarray(res_s.inputs),
                atol=1e-6,
            )

    def test_batched_policy_pallas_backend(self):
        """The fused-kernel backend drives the same tube loop (f32, CPU
        interpret mode here; compiled on TPU)."""
        box = three_state_problem()
        tube = make_tube_mpc(box, W_HALF3, iters=150, dtype=jnp.float32)
        Bn, STEPS = 4, 6
        rng = np.random.default_rng(4)
        x0s = jnp.asarray(
            rng.uniform([-8, -4, -2], [1, 4, 2], size=(Bn, 3)), jnp.float32
        )
        ws = jnp.asarray(
            rng.choice([-1.0, 1.0], size=(STEPS, Bn, 3)) * W_HALF3, jnp.float32
        )
        res_p = simulate_batch(
            x0s,
            box.system(jnp.float32),
            STEPS,
            tube.batched_policy(backend="pallas", tile=4),
            tube.initial_batch_carry(x0s, dtype=jnp.float32),
            disturbances=ws,
        )
        res_x = simulate_batch(
            x0s,
            box.system(jnp.float32),
            STEPS,
            tube.batched_policy(backend="xla"),
            tube.initial_batch_carry(x0s, dtype=jnp.float32),
            disturbances=ws,
        )
        np.testing.assert_allclose(
            np.asarray(res_p.inputs), np.asarray(res_x.inputs), atol=3e-2
        )


class TestStochasticGeneral:
    def test_margins_dimension_generic(self):
        box = three_state_problem(N=10)
        Sigma_w = np.diag([0.01, 0.04, 0.02])
        ctrl = make_stochastic_mpc(box, Sigma_w, eps=0.05, dtype=jnp.float64)
        assert ctrl.state_margin.shape == (10, 3)
        assert ctrl.input_margin.shape == (10, 2)
        # tightening ramps in: stage-0 input margin is exactly zero (state
        # measured), margins are nondecreasing toward the stationary covariance
        im = np.asarray(ctrl.input_margin)
        sm = np.asarray(ctrl.state_margin)
        assert np.all(im[0] == 0.0)
        assert np.all(sm[1:] >= sm[:-1] - 1e-9)
        # tightened bounds sit strictly inside the nominal boxes beyond stage 0
        qp = ctrl.inner.qp
        assert float(jnp.max(qp.x_ub)) <= box.x_max.max()

    def test_closed_loop_violation_rate(self):
        box = three_state_problem(N=8)
        Sigma_w = np.diag([0.0004, 0.0016, 0.0009])
        ctrl = make_stochastic_mpc(box, Sigma_w, eps=0.1, dtype=jnp.float64)
        key = jax.random.PRNGKey(0)
        STEPS, Bn = 30, 16
        ws = jax.random.multivariate_normal(
            key, jnp.zeros(3), jnp.asarray(Sigma_w),
            shape=(Bn, STEPS), dtype=jnp.float64,
        )
        x0 = jnp.asarray([-6.0, 2.0, 1.0], jnp.float64)
        sys = box.system(jnp.float64)

        def run_one(w):
            return mpc.simulate(
                x0, sys, steps=STEPS, policy=ctrl.policy(),
                policy_carry=ctrl.initial_carry(jnp.float64),
                disturbances=w,
            )

        res = jax.vmap(run_one)(ws)
        assert float(res.logs["solver_success"].mean()) > 0.95
        # states stay essentially inside the ORIGINAL boxes (violation mass
        # bounded well above the per-row eps=0.1 design level would flag a
        # broken tightening; a small rate is expected and correct)
        viol = (
            (np.asarray(res.states) > box.x_max + 1e-9)
            | (np.asarray(res.states) < box.x_min - 1e-9)
        )
        assert viol.mean() < 0.1


class TestOffsetFreeGeneral:
    def test_zero_offset_under_input_bias(self):
        """Constant unmeasured input bias on BOTH actuators of the 3-state
        plant: tracked outputs (x1, x2) converge to r exactly."""
        box = three_state_problem(N=8)
        r = np.array([-1.0, 0.5])
        ctrl = make_offset_free_mpc(
            box, r=r, H=np.eye(3)[:2], iters=300, dtype=jnp.float64,
        )
        bias = jnp.asarray([0.3, -0.2], jnp.float64)
        A = jnp.asarray(box.A, jnp.float64)
        Bm = jnp.asarray(box.B, jnp.float64)

        def plant(x, u):
            return A @ x + Bm @ (u + bias)

        STEPS = 120
        x0 = jnp.asarray([-6.0, 2.0, 1.0], jnp.float64)
        res = mpc.simulate(
            # measurement = full state (C = I)
            x0, plant, steps=STEPS, policy=ctrl.policy(),
            policy_carry=ctrl.initial_carry(x0, jnp.float64),
        )
        assert bool(res.logs["solver_success"].all())
        np.testing.assert_allclose(
            np.asarray(res.states[-1, :2]), r, atol=1e-5
        )
        # the observer found the bias: d̂ settles at -B⁺(B bias)… for Bd=B the
        # steady disturbance estimate equals the bias itself
        np.testing.assert_allclose(
            np.asarray(res.logs["disturbance_estimate"][-1]),
            np.asarray(bias),
            atol=1e-5,
        )

    def test_solver_dispatch_pdip(self):
        """solver='pdip' now actually routes the deviation solve through PDIP
        (round-2 bug: silently ADMM); both land on the same QP solution."""
        box = three_state_problem(N=6)
        r = np.array([-1.0, 0.5])
        ctrl_a = make_offset_free_mpc(box, r=r, H=np.eye(3)[:2],
                                      iters=400, dtype=jnp.float64)
        ctrl_p = make_offset_free_mpc(box, r=r, H=np.eye(3)[:2],
                                      solver="pdip", iters=40,
                                      dtype=jnp.float64)
        dx0 = jnp.asarray([-2.0, 1.0, 0.3], jnp.float64)
        x_s = jnp.zeros(3, jnp.float64)
        u_s = jnp.zeros(2, jnp.float64)
        du_a, sol_a = ctrl_a.solve_deviation(dx0, x_s, u_s)
        du_p, sol_p = ctrl_p.solve_deviation(dx0, x_s, u_s)
        assert bool(sol_a.converged) and bool(sol_p.converged)
        np.testing.assert_allclose(
            np.asarray(du_a), np.asarray(du_p), atol=1e-5
        )

    def test_overdetermined_targets_rejected(self):
        """nr == nd but nr > nu: pinv would silently return least-squares
        targets; the constructor must refuse (round-2 advisor finding)."""
        box = three_state_problem(N=6)
        with pytest.raises(ValueError, match="overdetermined|square"):
            make_offset_free_mpc(
                box,
                r=np.zeros(3),
                H=np.eye(3),
                Bd=np.eye(3),  # nd = 3 > nu = 2
                dtype=jnp.float64,
            )

    def test_batched_policy_matches_scalar(self):
        box = three_state_problem(N=6)
        r = np.array([-1.0, 0.5])
        ctrl = make_offset_free_mpc(
            box, r=r, H=np.eye(3)[:2], iters=250, dtype=jnp.float64
        )
        Bn, STEPS = 3, 15
        rng = np.random.default_rng(5)
        x0s = jnp.asarray(
            rng.uniform([-6, -2, -1], [0, 2, 1], size=(Bn, 3)), jnp.float64
        )
        bias = jnp.asarray([0.3, -0.2], jnp.float64)
        A = jnp.asarray(box.A, jnp.float64)
        Bm = jnp.asarray(box.B, jnp.float64)

        def plant(x, u):
            return A @ x + Bm @ (u + bias)

        res_b = simulate_batch(
            x0s, plant, STEPS,
            ctrl.batched_policy(backend="xla"),
            ctrl.initial_batch_carry(x0s, dtype=jnp.float64),
        )
        for i in range(Bn):
            res_s = mpc.simulate(
                x0s[i], plant, steps=STEPS, policy=ctrl.policy(),
                policy_carry=ctrl.initial_carry(x0s[i], jnp.float64),
            )
            np.testing.assert_allclose(
                np.asarray(res_b.inputs[:, i]), np.asarray(res_s.inputs),
                atol=1e-6,
            )


def test_tube_sweep_certificates_hold():
    """Batched tube sweep (fused-kernel path): certified tube and original
    boxes hold for every scenario under adversarial corner disturbances."""
    from model_predictive_control_tpu.parallel.batch import tube_sweep

    res, s = tube_sweep(batch=8, steps=8, tile=8)
    assert s["tube_ok_rate"] == 1.0
    assert s["original_box_violation_frac"] == 0.0
    assert s["success_rate"] > 0.9


def test_tube_sweep_mesh_sharded_matches_unsharded():
    """Round-3 advisor finding: tube_sweep's mesh parameter must actually
    shard (device_put + shard_mapped inner solve), and the sharded run must
    reproduce the unsharded certificates."""
    import jax

    from model_predictive_control_tpu.parallel.batch import tube_sweep
    from model_predictive_control_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    res_m, s_m = tube_sweep(
        batch=16, steps=6, tile=2, mesh=mesh, key=jax.random.PRNGKey(3)
    )
    res_p, s_p = tube_sweep(
        batch=16, steps=6, tile=2, key=jax.random.PRNGKey(3)
    )
    assert s_m["tube_ok_rate"] == s_p["tube_ok_rate"] == 1.0
    assert s_m["original_box_violation_frac"] == 0.0
    np.testing.assert_allclose(
        np.asarray(res_m.states), np.asarray(res_p.states), atol=2e-3
    )


def test_stochastic_sweep_chance_level_holds():
    """Batched chance-constrained sweep (fused-kernel path): the Monte-Carlo
    violation rate among near-limit steps stays at or below the design eps."""
    from model_predictive_control_tpu.parallel.batch import stochastic_sweep

    res, s = stochastic_sweep(batch=24, steps=25, tile=24)
    assert s["near_limit_violation_rate"] <= s["eps"] + 0.02
    assert s["success_rate"] > 0.9


def test_rate_and_stagewise_mpc_accept_box_problem():
    """Round-3 completion: the LAST two Problem-hardwired constructors
    (rate-limited MPC, stagewise Riccati-IP MPC) build and regulate on the
    3-state / 2-input BoxProblem."""
    from model_predictive_control_tpu.solvers.rate_mpc import (
        make_rate_limited_mpc,
    )
    from model_predictive_control_tpu.solvers.riccati_ip import (
        make_stagewise_mpc,
    )

    box = three_state_problem(N=6)
    x0 = jnp.asarray([-6.0, 2.0, 1.0], jnp.float64)
    sys = box.system(jnp.float64)

    rate = make_rate_limited_mpc(box, du_max=1.0, iters=300, dtype=jnp.float64)
    res_r = mpc.simulate(
        x0, sys, steps=25, policy=rate.policy(),
        policy_carry=rate.initial_carry(dtype=jnp.float64),
    )
    assert bool(res_r.logs["solver_success"].all())
    du = jnp.abs(jnp.diff(res_r.inputs, axis=0))
    assert float(du.max()) <= 1.0 + 1e-6  # the slew bound holds
    assert float(jnp.linalg.norm(res_r.states[-1])) < 0.5

    st = make_stagewise_mpc(box, iters=25, dtype=jnp.float64)
    res_s = mpc.simulate(
        x0, sys, steps=25, policy=st.policy(),
        policy_carry=st.initial_carry(jnp.float64),
    )
    assert bool(res_s.logs["solver_success"].all())
    assert float(jnp.linalg.norm(res_s.states[-1])) < 0.2
