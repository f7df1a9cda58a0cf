"""Offset-free MPC: disturbance estimation + zero steady-state tracking error.

The scenario is the linear-session analog of the reference's mismatch
exercises (session4_sol.py:389-488): the plant applies ``u + d_true`` with an
unknown constant actuator bias. A nominal MPC settles with a position offset;
the offset-free controller estimates the bias and removes the offset exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import model_predictive_control_tpu as mpc
from model_predictive_control_tpu.solvers.offset_free import make_offset_free_mpc

D_TRUE = 1.5
R_POS = -5.0


def _biased_plant(problem, dtype=jnp.float64, d=D_TRUE):
    sys = problem.system(dtype)
    return lambda x, u: sys.A @ x + sys.B @ (u + d)


class TestOffsetFree:
    STEPS = 80
    X0 = jnp.asarray([-20.0, 0.0], jnp.float64)

    @pytest.mark.smoke
    def test_tracks_reference_exactly_despite_actuator_bias(self):
        problem = mpc.session2_problem(N=8)
        ctrl = make_offset_free_mpc(
            problem, r=R_POS, iters=300, dtype=jnp.float64
        )
        res = mpc.simulate(
            self.X0, _biased_plant(problem), steps=self.STEPS,
            policy=ctrl.policy(),
            policy_carry=ctrl.initial_carry(self.X0, jnp.float64),
        )
        assert bool(res.logs["solver_success"].all())
        # zero steady-state offset on the tracked output (position)
        tail = np.asarray(res.states[-10:, 0])
        assert np.max(np.abs(tail - R_POS)) < 1e-3
        # the observer found the actuator bias
        d_hat = float(res.logs["disturbance_estimate"][-1, 0])
        assert abs(d_hat - D_TRUE) < 1e-3
        # and the target input compensates it (u_s = -d for v_s = 0)
        u_s = float(res.logs["target_input"][-1, 0])
        assert abs(u_s + D_TRUE) < 1e-3

    def test_nominal_mpc_has_steady_state_offset(self):
        problem = mpc.session2_problem(N=8)
        nominal = mpc.make_linear_mpc(
            problem, iters=300, dtype=jnp.float64, terminal="dare",
            x_ref=jnp.asarray([R_POS, 0.0], jnp.float64),
        )
        res = mpc.simulate(
            self.X0, _biased_plant(problem), steps=self.STEPS,
            policy=nominal.policy(),
            policy_carry=nominal.initial_carry(jnp.float64),
        )
        tail = np.asarray(res.states[-10:, 0])
        offset = np.abs(tail - R_POS).min()
        assert offset > 0.005  # the bias leaves a real offset without integral action

    def test_unbiased_plant_converges_with_zero_disturbance_estimate(self):
        problem = mpc.session2_problem(N=8)
        ctrl = make_offset_free_mpc(
            problem, r=R_POS, iters=300, dtype=jnp.float64
        )
        res = mpc.simulate(
            self.X0, _biased_plant(problem, d=0.0), steps=self.STEPS,
            policy=ctrl.policy(),
            policy_carry=ctrl.initial_carry(self.X0, jnp.float64),
        )
        assert abs(float(res.states[-1, 0]) - R_POS) < 1e-3
        assert abs(float(res.logs["disturbance_estimate"][-1, 0])) < 1e-3

    def test_constraints_still_respected(self):
        problem = mpc.session2_problem(N=8)
        ctrl = make_offset_free_mpc(
            problem, r=0.5, iters=400, dtype=jnp.float64
        )
        # target near the wall p <= 1; approach from below under bias
        res = mpc.simulate(
            self.X0, _biased_plant(problem), steps=self.STEPS,
            policy=ctrl.policy(),
            policy_carry=ctrl.initial_carry(self.X0, jnp.float64),
        )
        assert float(res.states[:, 0].max()) <= problem.p_max + 1e-6
        assert float(res.inputs.max()) <= problem.u_max + 1e-6
        assert float(res.inputs.min()) >= problem.u_min - 1e-6
        assert abs(float(res.states[-1, 0]) - 0.5) < 1e-3

    def test_batched_over_bias_realizations(self):
        problem = mpc.session2_problem(N=8)
        ctrl = make_offset_free_mpc(
            problem, r=R_POS, iters=300, dtype=jnp.float64
        )
        ds = jnp.asarray([-2.0, -0.5, 0.0, 1.0, 2.5], jnp.float64)
        sys = problem.system(jnp.float64)

        def run_one(d):
            plant = lambda x, u: sys.A @ x + sys.B @ (u + d)
            return mpc.simulate(
                self.X0, plant, steps=self.STEPS, policy=ctrl.policy(),
                policy_carry=ctrl.initial_carry(self.X0, jnp.float64),
            )

        res = jax.vmap(run_one)(ds)
        # every bias level ends on the reference with the right estimate
        np.testing.assert_allclose(
            np.asarray(res.states[:, -1, 0]), R_POS, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(res.logs["disturbance_estimate"][:, -1, 0]),
            np.asarray(ds), atol=1e-3,
        )


def test_singular_target_system_raises():
    problem = mpc.session2_problem(N=8)
    with pytest.raises(ValueError, match="tracked outputs"):
        make_offset_free_mpc(problem, r=np.zeros(2), H=np.eye(2))


@pytest.mark.slow
def test_robust_demo_cli(tmp_path, capsys):
    """The robust demo's three comparisons all land on the right side."""
    from model_predictive_control_tpu.cli import main

    main(["robust", "--batch", "24", "--steps", "40", "--outdir", str(tmp_path)])
    import json

    out = capsys.readouterr().out
    s = json.loads(out.strip().splitlines()[-1])
    assert s["bounded.tube_violation_frac"] == 0.0
    assert s["bounded.nominal_violation_frac"] > 0.5
    assert s["gaussian.stochastic_violation_rate"] <= s["gaussian.eps"] + 0.03
    assert s["gaussian.nominal_violation_rate"] > 0.3
    assert s["bias.offset_free_offset"] < 1e-3 < s["bias.nominal_offset"]
    assert (tmp_path / "robust_bounded.png").exists()
    assert (tmp_path / "robust_bias.png").exists()
