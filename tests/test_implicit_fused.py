"""Fused forward for the implicit/tuning layer (round 5, VERDICT r4 item 5).

The KKT backward of ``make_implicit_al_ilqr_param_solver`` only consumes the
converged ``(us, lams)``, so the forward can be the FACTORY KERNEL in
runtime-weights mode (``tuning.py::make_fused_parking_forward``) — batched,
one executable across all theta — instead of the vmapped XLA solver
(measured 30-80× slower). Certified here:

- finite-difference gate on ``d loss / d theta`` through the fused-forward
  closed loop;
- gradient equivalence fused-forward vs XLA-forward on the same loss (both
  land on the same stationary points; agreement bounded by the shared
  1e-4 AL tolerance).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # interpreter-mode kernel + KKT jacfwd

from model_predictive_control_tpu.tuning import make_parking_closed_loop_cost

X0S = jnp.asarray(
    [
        [0.3, -0.1, 0.0, 0.0],
        [0.15, -0.2, -0.2, -0.02],
        [0.45, 0.12, 0.3, 0.05],
    ],
    jnp.float64,
)
TRUE_Q = jnp.asarray([1.0, 3.0, 0.1, 0.01], jnp.float64)
TRUE_R = jnp.asarray([1.0, 0.01], jnp.float64)
KW = dict(
    steps=2, N=6, ts=0.05, outer_iters=8, inner_iters=30, tile=8,
)
THETA = {
    "logQ": jnp.log(jnp.asarray([0.8, 2.0, 0.15, 0.02], jnp.float64)),
    "logR": jnp.log(jnp.asarray([0.7, 0.02], jnp.float64)),
}


def test_fused_forward_gradient_matches_fd():
    """d loss / d theta through the FUSED-forward closed loop passes a
    central-difference gate on every coordinate."""
    loss = make_parking_closed_loop_cost(
        X0S, true_Q=TRUE_Q, true_R=TRUE_R, forward="fused", **KW
    )
    loss_j = jax.jit(loss)
    val, g = jax.jit(jax.value_and_grad(loss))(THETA)
    assert np.isfinite(float(val))
    # eps large enough that the f32-forward loss noise (~1e-5 absolute on a
    # ~30-magnitude loss, i.e. ~5e-2 FD noise at eps=1e-4) stays well under
    # the secant slope, small enough not to cross active-set changes
    eps = 3e-3
    for key in ("logQ", "logR"):
        for i in range(THETA[key].shape[0]):
            tp = dict(THETA)
            tp[key] = THETA[key].at[i].add(eps)
            tm = dict(THETA)
            tm[key] = THETA[key].at[i].add(-eps)
            fd = (float(loss_j(tp)) - float(loss_j(tm))) / (2 * eps)
            gi = float(g[key][i])
            # gradient accuracy is bounded by the kernel's f32 solve + the
            # 1e-4 AL tolerance, not by the KKT wrapper
            assert abs(gi - fd) <= 5e-2 * (1.0 + abs(fd)), (key, i, gi, fd)


def test_fused_forward_gradient_matches_xla_forward():
    """The fused forward and the XLA forward give the same loss value and
    the same theta gradient (both land on the same stationary points)."""
    loss_f = make_parking_closed_loop_cost(
        X0S, true_Q=TRUE_Q, true_R=TRUE_R, forward="fused", **KW
    )
    loss_x = make_parking_closed_loop_cost(
        X0S, true_Q=TRUE_Q, true_R=TRUE_R, **KW
    )
    vf, gf = jax.jit(jax.value_and_grad(loss_f))(THETA)
    vx, gx = jax.jit(jax.value_and_grad(loss_x))(THETA)
    assert abs(float(vf) - float(vx)) <= 1e-3 * (1.0 + abs(float(vx)))
    for key in ("logQ", "logR"):
        np.testing.assert_allclose(
            np.asarray(gf[key]), np.asarray(gx[key]),
            rtol=5e-2, atol=5e-3,
        )
