"""Session-1 experiments: finite-horizon LQR on the cruise-control double
integrator.

Reproduces the reference drivers with their exact problem constants
(``session_1/FHC.py:134-151``: Ts=0.5, Q = CᵀC + 1e-3·I with C = [1, −2/3],
R = [[0.1]], Pf = Q, x0 = [10, 10]):

- :func:`horizon_sweep` ≙ ``run_and_plot_traj`` (``FHC.py:64-114``): for each
  horizon N, solve the Riccati recursion, run the receding-horizon closed loop,
  and record the open-loop *prediction* made at every step (``FHC.py:85-90``) —
  short horizons (N=4) destabilize, long ones converge.
- :func:`cost_to_go_comparison` ≙ ``compare_term_cost`` (``FHC.py:117-131``):
  finite-horizon cost-to-go ``x0ᵀ P_N x0`` converges to the DARE value ``V∞``.

TPU-native shape: the whole sweep is a handful of jitted scans; per-step
predictions come from vmapping an open-loop prediction rollout over the stored
closed-loop states rather than re-simulating inside a Python loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.linear import double_integrator_discrete
from ..control.simulate import simulate
from ..solvers.lqr import (
    cost_to_go,
    receding_horizon_policy,
    solve_finite_horizon,
)
from ..ops.riccati import dare_sda, lqr_gain

DEFAULT_TS = 0.5  # FHC.py:136
DEFAULT_X0 = (10.0, 10.0)  # FHC.py:143


def session1_weights(dtype=jnp.float32):
    """Q = CᵀC + 1e-3·I with C = [1, −2/3]; R = [[0.1]] (FHC.py:139-142)."""
    C = np.array([[1.0, -2.0 / 3.0]])
    Q = jnp.asarray(C.T @ C + 1e-3 * np.eye(2), dtype=dtype)
    R = jnp.asarray([[0.1]], dtype=dtype)
    return Q, R


def horizon_sweep(
    horizons=(4, 6, 10, 20),
    steps: int = 30,
    ts: float = DEFAULT_TS,
    x0=DEFAULT_X0,
    dtype=jnp.float32,
):
    """Closed-loop receding-horizon LQR per horizon, with per-step predictions.

    Returns ``{N: {"states": (steps+1, 2), "predictions": (steps, N+1, 2),
    "unstable": bool, "cost_to_go": float}}``.
    """
    sys = double_integrator_discrete(ts, dtype=dtype)
    Q, R = session1_weights(dtype)
    x0 = jnp.asarray(x0, dtype=dtype)

    results = {}
    for N in horizons:
        sol = jax.jit(lambda N=N: solve_finite_horizon(sys, Q, R, Pf=Q, N=N))()

        def run(x0, sol=sol, N=N):
            res = simulate(
                x0, sys, steps=steps, policy=receding_horizon_policy(sol)
            )

            # prediction made at each closed-loop step: open-loop rollout under
            # the time-varying gains K_t (FHC.py:85-90, LinearSystem.py:28-35)
            def predict(x):
                def stage(x, K):
                    x_next = sys(x, K @ x)
                    return x_next, x_next

                _, xs = jax.lax.scan(stage, x, sol.K)
                return jnp.concatenate([x[None], xs], axis=0)

            preds = jax.vmap(predict)(res.states[:-1])
            return res, preds

        res, preds = jax.jit(run)(x0)
        results[int(N)] = {
            "states": res.states,
            "predictions": preds,
            "unstable": bool(res.unstable),
            "cost_to_go": float(cost_to_go(sol, x0)),
        }
    return results


def cost_to_go_comparison(
    horizons=tuple(range(1, 10)),
    ts: float = DEFAULT_TS,
    x0=DEFAULT_X0,
    dtype=jnp.float32,
):
    """Finite-horizon ``x0ᵀ P_N x0`` per N plus the DARE value ``V∞``
    (``FHC.py:117-131``; DARE via LAPACK there, structure-preserving doubling
    here). Returns ``(horizons, finite_costs, v_inf, K_inf)``."""
    sys = double_integrator_discrete(ts, dtype=dtype)
    Q, R = session1_weights(dtype)
    x0 = jnp.asarray(x0, dtype=dtype)

    finite = []
    for N in horizons:
        sol = jax.jit(lambda N=N: solve_finite_horizon(sys, Q, R, Pf=Q, N=N))()
        finite.append(float(cost_to_go(sol, x0)))

    P_inf = jax.jit(lambda: dare_sda(sys.A, sys.B, Q, R))()
    K_inf = lqr_gain(sys.A, sys.B, R, P_inf)
    v_inf = float(x0 @ P_inf @ x0)
    return list(horizons), finite, v_inf, K_inf


def run(outdir: str | None = None, steps: int = 30) -> dict:
    """Full session-1 driver (``FHC.py:main``): sweep + cost-to-go, plots if
    ``outdir`` given. Returns a JSON-able summary."""
    sweep = horizon_sweep(steps=steps)
    hs, finite, v_inf, _ = cost_to_go_comparison()

    if outdir is not None:
        import os

        from ..viz import plot_cost_to_go_comparison, plot_phase_trajectory

        os.makedirs(outdir, exist_ok=True)
        for N, r in sweep.items():
            plot_phase_trajectory(
                np.asarray(r["states"]),
                predictions=np.asarray(r["predictions"]),
                save=os.path.join(outdir, f"session1_phase_N{N}.png"),
            )
        plot_cost_to_go_comparison(
            hs, finite, v_inf, save=os.path.join(outdir, "session1_cost_to_go.png")
        )

    return {
        "unstable_by_horizon": {N: r["unstable"] for N, r in sweep.items()},
        "final_norm_by_horizon": {
            N: float(jnp.linalg.norm(r["states"][-1])) for N, r in sweep.items()
        },
        "cost_to_go": dict(zip(hs, finite)),
        "v_inf": v_inf,
    }
