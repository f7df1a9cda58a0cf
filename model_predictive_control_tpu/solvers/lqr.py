"""Finite- and infinite-horizon LQR controllers (session-1 capability).

Reference semantics: ``AutoCruising`` receding-horizon LQR — apply ``gains[0]`` each
step (``session_1/FHC.py:20-29``), predictions use the time-varying ``gains[t]``
(``FHC.py:28-29``); cost-to-go comparison ``x0ᵀ P_N x0`` vs DARE value
(``FHC.py:117-131``).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..models.linear import LinearSystem
from ..ops.riccati import dare_sda, lqr_gain, riccati_recursion
from ..utils.pytree import pytree_dataclass
from ..control.simulate import Policy


@pytree_dataclass
class LQRSolution:
    P: jnp.ndarray  # (N + 1, nx, nx) cost-to-go Hessians, stage order
    K: jnp.ndarray  # (N, nu, nx) feedback gains, stage order


def solve_finite_horizon(
    sys: LinearSystem,
    Q: jnp.ndarray,
    R: jnp.ndarray,
    Pf: jnp.ndarray,
    N: int,
    parallel: bool = False,
) -> LQRSolution:
    """Backward Riccati solve. ``parallel=True`` routes through the O(log N)
    associative-scan recursion (``ops/parallel_horizon.py``) — same result to
    rounding, shorter critical path when N is large."""
    if parallel:
        from ..ops.parallel_horizon import riccati_recursion_parallel

        P, K = riccati_recursion_parallel(sys.A, sys.B, Q, R, Pf, N)
    else:
        P, K = riccati_recursion(sys.A, sys.B, Q, R, Pf, N)
    return LQRSolution(P=P, K=K)


def solve_infinite_horizon(
    sys: LinearSystem, Q: jnp.ndarray, R: jnp.ndarray, iters: int = 30
) -> LQRSolution:
    """DARE solution; ``K∞`` broadcast to a 1-stage gain stack."""
    P_inf = dare_sda(sys.A, sys.B, Q, R, iters=iters)
    K_inf = lqr_gain(sys.A, sys.B, R, P_inf)
    return LQRSolution(P=P_inf[None], K=K_inf[None])


def receding_horizon_policy(sol: LQRSolution) -> Policy:
    """``u = K_0 x`` each step (``FHC.py:25-26``)."""
    K0 = sol.K[0]

    def policy(x, t, carry):
        return K0 @ x, carry, ()

    return policy


def prediction_policy(sol: LQRSolution) -> Policy:
    """``u = K_t x`` along the prediction horizon (``FHC.py:28-29``)."""
    K = sol.K

    def policy(x, t, carry):
        return K[t] @ x, carry, ()

    return policy


def cost_to_go(sol: LQRSolution, x0: jnp.ndarray) -> jnp.ndarray:
    """Finite-horizon value ``x0ᵀ P_0 x0`` (``FHC.py:124``)."""
    return x0 @ sol.P[0] @ x0
