"""Batched closed-loop simulation: one ``lax.scan`` over time, batch-wide policies.

Complement to :mod:`.simulate` (which is per-scenario and composed with ``vmap``):
here the *policy itself* is batched — required by solver backends that are
intrinsically batch-level, like the fused Pallas ADMM kernel (a ``pallas_call``
over scenario tiles cannot live inside ``vmap``).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass

# batched policy: (x_batch (B, nx), t, carry) -> (u_batch (B, nu), carry, aux)
BatchedPolicy = Callable[[jnp.ndarray, jnp.ndarray, Any], tuple]


@pytree_dataclass
class BatchSimResult:
    states: jnp.ndarray  # (steps + 1, B, nx)
    inputs: jnp.ndarray  # (steps, B, nu)
    logs: Any  # pytree, leaves (steps, ...)
    final_carry: Any = None  # policy carry after the last step (resume handle)


def simulate_batch(
    x0: jnp.ndarray,  # (B, nx)
    dynamics: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    steps: int,
    policy: BatchedPolicy,
    policy_carry: Any = (),
    batched_dynamics: bool = False,
    disturbances: jnp.ndarray | None = None,
) -> BatchSimResult:
    """Roll a batch of plants forward under a batch-level policy.

    ``batched_dynamics=True`` means ``dynamics`` already maps (B, nx) × (B, nu) →
    (B, nx) — e.g. a plant whose parameters carry a scenario axis (the pod-scale
    parameter-perturbation sweeps); otherwise it is vmapped here.

    ``disturbances``: optional ``(steps, B, nx)`` additive process disturbances
    (per-step, per-realization) — the batch twin of
    :func:`..control.simulate.simulate`'s robust-MPC axis.
    """
    x0 = jnp.asarray(x0)
    dyn_b = dynamics if batched_dynamics else jax.vmap(dynamics)

    def step(carry, scanned):
        t, w = scanned
        x, pcarry = carry
        u, pcarry, aux = policy(x, t, pcarry)
        x_next = dyn_b(x, u)
        if w is not None:
            x_next = x_next + w
        return (x_next, pcarry), (x_next, u, aux)

    (_, final_carry), (xs, us, logs) = jax.lax.scan(
        step, (x0, policy_carry), (jnp.arange(steps), disturbances)
    )
    states = jnp.concatenate([x0[None], xs], axis=0)
    return BatchSimResult(
        states=states, inputs=us, logs=logs, final_carry=final_carry
    )
