"""Closed-loop simulation engine.

Reference semantics being reproduced:
- ``session_1/session1_sol.py:68-91`` — generic ``simulate(x0, f, policy, steps)``
  rollout returning the state sequence plus an instability flag (``‖x‖ > 100``);
- ``session_1/LinearSystem.py:20-35`` — ``simulate`` / ``prediction`` open-loop rollouts;
- the external ``rcracers.simulator.simulate`` driving closed-loop MPC at
  ``session_4/main.py:270-271`` (states stacked over time, policy called per step);
- the per-step controller telemetry schema ``ControllerLog`` at
  ``session_2/log.py:8-12`` (``solver_success`` / ``state_prediction`` /
  ``input_prediction`` lists).

TPU-native design: the whole closed loop is ONE ``lax.scan`` over time — no host
round-trips between plant steps. Policies return ``(u, aux)`` where ``aux`` is an
arbitrary pytree of per-step telemetry; ``scan`` stacks it into arrays, which is the
fixed-shape equivalent of the reference's append-to-list logs. Instability is a
running boolean mask (``session1_sol.py:86-89``), not an exception, so it vmaps and
shards cleanly across scenario batches.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_field

# policy: (x, t, carry) -> (u, new_carry, aux)
Policy = Callable[[jnp.ndarray, jnp.ndarray, Any], tuple[jnp.ndarray, Any, Any]]


@pytree_dataclass
class SimResult:
    """Stacked closed-loop telemetry (fixed-shape analog of ``ControllerLog``)."""

    states: jnp.ndarray  # (steps + 1, nx) — x_0 .. x_steps
    inputs: jnp.ndarray  # (steps, nu)
    unstable: jnp.ndarray  # () bool — ever ‖x‖ > threshold (session1_sol.py:86)
    logs: Any  # pytree of per-step policy aux, each leaf stacked over steps


INSTABILITY_NORM = 100.0  # session1_sol.py:86


def policy_from_law(law: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]) -> Policy:
    """Lift a stateless control law ``(x, t) -> u`` to the stateful policy protocol."""

    def policy(x, t, carry):
        return law(x, t), carry, ()

    return policy


def open_loop_policy(controls: jnp.ndarray) -> Policy:
    """Replay a precomputed input sequence (``session4_sol.py:357-358``)."""

    def policy(x, t, carry):
        return controls[t], carry, ()

    return policy


def simulate(
    x0: jnp.ndarray,
    dynamics: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    steps: int,
    policy: Policy,
    policy_carry: Any = (),
    instability_norm: float = INSTABILITY_NORM,
    disturbances: jnp.ndarray | None = None,
) -> SimResult:
    """Roll the plant ``dynamics`` forward ``steps`` steps under ``policy``.

    One jitted ``lax.scan``; vmap over ``x0`` (and over dynamics parameters via
    closure pytrees) for scenario batching.

    ``disturbances``: optional ``(steps, nx)`` additive process disturbances —
    ``x_{t+1} = dynamics(x_t, u_t) + w_t`` — the robust-MPC workload axis
    (generalizing the reference's plant-mismatch experiment,
    ``session4_sol.py:461-465``, to per-step bounded noise). Batch disturbance
    realizations by vmapping over this argument.
    """
    x0 = jnp.asarray(x0)

    def step(carry, scanned):
        t, w = scanned
        x, pcarry, unstable = carry
        u, pcarry, aux = policy(x, t, pcarry)
        x_next = dynamics(x, u)
        if w is not None:
            x_next = x_next + w
        unstable = jnp.logical_or(
            unstable, jnp.linalg.norm(x_next) > instability_norm
        )
        return (x_next, pcarry, unstable), (x_next, u, aux)

    init = (x0, policy_carry, jnp.asarray(False))
    (_, _, unstable), (xs, us, logs) = jax.lax.scan(
        step, init, (jnp.arange(steps), disturbances)
    )
    states = jnp.concatenate([x0[None], xs], axis=0)
    return SimResult(states=states, inputs=us, unstable=unstable, logs=logs)


def rollout(
    x0: jnp.ndarray,
    dynamics: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    controls: jnp.ndarray,
) -> jnp.ndarray:
    """Open-loop rollout under a fixed input sequence.

    Returns states ``(N + 1, nx)`` including ``x0`` — the single-shooting prediction
    primitive (reference unrolls this symbolically at ``session_4/main.py:86-104``).
    """

    def step(x, u):
        x_next = dynamics(x, u)
        return x_next, x_next

    _, xs = jax.lax.scan(step, jnp.asarray(x0), controls)
    return jnp.concatenate([jnp.asarray(x0)[None], xs], axis=0)
