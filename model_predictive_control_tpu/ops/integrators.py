"""Discretization combinators: continuous ODE → discrete-time step function.

Reference semantics: ``fwd_euler`` / ``runge_kutta4`` / ``exact_integration`` closures
at ``session_4/main.py:132-170`` (duplicated in ``session4_sol.py:22-56``). Each takes
a continuous dynamics ``f(x, u) -> ẋ`` and a sampling time, returning ``F(x, u) -> x⁺``.

TPU-native design decisions:
- All integrators are fixed-step, fixed-shape, branch-free — they live inside jitted
  ``lax.scan`` closed loops.
- The reference's "exact" tier (``scipy.integrate.odeint`` / LSODA, an adaptive Fortran
  integrator: ``main.py:164-170``) is replaced by :func:`rk4_fine` — classic RK4 with
  ``substeps`` uniform sub-intervals per sample. At the reference's sampling times
  (0.05–0.5 s) and smooth bicycle dynamics, RK4 with 16 substeps has local error many
  orders below the 1e-4 accuracy gate (validated in
  ``tests/test_integrators.py`` via the order-sweep that mirrors
  ``session4_sol.py:65-104``'s ``compare_open_loop``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Dynamics = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def euler(f: Dynamics, ts: float) -> Dynamics:
    """Forward Euler: ``x⁺ = x + ts f(x, u)`` (``session_4/main.py:132-135``)."""

    def step(x, u):
        return x + ts * f(x, u)

    return step


def rk4(f: Dynamics, ts: float) -> Dynamics:
    """Classic 4th-order Runge-Kutta (``session_4/main.py:138-147``)."""

    def step(x, u):
        s1 = f(x, u)
        s2 = f(x + 0.5 * ts * s1, u)
        s3 = f(x + 0.5 * ts * s2, u)
        s4 = f(x + ts * s3, u)
        return x + (ts / 6.0) * (s1 + 2.0 * s2 + 2.0 * s3 + s4)

    return step


def euler_fine(f: Dynamics, ts: float, substeps: int = 1) -> Dynamics:
    """Forward Euler with uniform substeps — ``substeps=1`` is exactly
    :func:`euler` (the reference's parking prediction model,
    ``session_4/main.py:76``); matches the fused factory's
    ``integrator="euler"`` prediction path bit-for-bit in structure."""
    inner = euler(f, ts / substeps)

    def step(x, u):
        def body(x, _):
            return inner(x, u), None

        x_next, _ = jax.lax.scan(body, x, None, length=substeps)
        return x_next

    return step


def rk4_fine(f: Dynamics, ts: float, substeps: int = 16) -> Dynamics:
    """High-accuracy tier: RK4 with uniform substeps, replacing ``odeint``
    (``session_4/main.py:150-170``) with a fixed-shape TPU-friendly scheme."""
    inner = rk4(f, ts / substeps)

    def step(x, u):
        def body(x, _):
            return inner(x, u), None

        x_next, _ = jax.lax.scan(body, x, None, length=substeps)
        return x_next

    return step


def heun(f: Dynamics, ts: float) -> Dynamics:
    """2nd-order Heun (explicit trapezoid) — mid-accuracy option with two stages."""

    def step(x, u):
        s1 = f(x, u)
        s2 = f(x + ts * s1, u)
        return x + 0.5 * ts * (s1 + s2)

    return step


INTEGRATORS = {
    "euler": euler,
    "heun": heun,
    "rk4": rk4,
    "rk4_fine": rk4_fine,
}


def get_integrator(name: str) -> Callable[..., Dynamics]:
    try:
        return INTEGRATORS[name]
    except KeyError:
        raise ValueError(
            f"unknown integrator {name!r}; available: {sorted(INTEGRATORS)}"
        ) from None
