"""Discrete linear time-invariant systems.

TPU-native counterpart of the reference's ``session_1/LinearSystem.py:7-46``
(``LinearSystem.f`` = ``A @ x + B @ u``), the double-integrator factories at
``session_1/FHC.py:32-48`` / ``session1_sol.py:11-41``, and the session-2/3 problem
dynamics built in ``session_2/problem.py:22-24``.

Design: systems are frozen pytree dataclasses holding dense ``(nx, nx)`` / ``(nx, nu)``
arrays, so a *batch of systems* is just a ``LinearSystem`` whose leaves carry leading
batch axes — ``jax.vmap`` and mesh sharding over scenario/parameter axes come for free.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass


@pytree_dataclass
class LinearSystem:
    """Discrete-time LTI system ``x⁺ = A x + B u`` with optional output
    ``y = C x + D u`` (reference: ``LinearSystem.set_output_eq`` at
    ``session_1/LinearSystem.py:12-14``)."""

    A: jnp.ndarray  # (nx, nx)
    B: jnp.ndarray  # (nx, nu)
    C: jnp.ndarray | None = None  # (ny, nx)
    D: jnp.ndarray | None = None  # (ny, nu)

    @property
    def nx(self) -> int:
        return self.A.shape[-1]

    @property
    def nu(self) -> int:
        return self.B.shape[-1]

    def __call__(self, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
        """One discrete step (reference semantics: ``LinearSystem.py:16-18``)."""
        return self.A @ x + self.B @ u

    def with_output(self, C: jnp.ndarray, D: jnp.ndarray | None = None) -> "LinearSystem":
        """Functional ``set_output_eq`` — returns a new frozen system."""
        return LinearSystem(A=self.A, B=self.B, C=jnp.asarray(C),
                            D=None if D is None else jnp.asarray(D))

    def output(self, x: jnp.ndarray, u: jnp.ndarray | None = None) -> jnp.ndarray:
        """``y = C x (+ D u)``; identity output when no C was set."""
        if self.C is None:
            return x
        y = self.C @ x
        if self.D is not None and u is not None:
            y = y + self.D @ u
        return y


def double_integrator_continuous(dtype=jnp.float32) -> LinearSystem:
    """Continuous-time cruise-control model (``session_1/FHC.py:32-41``):

    ``A = [[0, 1], [0, 0]]``, ``B = [[0], [-1]]`` — relative position/velocity of a
    lead car, input decelerates.
    """
    A = jnp.array([[0.0, 1.0], [0.0, 0.0]], dtype=dtype)
    B = jnp.array([[0.0], [-1.0]], dtype=dtype)
    return LinearSystem(A=A, B=B)


def double_integrator_discrete(ts: float, dtype=jnp.float32) -> LinearSystem:
    """Forward-Euler discretization ``Ad = I + A ts``, ``Bd = B ts``
    (``session_1/FHC.py:44-48``)."""
    cont = double_integrator_continuous(dtype)
    Ad = jnp.eye(2, dtype=dtype) + cont.A * ts
    Bd = cont.B * ts
    return LinearSystem(A=Ad, B=Bd)


def session2_dynamics(ts: float, dtype=jnp.float32) -> LinearSystem:
    """Exact ZOH double integrator used by sessions 2/3
    (``session_2/problem.py:22-24``): ``A = [[1, Ts], [0, 1]]``, ``B = [[0], [Ts]]``."""
    A = jnp.array([[1.0, ts], [0.0, 1.0]], dtype=dtype)
    B = jnp.array([[0.0], [ts]], dtype=dtype)
    return LinearSystem(A=A, B=B)
