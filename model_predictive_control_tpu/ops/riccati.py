"""Riccati recursions and the discrete algebraic Riccati equation (DARE).

Reference semantics:
- backward finite-horizon recursion ``K_k = -(R + BᵀPB)⁻¹ BᵀPA``,
  ``P_k = Q + AᵀP(A + BK_k)`` at ``session_1/FHC.py:51-61`` and (numerically better
  ``la.solve`` form) ``session_1/session1_sol.py:44-65``;
- infinite-horizon gain via ``scipy.linalg.solve_discrete_are`` (LAPACK) at
  ``session_1/FHC.py:97-98``.

TPU-native design:
- The backward pass is a ``lax.scan`` — fixed length N, fixed shapes, fully
  differentiable and vmappable over (A, B, Q, R, Pf) batches.
- The DARE is solved by the **structure-preserving doubling algorithm (SDA)**: a
  fixed-iteration matrix recurrence (quadratic convergence, ~25 iterations to machine
  precision) built from solves and matmuls only — no Schur/QZ decomposition, which XLA
  does not provide and which would not batch. This replaces the LAPACK call with
  something the MXU actually likes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils.precision import solver_precision


@solver_precision
def lqr_gain(
    A: jnp.ndarray, B: jnp.ndarray, R: jnp.ndarray, P: jnp.ndarray
) -> jnp.ndarray:
    """One-step LQR gain ``K = -(R + BᵀPB)⁻¹ BᵀPA`` (``session1_sol.py:59``)."""
    BtP = B.T @ P
    return -jnp.linalg.solve(R + BtP @ B, BtP @ A)


@solver_precision
def riccati_recursion(
    A: jnp.ndarray,
    B: jnp.ndarray,
    Q: jnp.ndarray,
    R: jnp.ndarray,
    Pf: jnp.ndarray,
    N: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Finite-horizon backward Riccati recursion as a ``lax.scan``.

    Returns ``(P, K)`` with ``P`` of shape ``(N + 1, nx, nx)`` and ``K`` of shape
    ``(N, nu, nx)``, index 0 = stage 0 (reference reverses its lists the same way,
    ``session1_sol.py:65``).
    """

    def step(P, _):
        K = lqr_gain(A, B, R, P)
        P_next = Q + A.T @ P @ (A + B @ K)
        P_next = 0.5 * (P_next + P_next.T)  # keep symmetric under fp rounding
        return P_next, (P, K)

    P0, (Ps, Ks) = jax.lax.scan(step, Pf, None, length=N)
    # scan emitted P_N .. P_1 (paired with K_{N-1} .. K_0); flip to stage order.
    P_stack = jnp.concatenate([P0[None], Ps[::-1]], axis=0)
    K_stack = Ks[::-1]
    return P_stack, K_stack


@solver_precision
def dare_sda(
    A: jnp.ndarray,
    B: jnp.ndarray,
    Q: jnp.ndarray,
    R: jnp.ndarray,
    iters: int = 30,
) -> jnp.ndarray:
    """Solve ``P = Q + AᵀPA - AᵀPB (R + BᵀPB)⁻¹ BᵀPA`` by structured doubling.

    SDA recurrence (Chu/Fan/Lin-style), with ``G = B R⁻¹ Bᵀ``:

        E_{k+1} = E_k (I + G_k H_k)⁻¹ E_k
        G_{k+1} = G_k + E_k (I + G_k H_k)⁻¹ G_k E_kᵀ
        H_{k+1} = H_k + E_kᵀ H_k (I + G_k H_k)⁻¹ E_k

    starting from ``E_0 = A``, ``H_0 = Q``; ``H_k → P`` quadratically. Fixed ``iters``
    keeps the computation branch-free (a ``lax.fori_loop``), matching the engine's
    no-dynamic-control-flow rule; 30 doublings ≈ horizon 2³⁰, far past convergence.
    """
    n = A.shape[-1]
    I = jnp.eye(n, dtype=A.dtype)
    G0 = B @ jnp.linalg.solve(R, B.T)

    def body(_, state):
        E, G, H = state
        # W = (I + G H)⁻¹ applied from the right: solve Wᵀ systems.
        M = I + G @ H
        Minv_E = jnp.linalg.solve(M, E)
        Minv_G = jnp.linalg.solve(M, G)
        E_next = E @ Minv_E
        G_next = G + E @ Minv_G @ E.T
        H_next = H + E.T @ H @ Minv_E
        G_next = 0.5 * (G_next + G_next.T)
        H_next = 0.5 * (H_next + H_next.T)
        return E_next, G_next, H_next

    _, _, H = jax.lax.fori_loop(0, iters, body, (A, G0, Q))
    return H


@solver_precision
def dare_residual(
    A: jnp.ndarray,
    B: jnp.ndarray,
    Q: jnp.ndarray,
    R: jnp.ndarray,
    P: jnp.ndarray,
) -> jnp.ndarray:
    """‖P - (Q + AᵀPA - AᵀPB(R + BᵀPB)⁻¹BᵀPA)‖∞ — convergence diagnostic."""
    BtP = B.T @ P
    P_new = Q + A.T @ P @ A - A.T @ P @ B @ jnp.linalg.solve(R + BtP @ B, BtP @ A)
    return jnp.max(jnp.abs(P - P_new))
