"""Float64 numpy/scipy oracle for the LQR layer (test-only, never on the TPU path).

Independent re-implementation of the reference's recursion semantics
(``session_1/session1_sol.py:44-65``) plus scipy's LAPACK DARE
(``session_1/FHC.py:97``) used as ground truth for the JAX Riccati scan and the SDA
DARE solver (SURVEY.md §4 build-side test plan, item 1).
"""

from __future__ import annotations

import numpy as np
import scipy.linalg


def riccati_recursion_np(A, B, Q, R, Pf, N):
    """Backward recursion in float64; returns (P, K) stacks in stage order."""
    A, B, Q, R, Pf = (np.asarray(m, dtype=np.float64) for m in (A, B, Q, R, Pf))
    P = [Pf]
    K = []
    for _ in range(N):
        Kk = -np.linalg.solve(R + B.T @ P[-1] @ B, B.T @ P[-1] @ A)
        K.append(Kk)
        P.append(Q + A.T @ P[-1] @ (A + B @ Kk))
    return np.stack(P[::-1]), np.stack(K[::-1])


def dare_np(A, B, Q, R):
    """LAPACK DARE (the reference's infinite-horizon path, FHC.py:97)."""
    return scipy.linalg.solve_discrete_are(
        np.asarray(A, dtype=np.float64),
        np.asarray(B, dtype=np.float64),
        np.asarray(Q, dtype=np.float64),
        np.asarray(R, dtype=np.float64),
    )


def lqr_gain_np(A, B, R, P):
    A, B, R, P = (np.asarray(m, dtype=np.float64) for m in (A, B, R, P))
    return -np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)


def simulate_np(x0, f, policy, steps):
    """Reference rollout loop with instability flag (session1_sol.py:68-91)."""
    x = [np.asarray(x0, dtype=np.float64)]
    unstable = False
    for t in range(steps):
        u = policy(x[-1], t)
        x.append(np.asarray(f(x[-1], u), dtype=np.float64))
        if np.linalg.norm(x[-1]) > 100:
            unstable = True
    return np.stack(x), unstable
