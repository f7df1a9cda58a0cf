"""Float64 oracle for the condensed linear-MPC loop (test-only).

Independent numpy construction of the prediction matrices / condensed QP (plain
Python loops — deliberately different code shape from the JAX scan builder) plus a
receding-horizon closed loop driven by the SLSQP-based QP oracle. This is the stand-in
for the reference's never-committed session-2/3 solver scripts (SURVEY.md §3.5),
giving the golden u-trajectories the BASELINE 1e-4 gate is measured against.
"""

from __future__ import annotations

import numpy as np

from .qp_oracle import solve_qp_np


def prediction_matrices_np(A, B, N):
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    nx, nu = B.shape
    Phi = np.zeros((N * nx, nx))
    Gamma = np.zeros((N * nx, N * nu))
    Ak = np.eye(nx)
    for k in range(N):
        Ak = A @ Ak  # A^{k+1}
        Phi[k * nx : (k + 1) * nx] = Ak
    for k in range(N):
        for j in range(k + 1):
            Gamma[k * nx : (k + 1) * nx, j * nu : (j + 1) * nu] = (
                np.linalg.matrix_power(A, k - j) @ B
            )
    return Phi, Gamma


def condensed_qp_np(A, B, Q, R, QN, N, x_ref=None):
    nx, nu = np.asarray(B).shape
    Phi, Gamma = prediction_matrices_np(A, B, N)
    Qbar = np.zeros((N * nx, N * nx))
    for k in range(N - 1):
        Qbar[k * nx : (k + 1) * nx, k * nx : (k + 1) * nx] = Q
    Qbar[(N - 1) * nx :, (N - 1) * nx :] = QN
    Rbar = np.kron(np.eye(N), R)
    P = 2.0 * (Gamma.T @ Qbar @ Gamma + Rbar)
    q_x0 = 2.0 * Gamma.T @ Qbar @ Phi
    if x_ref is None:
        q_const = np.zeros(N * nu)
    else:
        x_ref = np.asarray(x_ref, dtype=np.float64)
        if x_ref.ndim == 1:
            x_ref = np.tile(x_ref[None], (N, 1))
        q_const = -2.0 * Gamma.T @ Qbar @ x_ref.reshape(N * nx)
    return P, q_x0, q_const, Phi, Gamma


def closed_loop_mpc_np(problem_dict, x0, steps, x_ref=None):
    """Receding-horizon closed loop in float64 with the SLSQP oracle per step.

    ``problem_dict``: {A, B, Q, R, QN, N, u_min, u_max, x_min, x_max}.
    Returns dict with states (steps+1, nx), inputs (steps, nu), success list,
    predictions (steps, N, nx).
    """
    A = np.asarray(problem_dict["A"], dtype=np.float64)
    B = np.asarray(problem_dict["B"], dtype=np.float64)
    N = problem_dict["N"]
    nx, nu = B.shape
    P, q_x0, q_const, Phi, Gamma = condensed_qp_np(
        A,
        B,
        problem_dict["Q"],
        problem_dict["R"],
        problem_dict["QN"],
        N,
        x_ref=x_ref,
    )
    A_c = np.vstack([np.eye(N * nu), Gamma])
    u_lb = np.tile(problem_dict["u_min"], N)
    u_ub = np.tile(problem_dict["u_max"], N)
    x_lb = np.tile(problem_dict["x_min"], N)
    x_ub = np.tile(problem_dict["x_max"], N)

    x = np.asarray(x0, dtype=np.float64)
    states = [x]
    inputs = []
    success = []
    predictions = []
    u_prev = None
    for _ in range(steps):
        q = q_x0 @ x + q_const
        shift = Phi @ x
        l = np.concatenate([u_lb, x_lb - shift])
        u = np.concatenate([u_ub, x_ub - shift])
        z, _ = solve_qp_np(P, q, A_c, l, u, x0=u_prev)
        u_traj = z.reshape(N, nu)
        predictions.append((shift + Gamma @ z).reshape(N, nx))
        inputs.append(u_traj[0])
        success.append(True)
        x = A @ x + B @ u_traj[0]
        states.append(x)
        u_prev = np.concatenate([z[nu:], z[-nu:]])
    return {
        "states": np.stack(states),
        "inputs": np.stack(inputs),
        "success": success,
        "predictions": np.stack(predictions),
    }
