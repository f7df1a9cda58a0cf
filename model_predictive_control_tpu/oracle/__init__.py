"""Float64 oracles (test-only ground truth, SURVEY.md §4).

The reference validates against trusted external solvers (scipy DARE/odeint,
IPOPT); the build's equivalents live here: numpy Riccati/DARE/prediction-matrix
constructions, a scipy-based parking NLP solve, a certified Python box-QP oracle,
and a native C++ ADMM+polish oracle (``native/qp_oracle.cpp``) loaded via ctypes —
the in-repo stand-in for the reference's native IPOPT tier.
"""

from .lqr_oracle import dare_np, lqr_gain_np, riccati_recursion_np, simulate_np
from .mpc_oracle import (
    closed_loop_mpc_np,
    condensed_qp_np,
    prediction_matrices_np,
)
from .parking_oracle import solve_parking_nlp
from .qp_oracle import solve_qp_np
from .native_qp import (
    kkt_residual_native,
    solve_qp_family_native,
    solve_qp_native,
)

__all__ = [
    "dare_np",
    "lqr_gain_np",
    "riccati_recursion_np",
    "simulate_np",
    "closed_loop_mpc_np",
    "condensed_qp_np",
    "prediction_matrices_np",
    "solve_parking_nlp",
    "solve_qp_np",
    "kkt_residual_native",
    "solve_qp_family_native",
    "solve_qp_native",
]
