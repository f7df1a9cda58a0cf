"""Experimental / design-boundary modules — correctness-verified code that is
NOT on any hot path and not part of the supported API surface.

Current contents:

- :mod:`.riccati_ip_kernel` — the fused stagewise Riccati interior-point
  Pallas kernel. Measured ~28x SLOWER than the vmapped XLA stagewise solver
  at N=100/batch 4096 (the structural reason is documented in its module
  docstring and in ``docs/ARCHITECTURE.md`` "design boundary"): the box-IP
  iteration is already one dense, perfectly-batched XLA program, so a fused
  kernel has nothing to win back. Kept as the measured record of where fused
  Pallas solvers stop paying off, and as a correctness-verified alternative
  backend (``solvers/riccati_ip.py::StagewiseMPC.batched_policy(
  backend="pallas")`` still routes here for anyone who wants it).
"""

from .riccati_ip_kernel import stagewise_ip_solve_pallas

__all__ = ["stagewise_ip_solve_pallas"]
