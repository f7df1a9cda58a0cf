"""Roofline / MFU accounting for the fused kernels (VERDICT r2 item 3).

The engine's headline numbers (solves/s) are meaningless without the hardware
bound they sit under: this module turns the two fused kernels' *algorithmic*
work into FLOPs/solve and HBM bytes/solve, so ``bench.py`` can report achieved
GFLOP/s and fraction-of-relevant-peak instead of a bare throughput. The counts
are analytic (from the kernel structure, cited below), not XLA cost-analysis
numbers: Pallas kernels are opaque custom calls to XLA, and the solvers'
``while_loop`` trip counts defeat HLO cost analysis anyway.

Peaks (TPU v5e / "v5 lite", one chip — public figures):
- MXU bf16: 197 TFLOP/s. The ADMM kernel's hot op is an f32-emulated matmul
  (3 bf16 passes, ``admm_kernel._dot3``), so useful-f32 MXU throughput peaks
  at 197/3 ≈ 65.7 TFLOP/s *before* tile padding.
- VPU f32: ≈ 7.9 TFLOP/s (4 ALUs × 8×128 lanes × ~0.94 GHz, FMA = 2 FLOPs) —
  approximate; the VPU peak is not published at MXU precision.
- HBM: 819 GB/s.

The reference has no analog of any of this (no timing code at all —
``session_4/main.py:38`` disables IPOPT's print_time); the roofline is pure
engine-side infrastructure.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# --- TPU v5e single-chip peaks -------------------------------------------------
MXU_BF16_PEAK = 197e12  # FLOP/s
VPU_F32_PEAK = 7.9e12  # FLOP/s (approximate, see module docstring)
HBM_BW_PEAK = 819e9  # B/s
MXU_TILE = 128  # systolic array edge: operands pad to 128 lanes


@dataclass(frozen=True)
class KernelRoofline:
    """Work model for one fused-kernel solve + derived achieved/peak ratios."""

    name: str
    flops_per_solve: float  # algorithmic useful f32 FLOPs (full budget)
    flops_main_loop: float  # the fixed-iteration core only (excl. checks/polish)
    mxu_flops_issued: float  # hardware MXU FLOPs incl. emulation passes+padding
    hbm_bytes_per_solve: float
    bound: str  # "MXU" | "VPU"
    notes: str = ""

    def achieved(self, solves_per_s: float) -> dict:
        """Achieved rates + fraction of the relevant peak at a measured
        throughput. ``frac_of_peak`` compares issued hardware work against the
        raw peak; ``frac_of_structural_ceiling`` compares useful algorithmic
        work against the peak AFTER the kernel's structural discounts
        (emulation passes, tile padding) — the number that says how much of
        the *reachable* roof is used."""
        peak = MXU_BF16_PEAK if self.bound == "MXU" else VPU_F32_PEAK
        achieved_useful = self.flops_per_solve * solves_per_s
        if self.bound == "MXU":
            achieved_hw = self.mxu_flops_issued * solves_per_s
            ceiling_solves = peak / self.mxu_flops_issued
        else:
            achieved_hw = achieved_useful
            ceiling_solves = peak / self.flops_per_solve
        hbm_rate = self.hbm_bytes_per_solve * solves_per_s
        return {
            "flops_per_solve": round(self.flops_per_solve),
            "achieved_gflops": round(achieved_useful / 1e9, 1),
            "achieved_hw_gflops": round(achieved_hw / 1e9, 1),
            "frac_of_peak": round(achieved_hw / peak, 4),
            "roofline_ceiling_solves_per_s": round(ceiling_solves, 1),
            "frac_of_structural_ceiling": round(
                solves_per_s / ceiling_solves, 4
            ),
            "hbm_gb_per_s": round(hbm_rate / 1e9, 2),
            "frac_of_hbm_peak": round(hbm_rate / HBM_BW_PEAK, 5),
            "bound": self.bound,
        }


def _pad(d: int, tile: int = MXU_TILE) -> int:
    return ((d + tile - 1) // tile) * tile


def admm_kernel_roofline(
    n: int = 20,
    m: int = 60,
    iters: int = 100,
    chunks: int = 2,
    probe_iters: int = 32,
    cg_iters: int = 40,
) -> KernelRoofline:
    """Work model of ``ops/pallas/admm_kernel.py`` per scenario-solve.

    Counted from the kernel structure:
    - main loop: one fused ``(T, n+m) @ (n+m, n+m)`` op per iteration
      (``_admm_tile_kernel`` — the affine-in-G formulation), 2(n+m)² useful
      FLOPs each; executed as 3 bf16 MXU passes (``_dot3``) on operands padded
      to the 128-lane MXU tile → issued = 3 · 2 · pad(n+m)² per iteration.
    - per-solve setup: q-term ``q @ Wq`` (2·n·(n+m)) + warm-start projection.
    - per-chunk exit check: residuals need A x, Aᵀ y, P x ≈ 2(2nm + n²).
    - CG polish (full budget; early exit usually stops sooner): per CG
      iteration one application of P + ρAᵀA ≈ 2(n² + 2nm) plus ~6n vector ops.
    - HBM: read (q, l, u, warm x, warm y), write (x, z, y), f32 — the
      iteration count never touches HBM (VMEM-resident by design).
    """
    nm = n + m
    main = iters * 2 * nm * nm
    setup = 2 * n * nm + 2 * m * n
    n_checks = (1 if probe_iters else 0) + chunks
    checks = n_checks * 2 * (2 * n * m + n * n)
    polish = cg_iters * (2 * (n * n + 2 * n * m) + 6 * n)
    useful = main + setup + checks + polish
    issued = iters * 3 * 2 * _pad(nm) * _pad(nm)
    hbm = 4 * ((n + 2 * m) + (n + m) + (n + 2 * m))
    return KernelRoofline(
        name="fused_admm",
        flops_per_solve=float(useful),
        flops_main_loop=float(main),
        mxu_flops_issued=float(issued),
        hbm_bytes_per_solve=float(hbm),
        bound="MXU",
        notes=(
            f"3-pass bf16 emulation and {nm}->{_pad(nm)} lane padding discount "
            f"the 197 TF/s peak to {197e12 * (nm / _pad(nm)) ** 2 / 3 / 1e12:.1f} "
            "TF/s of useful f32; early exits make the full-budget count an "
            "upper bound on delivered work"
        ),
    )


def al_ilqr_dyn_kernel_roofline(
    N: int = 15,
    nx: int = 6,
    nu: int = 2,
    substeps: int = 4,
    outer_iters: int = 3,
    inner_iters: int = 8,
    ls_alphas: int = 7,
) -> KernelRoofline:
    """Work model of ``ops/pallas/ilqr_dyn_kernel.py`` per scenario-solve
    (round 4 — the 6-state Pacejka tracking kernel).

    Counted from the kernel structure; the dominant terms per inner
    iteration, per stage:
    - the packed-jvp Jacobian: one (8, T) primal+tangent RK4 pass —
      ``substeps × 4`` ODE evaluations at ~90 FLOPs each, ×3 for the
      jvp tangent arithmetic, ×8 sublane pack (the pack rides native
      sublanes, so issued ≈ useful here);
    - generic 6×6 backward algebra: M = Vxx A (216) + Qxx (2×216 sym) +
      VB/Quu/Qux (~170) + gains/value update (~500) ≈ 1.1k FMAs = 2.2k FLOPs;
    - line search: ``ls_alphas``-pack rollouts — ``substeps × 4`` ODE evals
      (~90 FLOPs) + cost rows (~50) per stage, sublane-packed.
    HBM: read (x0, u0, refs), write (us, xs, viol, conv) — iteration-free.
    """
    ode = 90
    jac_stage = 3 * 8 * substeps * 4 * ode
    backward_stage = jac_stage + 2200
    ls_stage = ls_alphas * (substeps * 4 * ode + 50)
    inner_iter = N * (backward_stage + ls_stage)
    outer_extra = N * (20 * (2 * nu))
    useful = outer_iters * (inner_iters * inner_iter + outer_extra)
    hbm = 4 * (nx + N * nu + (N + 1) * nx + N * nu + (N + 1) * nx + 2)
    return KernelRoofline(
        name="fused_al_ilqr_dyn",
        flops_per_solve=float(useful),
        flops_main_loop=float(outer_iters * inner_iters * inner_iter),
        mxu_flops_issued=0.0,
        hbm_bytes_per_solve=float(hbm),
        bound="VPU",
        notes=(
            "lane-batched 6-state kernel with jvp-exact Jacobians; analytic "
            "count +-40% (the jvp pass is traced, not hand-counted)"
        ),
    )


def al_ilqr_kernel_roofline(
    N: int = 30,
    nx: int = 4,
    nu: int = 2,
    n_pairs: int = 9,
    outer_iters: int = 6,
    inner_iters: int = 15,
    # 7 grid alphas; the historical 8th (1, T) accept re-rollout was replaced
    # by the round-4b sublane select out of the candidate packs
    ls_alphas: int = 7,
) -> KernelRoofline:
    """Work model of ``ops/pallas/ilqr_kernel.py`` per scenario-solve.

    The kernel packs scenarios into VPU lanes (state/control components are
    unrolled scalar rows, ``_alilqr_tile_kernel``), so the bound is the VPU,
    not the MXU. Per inner iteration, per stage (counted from the kernel):
    - backward pass: dynamics Jacobian rows (~60), AL constraint derivative
      rows — the collision pairs dominate: ~60 FLOPs per pair (distance rows,
      Gauss–Newton outer products, exact curvature) — quadratic expansion of
      the 4×4/2×4/2×2 blocks (~450 unrolled multiply-adds), gain solve ~40.
    - forward line search: ``ls_alphas`` candidate rollouts packed into the
      sublane dim — dynamics (~60) + stage-cost rows (~30 + 8/pair) each.
    Outer loop: multiplier update + violation sweep ≈ one constraint pass.
    HBM: read (x0, u0, params), write (us, xs, viol, conv) — iteration count
    HBM-free (all iterate state in VMEM scratch).
    """
    per_pair = 60
    backward_stage = 60 + per_pair * n_pairs + 450 + 40
    ls_stage = ls_alphas * (60 + 30 + 8 * n_pairs)
    inner_iter = N * (backward_stage + ls_stage)
    outer_extra = N * (20 * (2 * nx + 2 * nu + n_pairs))
    useful = outer_iters * (inner_iters * inner_iter + outer_extra)
    hbm = 4 * (nx + N * nu + 2 + N * nu + (N + 1) * nx + 2)
    return KernelRoofline(
        name="fused_al_ilqr",
        flops_per_solve=float(useful),
        flops_main_loop=float(outer_iters * inner_iters * inner_iter),
        mxu_flops_issued=0.0,
        hbm_bytes_per_solve=float(hbm),
        bound="VPU",
        notes=(
            "lane-batched scalar-row kernel: VPU-bound; count is analytic "
            "from the kernel's unrolled row ops, +-30% fidelity"
        ),
    )
