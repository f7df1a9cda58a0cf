"""Fused batched AL-iLQR tracking kernel for the 6-state Pacejka bicycle.

Round-4 item 1: the dynamic-tier racing flagship (``parallel/batch.py::
racing_sweep_dynamic``) previously ran on the vmapped-XLA AL-iLQR — the backend
class this repo measured 30-80x slower than its fused kernels (``docs/
ARCHITECTURE.md`` §3). This kernel gives the 6-state dynamic single-track
(Pacejka tire, duty-cycle motor — the parameter surface the reference ships but
never drives, ``session_4/parameters.py:24-43``) the same VMEM-resident
treatment as the 4-state kernel (``ilqr_kernel.py``).

Since round 4b the kernel body lives in the model-parametric factory
(``ilqr_factory.py`` — batch-in-lanes layout, exact Jacobians of the
RK4-substepped step via one packed ``(nx + nu, T)`` jvp basis pack, sublane-
packed alpha-grid line search, per-scenario Levenberg/AL adaptivity, and the
Mosaic-compatible polynomial ``atan`` the magic formula needs); this module
is the Pacejka *instantiation* — the row-form single-track ODE
(``models/bicycle.py::dynamic_bicycle_ode`` math) plus the static parameter
plumbing. The factory refactor was trace-identical on this tier at the time
of the split; the factory's round-4b select-blend line search then took the
measured tier from 103k to 131.5k closed-loop solves/s at success 0.9998
(``BENCH_CONTRACT.json::racing_sweep_dynamic``). (An 8th line-search alpha
briefly pushed 131.5k → 134.5k but broke the per-solve stationarity
certificate on some draws and was reverted in round 5.)

Scope: tracking mode (the dynamic tier is a lap tracker; references are
required), input-box constraints (nc = 4) — matching the XLA twin
``racing_sweep_dynamic`` solves. The prediction model is RK4 with
``substeps`` Euler-style sub-intervals per MPC interval, identical to
``ops/integrators.py::rk4_fine`` semantics, so the XLA path configured with
the same ``pred_substeps`` is the oracle (tests/test_pallas_ilqr_dyn.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .ilqr_factory import (
    _ATAN_C,  # noqa: F401  (re-export; tests pin the polynomial)
    BatchedTrackerSolution,
    fused_tracker_solve,
    matan as _atan,  # noqa: F401  (re-export under the historical name)
)

NXD = 6  # (p_x, p_y, psi, v_x, v_y, omega)
NU = 2  # (drive a, steer delta)
NZ = NXD + NU  # jvp basis-pack width — exactly the VPU's 8 native sublanes

# Solution container: the factory's generic pytree under the historical name.
BatchedDynILQRSolution = BatchedTrackerSolution


@functools.lru_cache(maxsize=64)
def make_pacejka_ode_rows(model: tuple):
    """Row-form dynamic single-track ODE for the fused-tracker factory.

    ``model`` is the static constant tuple from :func:`model_tuple`; caching
    by it keeps the returned closure's identity stable, so every call with
    the same vehicle hits the same jit/pallas cache entry. Same math as
    ``models/bicycle.py::dynamic_bicycle_ode`` (reference constants at
    ``session_4/parameters.py:24-43``), written in elementwise row ops with
    the factory's Mosaic-compatible ``atan``.
    """
    LF, LR, M_, IZ, BF, CF, DF, BR, CR, DR, CM1, CM2, CR1, CR2 = model

    def ode_rows(xr, ur):
        px, py, psi, vx, vy, om = xr
        a, dl = ur
        eps = 1e-2
        vx_safe = jnp.where(
            vx >= 0.0, jnp.maximum(vx, eps), jnp.minimum(vx, -eps)
        )
        alpha_f = dl - _atan((om * LF + vy) / vx_safe)
        alpha_r = _atan((om * LR - vy) / vx_safe)
        F_f = DF * jnp.sin(CF * _atan(BF * alpha_f))
        F_r = DR * jnp.sin(CR * _atan(BR * alpha_r))
        F_x = (
            (CM1 - CM2 * vx) * a
            - CR2 * vx * jnp.abs(vx)
            - CR1 * jnp.tanh(vx / 0.01)
        )
        sp, cp = jnp.sin(psi), jnp.cos(psi)
        sd, cd = jnp.sin(dl), jnp.cos(dl)
        return (
            vx * cp - vy * sp,
            vx * sp + vy * cp,
            om,
            (F_x - F_f * sd) / M_ + vy * om,
            (F_r + F_f * cd) / M_ - vx * om,
            (F_f * LF * cd - F_r * LR) / IZ,
        )

    return ode_rows


def model_tuple(params) -> tuple:
    """Static Pacejka/motor parameter tuple for the kernel, from
    ``VehicleParameters`` (reference constants at ``session_4/parameters.py:24-43``)."""
    return tuple(
        float(getattr(params, f))
        for f in (
            "axis_front", "axis_rear", "mass", "inertia",
            "bf", "cf", "df", "br", "cr", "dr",
            "cm1", "cm2", "cr1", "cr2",
        )
    )


def al_ilqr_dyn_solve_pallas(
    x0s: jnp.ndarray,  # (B, 6)
    u_init: jnp.ndarray,  # (B, N, 2)
    refs: jnp.ndarray,  # (B, N + 1, 6) tracking reference windows
    *,
    N: int,
    ts: float,
    substeps: int,
    model: tuple,  # model_tuple(params)
    limits: tuple,  # (lb_u(2), ub_u(2))
    weights: tuple,  # (Qd(6), Rd(2), qn)
    outer_iters: int = 6,
    inner_iters: int = 15,
    mu_init: float = 10.0,
    mu_scale: float = 10.0,
    mu_max: float = 1e8,
    viol_tol: float = 1e-4,
    tol: float = 1e-6,
    tile: int = 512,
    interpret: bool | None = None,
) -> BatchedDynILQRSolution:
    """Batched 6-state Pacejka tracking AL-iLQR via the fused Pallas kernel;
    mirrors ``vmap(al_ilqr_solve)`` on the dynamic lap-tracking OCP
    (``racing_sweep_dynamic`` semantics) with per-scenario adaptivity."""
    return fused_tracker_solve(
        x0s,
        u_init,
        refs,
        ode_rows=make_pacejka_ode_rows(model),
        nx=NXD,
        nu=NU,
        N=N,
        ts=float(ts),
        substeps=substeps,
        limits=limits,
        weights=weights,
        outer_iters=outer_iters,
        inner_iters=inner_iters,
        mu_init=mu_init,
        mu_scale=mu_scale,
        mu_max=mu_max,
        viol_tol=viol_tol,
        tol=tol,
        tile=tile,
        interpret=interpret,
    )
