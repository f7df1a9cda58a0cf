"""Parking-tail attack: detour-seeded warm starts for the identified bucket
(round 5, VERDICT r4 item 8).

The characterized tail (tools/sweep_diag.py, parking_sweep docstring):
behind-the-obstacle starts — px beyond the obstacle at (0.25, 0) with small
|py| — whose swing-around maneuvers graze the covering-circle clearance.
This probe seeds THOSE scenarios' step-0 warm start with a detour maneuver
(arc away from the obstacle line before approaching) instead of zeros, in
both steer directions plus a magnitude sweep, and measures
success/parked/throughput at the contract config against the zero-seed
baseline.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/tail_probe.py
Outcome (ship or negative result) goes to the parking_sweep docstring +
docs/ARCHITECTURE.md §3.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from model_predictive_control_tpu.models.parameters import VehicleParameters
from model_predictive_control_tpu.parallel.batch import (
    parking_sweep,
    random_initial_states,
)

BATCH, STEPS, N = 2048, 50, 30
X_OBS = (0.25, 0.0, 0.0, 0.0)


def bucket_mask(x0s):
    """The diagnosed tail bucket: starts beyond the obstacle with the
    obstacle near the straight line to the goal."""
    px, py = x0s[:, 0], x0s[:, 1]
    return (px > 0.28) & (jnp.abs(py) < 0.18)


def detour_seed(x0s, steer_sign: float, drive: float, steer: float,
                frac: float = 0.4):
    """(B, N, 2) warm controls: bucket lanes get a reversing arc away from
    the obstacle line for the first ``frac`` of the horizon; others zeros."""
    B = x0s.shape[0]
    m = bucket_mask(x0s).astype(jnp.float32)[:, None]
    s = jnp.where(x0s[:, 1:2] >= 0.0, 1.0, -1.0) * steer_sign
    n_seed = int(N * frac)
    stage = jnp.arange(N, dtype=jnp.float32)[None, :]
    on = (stage < n_seed).astype(jnp.float32)
    a = drive * on * m
    d = steer * s * on * m
    return jnp.stack([a, jnp.broadcast_to(d, (B, N))], axis=-1)


def run(u_seed=None, key=1):
    res, s = parking_sweep(
        BATCH, STEPS, key=jax.random.PRNGKey(key), u_seed=u_seed
    )
    return res, s


def main():
    key = jax.random.PRNGKey(1)
    _, k_x0 = jax.random.split(key)
    x0s = random_initial_states(k_x0, BATCH, x_obs=X_OBS, dtype=jnp.float32)
    n_bucket = int(np.asarray(bucket_mask(x0s)).sum())
    print(json.dumps({"bucket_size": n_bucket, "batch": BATCH}))

    # warm cache with a throwaway call
    parking_sweep(BATCH, STEPS, key=jax.random.PRNGKey(0))

    arms = [("baseline", None)]
    for name, ss, dr, st in [
        ("away+rev", +1.0, -0.7, 0.30),
        ("away+fwd", +1.0, 0.5, 0.30),
        ("toward+rev", -1.0, -0.7, 0.30),
        ("away+rev-strong", +1.0, -1.0, 0.38),
    ]:
        arms.append((name, detour_seed(x0s, ss, dr, st)))

    for name, seed in arms:
        t0 = time.perf_counter()
        res, s = run(u_seed=seed, key=1)
        jax.block_until_ready(res.states)
        dt = time.perf_counter() - t0
        succ = np.asarray(res.logs["solver_success"])  # (STEPS, B)
        per_scen = succ.mean(axis=0)
        bucket = np.asarray(bucket_mask(x0s))
        print(
            json.dumps(
                {
                    "arm": name,
                    "success_rate": round(float(s["success_rate"]), 4),
                    "bucket_success": round(
                        float(per_scen[bucket].mean()), 4
                    ),
                    "parked": round(float(s["parked_frac_5cm"]), 4),
                    "median_dist": round(float(s["median_final_dist"]), 4),
                    "solves_per_s": round(BATCH * STEPS / dt, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
