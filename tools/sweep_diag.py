"""Characterize the nonlinear parking sweep's unconverged tail (round 2).

Runs the default sweep config on the real chip, regenerates the exact scenario
draws (same key split as ``parking_sweep``), and buckets the failures by
perturbation magnitude and start geometry. Optionally measures deeper-budget
variants to map the success/throughput tradeoff.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/sweep_diag.py [outer inner [tile]]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from model_predictive_control_tpu.models.parameters import VehicleParameters
from model_predictive_control_tpu.parallel.batch import (
    parking_sweep,
    perturb_parameters,
    random_initial_states,
    DEFAULT_PERTURB_FIELDS,
)

BATCH, STEPS = 2048, 50
outer = int(sys.argv[1]) if len(sys.argv) > 1 else 6
inner = int(sys.argv[2]) if len(sys.argv) > 2 else 15
tile = int(sys.argv[3]) if len(sys.argv) > 3 else 512

key = jax.random.PRNGKey(0)
t0 = time.perf_counter()
res, summary = parking_sweep(
    BATCH, STEPS, key=key, outer_iters=outer, inner_iters=inner, tile=tile
)
jax.block_until_ready(res.states)
t_compile = time.perf_counter() - t0
t0 = time.perf_counter()
res, summary = parking_sweep(
    BATCH, STEPS, key=jax.random.PRNGKey(0), outer_iters=outer, inner_iters=inner, tile=tile
)
jax.block_until_ready(res.states)
t_steady = time.perf_counter() - t0
print(f"outer={outer} inner={inner} tile={tile}: {summary} "
      f"steady {BATCH*STEPS/t_steady/1e3:.1f}k solves/s (first call {t_compile:.1f}s)")

# regenerate the draws exactly as parking_sweep does
k_par, k_x0 = jax.random.split(key)
base = VehicleParameters()
params = perturb_parameters(k_par, base, BATCH, rel_scale=0.1,
                            fields=DEFAULT_PERTURB_FIELDS, dtype=jnp.float32)
x0s = np.asarray(random_initial_states(k_x0, BATCH, x_obs=(0.25, 0.0, 0.0, 0.0),
                                       dtype=jnp.float32))

succ = np.asarray(res.logs["solver_success"])  # (STEPS, BATCH)
per_scen = succ.mean(axis=0)
dist = np.linalg.norm(np.asarray(res.states[-1])[:, :2], axis=-1)
parked = dist < 0.05
bad = per_scen < 1.0
print(f"scenarios with any failed step: {bad.sum()}/{BATCH} "
      f"(mean failed steps among them: {(1-per_scen[bad]).mean()*STEPS:.1f})")
print(f"parked<5cm: {parked.mean():.4f}; among fully-converged: "
      f"{parked[~bad].mean():.4f}; among tail: {parked[bad].mean():.4f}")
per_step = (~succ).sum(axis=1)
nz = {int(i): int(c) for i, c in enumerate(per_step) if c and i < 12}
print(f"failed per step (first 12): {nz} ... total {(~succ).sum()}")

for f in DEFAULT_PERTURB_FIELDS:
    v = np.asarray(getattr(params, f))
    b = float(getattr(base, f))
    reldev = np.abs(v - b) / abs(b)
    print(f"  {f}: mean|dev| tail {reldev[bad].mean():.4f} vs ok {reldev[~bad].mean():.4f}")
for i, name in enumerate(["px", "py", "heading", "v"]):
    print(f"  x0 {name}: tail mean {x0s[bad, i].mean():+.3f} (±{x0s[bad, i].std():.3f}) "
          f"vs ok {x0s[~bad, i].mean():+.3f} (±{x0s[~bad, i].std():.3f})")
