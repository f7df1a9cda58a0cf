"""Checkpoint / deterministic resume for long batch sweeps (SURVEY §5.4).

The reference never persists anything (runs are seconds; outputs live in plots).
Pod-scale sweeps (65k scenarios × parameter perturbations, BASELINE config 5) run
long enough to want restartability: persist the loop state — current plant states,
warm-start carry, RNG key, step index — and resume bit-exactly (the closed loop is
deterministic given that state).

Format: a single ``.npz`` with a JSON-encoded pytree structure record; no orbax
dependency (flat arrays are all we ever store), loadable anywhere numpy runs.
"""

from __future__ import annotations

import json

import jax
import numpy as np


def save_sweep_state(path: str, step: int, state_pytree) -> str:
    """Write the sweep state. ``state_pytree``: arbitrary pytree of arrays (plant
    states, warm carries, RNG keys...)."""
    leaves, treedef = jax.tree.flatten(state_pytree)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    np.savez(
        path,
        __meta__=json.dumps({"step": int(step), "treedef": str(treedef)}),
        **arrays,
    )
    return path


def load_sweep_state(path: str, like_pytree):
    """Load ``(step, state_pytree)``; ``like_pytree`` supplies the tree structure
    (treedefs are not portably serializable — the caller rebuilds the same loop, so
    it always has the structure at hand)."""
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["__meta__"]))
        _, treedef = jax.tree.flatten(like_pytree)
        n = treedef.num_leaves
        leaves = [data[f"leaf_{i}"] for i in range(n)]
    return meta["step"], jax.tree.unflatten(treedef, leaves)
