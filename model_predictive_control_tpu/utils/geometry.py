"""Collision geometry: pose transforms and covering circles.

Same math as the reference's ``x2T`` / ``create_cover_circles``
(``session_4/main.py:173-200``): the car rectangle (length l, width w) is covered by
``n_c`` circles of radius ``r = √(d² + w²/4)`` with ``d = l/(2 n_c)``, centered at
``(2k+1)d − l/2`` along the body x-axis; anti-collision between two bodies is
``‖c_v − c_o‖² ≥ (r_v + r_o)²`` for all circle pairs (9 constraints/stage for
``n_c = 3``, ``main.py:95-104``).

JAX-native: no 3×3 symbolic homogeneous matrices — circle centers transform directly
with a rotation + translation, which vmaps and differentiates cleanly.
"""

from __future__ import annotations

import jax.numpy as jnp


def cover_circle_offsets(length: float, width: float, n_circles: int = 3):
    """Body-frame circle centers (n_c, 2) and common radius (main.py:191-200)."""
    d = length / (2 * n_circles)
    r = (d**2 + (width**2) / 4.0) ** 0.5
    k = jnp.arange(n_circles, dtype=jnp.float32)
    cx = (2.0 * k + 1.0) * d - length / 2.0
    centers = jnp.stack([cx, jnp.zeros_like(cx)], axis=1)
    return centers, r


def transform_circles(pose: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """World-frame circle centers for a body at ``pose = (px, py, ψ, ...)``.

    Equivalent to ``T(x) @ [cx, 0, 1]`` with the homogeneous transform of
    ``main.py:173-188``, written as rotate+translate. ``offsets``: (n_c, 2).
    """
    psi = pose[2]
    c, s = jnp.cos(psi), jnp.sin(psi)
    R = jnp.array([[c, -s], [s, c]], dtype=offsets.dtype)
    return offsets @ R.T + pose[:2]


def pairwise_sq_distances(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(n, 2) × (m, 2) → (n*m,) squared distances, row-major over (a_i, b_j) —
    matching the reference's nested comprehension order (main.py:102-103)."""
    diff = a[:, None, :] - b[None, :, :]
    return jnp.sum(diff * diff, axis=-1).reshape(-1)
