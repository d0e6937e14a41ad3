"""Field boundary conditions.

The reference supports periodic boundaries only (implicit in the neighbor
wrap, ``Auxiliar_functions.cpp:55-65``).  The laser-into-plasma benchmark
(BASELINE.json config 4) needs absorbing boundaries; we implement a masked
damping layer ("Berenger-lite"): fields are multiplied each step by a mask
that ramps smoothly from 1 in the interior to <1 at the wall, absorbing
outgoing waves with negligible reflection for layers >= ~12 cells.

Purely elementwise — XLA fuses it into the field update for free.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.state import FieldState


def damping_mask(ny: int, nx: int, width: int, strength: float = 0.02, dtype=jnp.float32):
    """(ny, nx) multiplicative mask, polynomial ramp in a `width`-cell layer."""

    def ramp(n):
        idx = jnp.arange(n, dtype=dtype)
        d = jnp.minimum(idx, n - 1 - idx)  # distance to nearest wall
        u = jnp.clip((width - d) / width, 0.0, 1.0)
        return 1.0 - strength * u**3

    return ramp(ny)[:, None] * ramp(nx)[None, :]


def apply_damping(f: FieldState, mask) -> FieldState:
    return FieldState(*(c * mask for c in f))
