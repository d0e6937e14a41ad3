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


def ramp(global_idx, n: int, width: int, strength: float):
    """1-D damping ramp evaluated at (possibly shard-offset) global indices."""
    d = jnp.minimum(global_idx, n - 1 - global_idx)  # distance to nearest wall
    u = jnp.clip((width - d) / width, 0.0, 1.0)
    return 1.0 - strength * u**3


def damping_mask(ny: int, nx: int, width: int, strength: float = 0.02, dtype=jnp.float32):
    """(ny, nx) multiplicative mask, polynomial ramp in a `width`-cell layer."""
    ry = ramp(jnp.arange(ny, dtype=dtype), ny, width, strength)
    rx = ramp(jnp.arange(nx, dtype=dtype), nx, width, strength)
    return ry[:, None] * rx[None, :]


def local_damping_mask(y0, x0, ny_l: int, nx_l: int, ny: int, nx: int, width: int, strength: float = 0.02, dtype=jnp.float32):
    """Shard-local slice of the global mask, computed analytically from the
    shard's cell offsets (usable inside shard_map with traced offsets)."""
    ry = ramp(y0 + jnp.arange(ny_l, dtype=dtype), ny, width, strength)
    rx = ramp(x0 + jnp.arange(nx_l, dtype=dtype), nx, width, strength)
    return ry[:, None] * rx[None, :]


def apply_damping(f: FieldState, mask) -> FieldState:
    return FieldState(*(c * mask for c in f))
