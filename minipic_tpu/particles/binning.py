"""Particle re-binning into fixed-capacity tile buckets — the TPU-native
load-balance mechanism.

The reference balances load by migrating whole tiles between MPI ranks
through blocking sends and a replicated owner table
(removeTileFromRank/addTileToRank, Auxiliar_functions.cpp:242-272;
owner re-sync PIC_2D.cpp:398-412).  On TPU the equivalent invariant — "a
tile's identity is its (row, col); physics is independent of where its
particles are stored" (SURVEY.md §7) — is maintained *inside* the arrays:
particles are sorted by destination tile ID into a static
(num_tiles, capacity) layout every `rebin_interval` steps.  Cost model: one
argsort + gathers over the flat slot space, O(N log N) on device, no host
round-trips, jit-stable shapes.

Boundary handling happens here too (the only place positions are wrapped):
periodic wrap, or absorption (w := 0) for open boundaries.

Overflow: if more particles target a tile than its capacity, the excess is
dropped and counted (returned so drivers can grow capacity between jitted
segments — dynamic shapes are not available inside jit).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.geometry import Tiling
from ..core.state import ParticleState


def wrap_positions(p: ParticleState, nx: int, ny: int, periodic: bool) -> ParticleState:
    """Apply the box boundary to raw (unwrapped) positions in cell units."""
    if periodic:
        return p._replace(x=jnp.mod(p.x, nx), y=jnp.mod(p.y, ny))
    inside = (p.x >= 0) & (p.x < nx) & (p.y >= 0) & (p.y < ny)
    return p._replace(
        w=jnp.where(inside, p.w, 0.0),
        x=jnp.clip(p.x, 0.0, nx - 1e-3),
        y=jnp.clip(p.y, 0.0, ny - 1e-3),
    )


def rebin(p: ParticleState, tiling: Tiling) -> Tuple[ParticleState, jax.Array]:
    """Sort particles into their current tiles.

    Returns the re-bucketed ParticleState and the number of particles
    dropped to overflow (int32 scalar, 0 in healthy runs).
    """
    num_tiles, cap = p.num_tiles, p.capacity
    n = num_tiles * cap
    flat = jax.tree_util.tree_map(lambda a: a.reshape(n), p)

    col = jnp.floor(flat.x / tiling.tile_nx).astype(jnp.int32)
    row = jnp.floor(flat.y / tiling.tile_ny).astype(jnp.int32)
    col = jnp.clip(col, 0, tiling.tile_cols - 1)
    row = jnp.clip(row, 0, tiling.tile_rows - 1)
    tid = row * tiling.tile_cols + col
    # Dead slots sort to a sentinel bucket past the last tile.
    tid = jnp.where(flat.w > 0, tid, num_tiles).astype(jnp.int32)

    order = jnp.argsort(tid)  # stable -> preserves intra-tile locality
    tid_s = tid[order]
    # Slot within its tile = position minus the tile's first position.
    starts = jnp.searchsorted(tid_s, jnp.arange(num_tiles + 1, dtype=jnp.int32))
    slot = jnp.arange(n, dtype=jnp.int32) - starts[jnp.clip(tid_s, 0, num_tiles)]

    keep = (tid_s < num_tiles) & (slot < cap)
    dest = jnp.where(keep, tid_s * cap + slot, n)  # n = out-of-range -> drop
    overflow = jnp.sum((tid_s < num_tiles) & (slot >= cap))

    def scatter(a):
        out = jnp.zeros((n,), a.dtype)
        return out.at[dest].set(a[order], mode="drop").reshape(num_tiles, cap)

    return ParticleState(*(scatter(a) for a in flat)), overflow


def tile_counts(p: ParticleState) -> jax.Array:
    """Alive particles per tile — the load-balance observable (the
    reference's per-rank tile census, made a per-step on-device metric)."""
    return jnp.sum((p.w > 0).astype(jnp.int32), axis=1)
