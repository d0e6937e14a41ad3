"""Tiling load balance, TPU-native.

What the reference does: moves whole tiles between MPI ranks when a rank is
overloaded, tracked by a replicated owner table (Auxiliar_functions.cpp:
242-272, PIC_2D.cpp:398-412), with a hard-coded trigger policy.

Why the TPU problem is different: with fixed-capacity tile buckets and
dense batched kernels, *every chip already does identical work per step*
regardless of where particles sit — imbalance does not show up as idle
chips, it shows up as **capacity waste**: the bucket size K must cover the
most crowded tile, and dense kernels spend compute proportional to K, not
to the live particle count.  So load balance here means:

1. **Census** (this module): per-tile live counts and occupancy statistics,
   on device, psum-aggregated — the observable the reference never had
   (it *proposed* MPI_Wtime-driven balancing as future work, report §5).
2. **Re-binning** (particles/binning.py + parallel/exchange.py): keeps
   every particle in the bucket of the tile that owns its cells — the
   mechanism that replaces tile migration, run every rebin_interval steps.
3. **Adaptive capacity** (this module): when occupancy approaches K (or
   overflow drops particles), grow the buckets between jitted segments —
   the bounded-recompile answer to dynamic shapes (SURVEY.md §7 hard
   part #2).
4. **Occupancy-bounded compute** (ops/pallas kernel): per-tile dynamic
   trip counts make the hot kernels cost ~live particles instead of K,
   which is the true TPU analogue of work stealing.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import ParticleState


class LoadStats(NamedTuple):
    total: int  # live particles
    max_tile: int  # most crowded tile
    mean_tile: float
    capacity: int
    occupancy: float  # max_tile / capacity
    imbalance: float  # max_tile / mean_tile (1.0 = perfectly uniform)


def census(p: ParticleState) -> LoadStats:
    """Host-side load statistics for one species (works on sharded arrays —
    jnp reductions run distributed and replicate the scalars)."""
    counts = jnp.sum((p.w > 0).astype(jnp.int32), axis=1)
    total = int(counts.sum())
    mx = int(counts.max())
    mean = total / max(1, p.num_tiles)
    return LoadStats(
        total=total,
        max_tile=mx,
        mean_tile=mean,
        capacity=p.capacity,
        occupancy=mx / p.capacity,
        imbalance=mx / max(mean, 1e-9),
    )


def with_capacity(p: ParticleState, new_cap: int) -> ParticleState:
    """Grow (or shrink) bucket capacity.  Shrinking requires the occupied
    prefix to fit; growth pads with dead slots.  Host-side, outside jit."""
    cap = p.capacity
    if new_cap == cap:
        return p
    if new_cap > cap:
        def grow(a):
            return jnp.pad(a, ((0, 0), (0, new_cap - cap)))

        return ParticleState(*(grow(a) for a in p))
    # Shrink: keep live slots, which requires compaction first — re-bin the
    # buckets into themselves at the smaller capacity.
    from ..particles.binning import rebin_flat

    raise ValueError(
        "shrinking requires a re-bin at the new capacity; use "
        "rebin_flat(..., capacity=new_cap) explicitly"
    )


class CapacityManager:
    """Grow-on-pressure policy: watches StepDiag.overflow and occupancy and
    reallocates buckets between jitted segments.

    Every growth invalidates the compiled step (shapes change) — the driver
    re-jits; growth is geometric so the number of recompiles over a run is
    O(log(final/initial)).
    """

    def __init__(self, high_water: float = 0.9, growth: float = 1.5, check_every: int = 50):
        self.high_water = high_water
        self.growth = growth
        self.check_every = check_every

    def plan(self, stats: LoadStats, overflow: int) -> Optional[int]:
        """Return a new capacity if growth is needed, else None."""
        if overflow > 0 or stats.occupancy >= self.high_water:
            need = max(stats.max_tile + overflow, int(stats.capacity * self.growth))
            return -(-need // 8) * 8
        return None
