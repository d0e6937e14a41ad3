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


def with_capacity(p: ParticleState, new_cap: int, tiling=None) -> ParticleState:
    """Grow or shrink bucket capacity.  Growth pads with dead slots; shrink
    compacts by re-binning the slot pool into the smaller buckets (requires
    `tiling`, and every tile's live count must fit — checked, since losing
    particles to a *shrink* would be absurd).  Host-side, outside jit."""
    cap = p.capacity
    if new_cap == cap:
        return p
    if new_cap > cap:
        def grow(a):
            return jnp.pad(a, ((0, 0), (0, new_cap - cap)))

        return ParticleState(*(grow(a) for a in p))
    if tiling is None:
        raise ValueError("shrinking requires the tiling (to re-bin at the new capacity)")
    from ..particles.binning import rebin_flat

    # The fit check must use the POSITIONAL census (which tile each
    # particle belongs to now), not bucket occupancy: between re-bins a
    # drifted particle sits in a stale bucket, and rebin_flat sorts by
    # position — a bucket-count check would pass while the destination
    # tile overflows.  Host-side numpy; this runs outside jit.
    xs = np.asarray(p.x).ravel()
    ys = np.asarray(p.y).ravel()
    alive = np.asarray(p.w).ravel() > 0
    col = np.floor(xs[alive] / tiling.tile_nx).astype(np.int64)
    row = np.floor(ys[alive] / tiling.tile_ny).astype(np.int64)
    tid = np.clip(row, 0, tiling.tile_rows - 1) * tiling.tile_cols + np.clip(
        col, 0, tiling.tile_cols - 1
    )
    max_live = int(np.bincount(tid, minlength=tiling.num_tiles).max()) if tid.size else 0
    if max_live > new_cap:
        raise ValueError(f"cannot shrink to {new_cap}: a tile holds {max_live} live particles")
    flat = jax.tree_util.tree_map(lambda a: a.reshape(p.num_tiles * cap), p)
    out, ovf = rebin_flat(
        flat,
        tile_rows=tiling.tile_rows,
        tile_cols=tiling.tile_cols,
        tile_nx=tiling.tile_nx,
        tile_ny=tiling.tile_ny,
        capacity=new_cap,
    )
    if int(ovf) != 0:
        raise RuntimeError("shrink overflow despite positional census check")
    return out


class CapacityManager:
    """Grow-on-pressure policy: watches StepDiag.overflow and occupancy and
    reallocates buckets between jitted segments.

    Every growth invalidates the compiled step (shapes change) — the driver
    re-jits; growth is geometric so the number of recompiles over a run is
    O(log(final/initial)).
    """

    def __init__(
        self,
        high_water: float = 0.9,
        growth: float = 1.5,
        check_every: int = 50,
        low_water: float = 0.35,
        shrink_patience: int = 4,
        shrink_headroom: float = 1.4,
    ):
        self.high_water = high_water
        self.growth = growth
        self.check_every = check_every
        self.low_water = low_water
        self.shrink_patience = shrink_patience
        self.shrink_headroom = shrink_headroom
        self._calm = 0  # consecutive low-occupancy checks

    def plan(self, stats: LoadStats, overflow: int) -> Optional[int]:
        """Return a new capacity if a change is warranted, else None.

        Growth fires immediately on overflow or high occupancy.  Shrink
        (closing the capacity lifecycle: a transient hot spot must not
        inflate every tile's dense compute forever) waits out
        `shrink_patience` consecutive calm checks, then resizes to the
        observed peak plus headroom — hysteresis between low_water and
        1/shrink_headroom prevents flapping."""
        if overflow > 0 or stats.occupancy >= self.high_water:
            self._calm = 0
            need = max(stats.max_tile + overflow, int(stats.capacity * self.growth))
            return -(-need // 8) * 8
        if stats.occupancy < self.low_water:
            self._calm += 1
            if self._calm >= self.shrink_patience:
                self._calm = 0
                want = max(8, int(stats.max_tile * self.shrink_headroom))
                want = -(-want // 8) * 8
                if want < stats.capacity:
                    return want
        else:
            self._calm = 0
        return None
