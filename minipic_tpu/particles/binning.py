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

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.geometry import Tiling
from ..core.state import ParticleState


def wrap_positions(p: ParticleState, nx: int, ny: int, periodic: bool) -> ParticleState:
    """Apply the box boundary to raw (unwrapped) positions in cell units.

    f32 gotcha: jnp.mod(a, n) can round to exactly n for a just below n,
    yielding an out-of-grid position that downstream binning would treat as
    off-grid (silently dropped, or worse).  Clamp the == n edge to 0.
    """
    if periodic:
        x = jnp.mod(p.x, nx)
        y = jnp.mod(p.y, ny)
        x = jnp.where(x >= nx, x - nx, x)
        y = jnp.where(y >= ny, y - ny, y)
        return p._replace(x=x, y=y)
    inside = (p.x >= 0) & (p.x < nx) & (p.y >= 0) & (p.y < ny)
    return p._replace(
        w=jnp.where(inside, p.w, 0.0),
        x=jnp.clip(p.x, 0.0, nx - 1e-3),
        y=jnp.clip(p.y, 0.0, ny - 1e-3),
    )


def rebin_flat(
    flat: ParticleState,
    *,
    tile_rows: int,
    tile_cols: int,
    tile_nx: int,
    tile_ny: int,
    capacity: int,
    row0=0,
    col0=0,
) -> Tuple[ParticleState, jax.Array]:
    """Sort a flat slot pool into (tile_rows*tile_cols, capacity) buckets.

    Tile indices derive from *global* positions minus the (row0, col0) tile
    offset of this (shard-local) tile grid — the sharded path reuses the
    same sort with traced offsets.  Slots landing outside the local grid or
    with w == 0 are dropped silently (off-grid slots must have been routed
    away beforehand); capacity overflow is counted and returned.
    """
    num_tiles = tile_rows * tile_cols
    col = jnp.floor(flat.x / tile_nx).astype(jnp.int32) - col0
    row = jnp.floor(flat.y / tile_ny).astype(jnp.int32) - row0
    in_grid = (col >= 0) & (col < tile_cols) & (row >= 0) & (row < tile_rows)
    tid = (row * tile_cols + col).astype(jnp.int32)
    return rebin_by_tid(flat, tid, in_grid, num_tiles, capacity)


def rebin_by_tid(
    flat: ParticleState,
    tid: jax.Array,
    in_grid: jax.Array,
    num_tiles: int,
    capacity: int,
) -> Tuple[ParticleState, jax.Array]:
    """Filler-key sort with caller-supplied destination buckets: `tid` is
    each slot's local bucket index and `in_grid` whether the slot belongs
    to this shard at all.  rebin_flat derives (tid, in_grid) from positions
    on a contiguous local tile grid; the striped/balanced placement
    (parallel/balanced.py) derives them from an arbitrary gid -> local
    map.  Semantics otherwise identical to rebin_flat."""
    n = flat.x.shape[0]
    out_n = num_tiles * capacity
    assert n >= out_n, "slot pool smaller than bucket space"

    alive = (flat.w > 0) & in_grid
    # Live slots *outside* the grid must not exist (wrap/routing handles
    # them); if any slip through, the filler bookkeeping below would assign
    # them as live-weight "fillers" in arbitrary buckets.  Force the slow
    # path and count them.
    off_grid_live = jnp.sum(((flat.w > 0) & ~in_grid).astype(jnp.int32))

    # TPU cost model (measured on v5e): a random 12M-element gather ~100 ms,
    # a 7-operand lax.sort ~100 ms *total*, scatter far worse.  So the only
    # affordable plan is ONE multi-operand sort whose result is already the
    # bucket layout.  Trick: assign every dead slot a *filler key* chosen so
    # tile t receives exactly (capacity - count_t) fillers; then the stable
    # sort emits exactly `capacity` elements per tile and bucketizing is a
    # reshape — zero gathers, zero scatters.
    #
    # Fast path precondition: no tile over capacity.  Overflow is detected
    # from the key-only pre-sort and handled by a gather-based slow path
    # under lax.cond (rare; pays ~6 gathers only when it actually happens).
    key_alive = jnp.where(alive, tid, num_tiles)
    sorted_keys = jnp.sort(key_alive)
    starts = jnp.searchsorted(sorted_keys, jnp.arange(num_tiles + 1, dtype=jnp.int32))
    counts = starts[1:] - starts[:num_tiles]
    overflow = jnp.sum(jnp.maximum(counts - capacity, 0)).astype(jnp.int32)

    payload = tuple(flat)

    def fast(_):
        fill = capacity - jnp.minimum(counts, capacity)  # [T]
        fill_cum = jnp.cumsum(fill)
        dead_rank = jnp.cumsum((~alive).astype(jnp.int32))  # 1-based among dead
        # compare_all: broadcast compare against the [T] boundary table on
        # the VPU — the default bisection 'scan' lowers to ~9 rounds of
        # 12M-element gathers (~100 ms each on TPU, measured).
        filler_tid = jnp.searchsorted(
            fill_cum, dead_rank, side="left", method="compare_all"
        ).astype(jnp.int32)
        # Alive keys 2t sort before filler keys 2t+1, so each bucket comes
        # out *live-compacted* (live slots first) — which lets the fused
        # kernels bound their trip counts by per-tile occupancy.
        keys = jnp.where(alive, 2 * tid, 2 * filler_tid + 1)
        s = jax.lax.sort((keys,) + payload, num_keys=1)
        return tuple(a[:out_n].reshape(num_tiles, capacity) for a in s[1:])

    def slow(_):
        order = jnp.argsort(key_alive)
        src = order[
            jnp.minimum(starts[:num_tiles, None] + jnp.arange(capacity)[None, :], n - 1)
        ]
        valid = jnp.arange(capacity)[None, :] < counts[:, None]
        return tuple(jnp.where(valid, a[src], 0) for a in payload)

    outs = jax.lax.cond((overflow == 0) & (off_grid_live == 0), fast, slow, None)
    return ParticleState(*outs), (overflow + off_grid_live).astype(jnp.int32)


def rebin(p: ParticleState, tiling: Tiling) -> Tuple[ParticleState, jax.Array]:
    """Single-device re-binning over the full tile grid."""
    flat = jax.tree_util.tree_map(lambda a: a.reshape(p.num_tiles * p.capacity), p)
    return rebin_flat(
        flat,
        tile_rows=tiling.tile_rows,
        tile_cols=tiling.tile_cols,
        tile_nx=tiling.tile_nx,
        tile_ny=tiling.tile_ny,
        capacity=p.capacity,
    )


def rebin_incremental(
    p: ParticleState,
    tiling: Tiling,
    mover_cap: int,
    *,
    interpret: bool = False,
) -> Tuple[ParticleState, jax.Array, jax.Array]:
    """Movers-only re-binning (single device), unconditional: every tile
    extracts (force=True — buffer overflow drops and counts rather than
    deferring, preserving this helper's documented 'dropped' semantics).

    Extracts particles that left their bucket's tile (Pallas compaction
    kernel), routes just those through the filler-key sort, and appends
    them at each destination bucket's watermark.  Cost scales with the
    mover fraction instead of total slots.  Buckets develop interior holes;
    prefer rebin_auto, which adds deferral and the merge-defrag path.

    Returns (p2, dropped, max_watermark_after).
    """
    from ..ops.pallas.rebin_kernels import append_incoming, extract_movers

    p1, movers, wm, dropped_a, incoming, ovf_small = _extract_and_route(
        p, tiling, mover_cap, interpret
    )
    n_in = jnp.sum((incoming.w > 0).astype(jnp.int32), axis=1)
    p2, dropped_b = append_incoming(p1, incoming, wm, interpret=interpret)
    dropped = dropped_a.sum() + ovf_small + dropped_b.sum()
    wm_after = jnp.max(wm + n_in)
    return p2, dropped.astype(jnp.int32), wm_after


def _extract_and_route(p, tiling, mover_cap, interpret):
    from ..ops.pallas.rebin_kernels import extract_movers

    p1, movers, wm, dropped_a = extract_movers(
        p,
        tile_rows=tiling.tile_rows,
        tile_cols=tiling.tile_cols,
        tile_ny=tiling.tile_ny,
        tile_nx=tiling.tile_nx,
        force=True,
        b_cap=mover_cap,
        interpret=interpret,
    )
    flat = jax.tree_util.tree_map(
        lambda a: a.reshape(p.num_tiles * mover_cap), movers
    )
    incoming, ovf_small = rebin_flat(
        flat,
        tile_rows=tiling.tile_rows,
        tile_cols=tiling.tile_cols,
        tile_nx=tiling.tile_nx,
        tile_ny=tiling.tile_ny,
        capacity=mover_cap,
    )
    return p1, movers, wm, dropped_a, incoming, ovf_small


def _seg_neighbor_table(tiling: Tiling):
    """Static [T, 8] i32 table for the fused append: nbr[t, d] is the flat
    index of the tile whose direction-d segment lands at tile t — t's
    (-DIR_OFFSETS[d])-neighbor on the periodic tile grid.  Equivalent to
    the _roll_segments rolls, expressed as per-tile source indices so
    append_segments' BlockSpec index maps can fetch runs in place."""
    import numpy as np

    from ..ops.pallas.rebin_kernels import DIR_OFFSETS

    tr, tc = tiling.tile_rows, tiling.tile_cols
    r = np.arange(tr)[:, None, None]
    c = np.arange(tc)[None, :, None]
    dr = np.array([o[0] for o in DIR_OFFSETS])[None, None, :]
    dc = np.array([o[1] for o in DIR_OFFSETS])[None, None, :]
    nbr = ((r - dr) % tr) * tc + (c - dc) % tc  # [tr, tc, 8]
    return jnp.asarray(nbr.reshape(tr * tc, 8), jnp.int32)


def _seg_arrival_counts(seg, nbr, b_seg: int) -> jax.Array:
    """Per-tile arrival count for the packed segment layout: direction-d
    arrivals at t are the live slots of nbr[t, d]'s d-th segment run."""
    t_total = seg.shape[0]
    cnt = jnp.sum(
        (seg[:, 5].reshape(t_total, 8, b_seg) > 0).astype(jnp.int32), axis=2
    )  # [T, 8]
    return jnp.sum(jnp.take_along_axis(cnt, nbr, axis=0), axis=1)


def _roll_segments(seg: ParticleState, tiling: Tiling, b_seg: int) -> ParticleState:
    """Deal-route stage 2: arrivals at tile t, direction d, are the d-th
    segment of t's (-d)-neighbor — a static roll of the tile grid, free of
    any sort or gather.  Works for the contiguous row-major tile layout
    (single-device / block-sharded); the striped layout routes via
    all_gather instead (parallel/balanced.py)."""
    from ..ops.pallas.rebin_kernels import DIR_OFFSETS

    tr, tc = tiling.tile_rows, tiling.tile_cols
    rolled = []
    for ch in tuple(seg):
        seg4 = ch.reshape(tr, tc, 8, b_seg)
        parts = [
            jnp.roll(seg4[:, :, d], (dr, dc), axis=(0, 1))
            for d, (dr, dc) in enumerate(DIR_OFFSETS)
        ]
        rolled.append(
            jnp.stack(parts, axis=2).reshape(tr * tc, 8 * b_seg)
        )
    return ParticleState(*rolled)


def rebin_auto(
    p: ParticleState,
    tiling: Tiling,
    mover_cap: int,
    *,
    interpret: bool = False,
    force=False,
    seg_cap: int = 0,
) -> Tuple[ParticleState, jax.Array, jax.Array]:
    """Sortless incremental re-bin: extract movers (all-or-nothing per
    tile), route them through the small filler-key sort, and append at the
    watermarks — with an in-bucket streaming DEFRAG (no global sort) when
    the append would not fit.

    Returns (p2, dropped, pending):
    * dropped — particles actually lost (destination bucket/in-buffer truly
      over capacity, or forced extraction overflow); drivers grow capacity.
    * pending — movers left in place because a tile's outgoing buffer was
      too small this pass (nothing lost).  The caller must NOT reset its
      drift budget while pending > 0, so the next step re-triggers and
      drains the backlog; pass force=True once the budget is exhausted to
      drop-and-count instead (never corrupt physics silently).

    Replaces the old full-sort fallback: the 7-operand global sort put
    ~6 GB of transients in the jitted step's arena at 1e8 slots (the whole
    program peaked at 15.97/16 GB); the defrag kernel streams buckets
    through VMEM with no HBM transients at all.  The split kernel compacts
    stayers in the same pass that extracts movers, so buckets never
    accumulate watermark holes and the append path stays hot (the old
    extract-only pass left leavers' slots as holes, forcing the
    merge-defrag on essentially every re-bin at tight headroom)."""
    from ..ops.pallas.rebin_kernels import (
        append_incoming, append_runs, append_segments, defrag_buckets,
        segment_movers, split_buckets, unpack_segments,
    )

    p1, movers, wm, pending = split_buckets(
        p,
        tile_rows=tiling.tile_rows,
        tile_cols=tiling.tile_cols,
        tile_ny=tiling.tile_ny,
        tile_nx=tiling.tile_nx,
        b_cap=mover_cap,
        interpret=interpret,
        force=force,
    )
    # Deal route (seg_cap > 0): movers are binned by destination direction
    # (one Pallas pass over the small mover pool), arrivals fetched by
    # static grid rolls — no sort in the loop at all.  Measured: the
    # filler-key route sort was 216 ms/re-bin at the bench deck's
    # T x mover_cap = 1e7 slots; the segment pass touches 10x fewer slots
    # and the rolls are pure copies.  seg_cap == 0 keeps the sort route
    # (non-contiguous layouts, tiny decks).
    use_seg = seg_cap > 0 and p.capacity >= 8 * seg_cap + 256
    # Fused rolls+append (append_segments) reads arrival runs in place
    # from the packed segment array via the static neighbor table and
    # streams only the watermark slab of each bucket — ~3x fewer HBM
    # bytes than materializing `incoming` (knob for on-chip A/B).
    # On-chip validation (docs/R5_BATCH.log batch D/D2): bit-equal to
    # the unfused route on hardware, bench 1.0455e9 vs 1.0357e9
    # unfused.  Two hardware-only constraints shaped the kernel — the
    # slab DMA needs the [T, 1, cap] bucket view (Mosaic rejects 1-row
    # slices of a (8,128)-tiled dim) and the neighbor table prefetch
    # must be [8, T] (SMEM lane-padding) — neither visible in
    # interpret mode.
    fused = use_seg and os.environ.get("MINIPIC_APPEND_FUSED", "1") == "1"
    incoming = None
    if use_seg:
        seg_raw, ovf_small_t = segment_movers(
            movers,
            tile_rows=tiling.tile_rows,
            tile_cols=tiling.tile_cols,
            tile_ny=tiling.tile_ny,
            tile_nx=tiling.tile_nx,
            b_seg=seg_cap,
            interpret=interpret,
            packed=True,
        )
        nbr = _seg_neighbor_table(tiling)
        n_in = _seg_arrival_counts(seg_raw, nbr, seg_cap)
        if not fused:
            incoming = _roll_segments(
                unpack_segments(seg_raw), tiling, seg_cap
            )
        ovf_small = ovf_small_t.sum()
    else:
        incoming, ovf_small = _route(movers, p, tiling, mover_cap)
        n_in = jnp.sum((incoming.w > 0).astype(jnp.int32), axis=1)
    # wm == live stay count (split-compacted).  The watermark append needs
    # 128 lanes of anchor-alignment slack; when any bucket is tighter than
    # that, the merge-defrag pass places arrivals with no slack at all
    # (fits whenever census <= capacity).
    headroom_ok = jnp.all(wm + n_in <= p.capacity - 256)

    def fast(pp):
        if fused:
            return append_segments(
                pp, seg_raw, wm, nbr, b_seg=seg_cap, interpret=interpret
            )
        if use_seg:
            return append_runs(
                pp, incoming, wm, b_seg=seg_cap, interpret=interpret
            )
        return append_incoming(pp, incoming, wm, interpret=interpret)

    def slow(pp):
        # The defrag fallback is rare (headroom exhaustion); materialize
        # the rolled incoming only inside this branch when fused.
        inc = incoming
        if inc is None:
            inc = _roll_segments(unpack_segments(seg_raw), tiling, seg_cap)
        pd, _counts, dropped = defrag_buckets(
            pp, inc, interpret=interpret
        )
        return pd, dropped

    p2, dropped_b = jax.lax.cond(headroom_ok, fast, slow, p1)
    dropped = (ovf_small + dropped_b.sum()).astype(jnp.int32)
    if not (isinstance(force, bool) and not force):
        # Forced passes convert the backlog into counted drops.
        forced = jnp.asarray(force)
        dropped = dropped + jnp.where(forced, pending.sum(), 0).astype(jnp.int32)
        pending_out = jnp.where(forced, 0, pending.sum()).astype(jnp.int32)
    else:
        pending_out = pending.sum().astype(jnp.int32)
    return p2, dropped, pending_out


def _route(movers, p, tiling, mover_cap):
    flat = jax.tree_util.tree_map(
        lambda a: a.reshape(p.num_tiles * mover_cap), movers
    )
    return rebin_flat(
        flat,
        tile_rows=tiling.tile_rows,
        tile_cols=tiling.tile_cols,
        tile_nx=tiling.tile_nx,
        tile_ny=tiling.tile_ny,
        capacity=mover_cap,
    )


def tile_counts(p: ParticleState) -> jax.Array:
    """Alive particles per tile — the load-balance observable (the
    reference's per-rank tile census, made a per-step on-device metric)."""
    return jnp.sum((p.w > 0).astype(jnp.int32), axis=1)
