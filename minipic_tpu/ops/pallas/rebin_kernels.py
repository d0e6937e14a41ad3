"""Pallas kernels for incremental re-binning.

The full-sort re-bin (particles/binning.py) costs one 7-operand sort over
*every* slot (measured ~1.7 s at 105M slots on v5e) even though only a few
percent of particles change tile between passes.  The incremental path
touches sorted data proportional to the *movers*:

  1. ``extract_movers`` (kernel, grid over tiles): scan each bucket in
     lane chunks; zero the weight of slots whose position left the tile;
     compact the movers into a per-tile outgoing buffer.  Compaction is a
     chunk-local **permutation matmul** — prefix ranks via an upper-
     triangular matmul, then a one-hot placement matmul — because Mosaic
     has no cumsum/scatter and the MXU does a [kc, kc] product per kc slots
     essentially for free.  Also emits each bucket's post-extraction
     watermark (highest live slot + 1) and an overflow count, encoded in
     spare channels of the outgoing buffer (scalar outputs don't fit
     Mosaic's output tiling rules).
  2. The mover set (a few % of slots) goes through the ordinary filler-key
     sort (rebin_flat) to form per-tile *incoming* buckets.
  3. ``append_incoming`` (kernel): writes each tile's incoming slab at its
     watermark via one dynamic-slice store (aliased in-place outputs).

Buckets develop interior holes (w == 0 below the watermark); the advance
kernel's occupancy guard uses watermarks, and a periodic full-sort defrag
(driven by watermark pressure, see binning.rebin_auto) restores compactness.
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.state import ParticleState

# Outgoing buffer channels: 0..5 = x, y, px, py, pz, w;
# channel 6, lane 0 = watermark; ch 6, lane 1 = dropped count; ch 7 spare.
N_CH = 8


def _upper_tri(n):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (r <= c).astype(jnp.float32)


def _permute_dot(payload, p_mat, wsplit):
    """payload [R, kc] x permutation p_mat [kc_out, kc] -> [R, kc_out],
    contracting the lane axis; the payload must pass through EXACTLY.

    wsplit True (bf16 words): the permutation matrix is 0/1 — exactly
    representable in bf16 — so only the payload needs word-splitting:
    three exact bf16 words stacked along K against three copies of p_mat,
    ONE DEFAULT-precision issue.  Exact reconstruction (each output
    column sums one payload column per word), at HALF the MAC count of
    XLA-HIGHEST's six word-pair passes (which cannot know p_mat needs
    only one word).

    wsplit "int8" (byte transport): a permutation is a pure SELECTION, so
    move the raw BYTES — bitcast the f32 payload to four int8 byte planes
    stacked on M, one int8 x int8 dot (int32 accumulation, each output
    element is a single selected byte: exact, two's-complement wrap and
    all), reassemble with masks+shifts and bitcast back.  Same K length
    as ONE bf16 word pass at the MXU's 2x int8 rate — 6x fewer MXU
    cycles than the 3-word bf16 stack; the byte plane extract/reassemble
    is lane-wise VPU the (measured-underutilized) vector core absorbs."""
    if wsplit == "int8":
        r = payload.shape[0]
        u = jax.lax.bitcast_convert_type(payload, jnp.int32)  # [R, kc]
        planes = [u & 0xFF, (u >> 8) & 0xFF, (u >> 16) & 0xFF,
                  (u >> 24) & 0xFF]
        bb = jnp.concatenate(planes, axis=0).astype(jnp.int8)  # [4R, kc]
        d = jax.lax.dot_general(
            bb, p_mat.astype(jnp.int8), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [4R, kc_out] — each entry one byte value in [0, 255]
        o0, o1, o2, o3 = (d[i * r : (i + 1) * r] & 0xFF for i in range(4))
        v = o0 | (o1 << 8) | (o2 << 16) | (o3 << 24)
        return jax.lax.bitcast_convert_type(v, jnp.float32)
    if not wsplit:
        return jax.lax.dot_general(
            payload, p_mat.astype(jnp.float32),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    w0 = payload.astype(jnp.bfloat16)
    r = payload - w0.astype(jnp.float32)
    w1 = r.astype(jnp.bfloat16)
    w2 = (r - w1.astype(jnp.float32)).astype(jnp.bfloat16)
    pw = jnp.concatenate([w0, w1, w2], axis=1)
    pm = p_mat.astype(jnp.bfloat16)
    pmw = jnp.concatenate([pm, pm, pm], axis=1)
    return jax.lax.dot_general(
        pw, pmw, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )


def _scan_compact(mask, payload, kc: int):
    """Stable lane compaction of `payload` [R, kc] columns where `mask`
    [1, kc] holds, via bit-serial shuffles — O(R log kc) vector ops on the
    VPU instead of an O(kc) permutation matmul on the MXU.

    NEGATIVE RESULT, kept for the record: on v5e this is ~2x SLOWER than
    the permutation matmul inside the split kernel (bench 6.44 -> 4.67e8
    pushes/s) — the 7-level masked-roll dependency chain serializes worse
    than the MXU dots, which pipeline against the rest of the chunk.
    Correct (covered by the interpret-mode split tests while it was wired
    in) but unused on the hot path.

    Destinations are the exclusive scan of the mask (monotone shifts), so
    the classic bit-by-bit move is collision-free: at level b an element
    moves left by 2^b iff bit b of its remaining shift is set.  Returns
    (count, compacted payload with zeros beyond count)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, kc), 1)
    keep = mask.astype(jnp.int32)

    # Inclusive lane cumsum via Hillis-Steele (log2(kc) masked rolls).
    inc = keep
    d = 1
    while d < kc:
        rolled = pltpu.roll(inc, d, 1)  # content moves to higher lanes
        inc = inc + jnp.where(lane >= d, rolled, 0)
        d *= 2
    cnt = inc[0, kc - 1]
    excl = inc - keep
    sh = lane - excl  # monotone non-decreasing shift-left amounts

    v = payload
    b = 1
    while b < kc:
        # Candidate = element 2^b lanes to the right (left-roll by b).
        cand_v = pltpu.roll(v, kc - b, 1)
        cand_sh = pltpu.roll(sh, kc - b, 1)
        valid = lane < (kc - b)
        take = ((cand_sh // b) % 2 == 1) & valid
        v = jnp.where(take, cand_v, v)
        sh = jnp.where(take, cand_sh - b, sh)
        b *= 2
    v = jnp.where(lane < cnt, v, 0.0)
    return cnt, v


def _extract_kernel(
    rc_ref,  # scalar-prefetch [2T+1]: tile rows, tile cols, force flag
    x_ref, y_ref, px_ref, py_ref, pz_ref, w_ref,  # in: [1, 1, K]
    wo_ref,  # out: [1, 1, K] new weights
    mov_ref,  # out: [1, N_CH, B] outgoing buffer (channel-major)
    *,
    tile_nx: int, tile_ny: int, tile_cols: int, tile_rows: int,
    kc: int, n_chunks: int, b_cap: int, n_tiles: int, wsplit: bool = True,
):
    t = pl.program_id(0)
    my_row = rc_ref[t].astype(jnp.float32)
    my_col = rc_ref[n_tiles + t].astype(jnp.float32)

    mov_ref[...] = jnp.zeros(mov_ref.shape, mov_ref.dtype)
    tri = _upper_tri(kc)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, kc), 1)
    out_row = jax.lax.broadcasted_iota(jnp.int32, (kc, kc), 0)

    def classify(c):
        sl = pl.ds(c * kc, kc)
        xc = x_ref[0, 0, sl].reshape(1, kc)
        yc = y_ref[0, 0, sl].reshape(1, kc)
        wc = w_ref[0, 0, sl].reshape(1, kc)
        col = jnp.floor(xc * (1.0 / tile_nx))
        row = jnp.floor(yc * (1.0 / tile_ny))
        alive = wc > 0
        moving = alive & ((col != my_col) | (row != my_row))
        return xc, yc, wc, alive, moving

    # Preflight: total movers in this tile.  If they exceed the buffer,
    # extract NOTHING (all-or-nothing): the tile passes through untouched
    # and reports its mover count as left_behind — the caller keeps the
    # drift budget un-reset so the next step immediately re-triggers and
    # drains the backlog.  (Partial extraction would have to decide which
    # particles to lose; deferral loses none.)  Vectorized over the whole
    # bucket row — a fori over kc-chunks serializes ~cap/kc tiny
    # iterations whose loop overhead dominated the count.
    xf = x_ref[0, 0, :].reshape(1, n_chunks * kc)
    yf = y_ref[0, 0, :].reshape(1, n_chunks * kc)
    wf = w_ref[0, 0, :].reshape(1, n_chunks * kc)
    mov_all = (wf > 0) & (
        (jnp.floor(xf * (1.0 / tile_nx)) != my_col)
        | (jnp.floor(yf * (1.0 / tile_ny)) != my_row)
    )
    total_movers = jnp.sum(mov_all.astype(jnp.int32)).astype(jnp.int32)
    # Flushes are whole-kc blocks, so the usable buffer is floor(b/kc)*kc.
    fits_tile = total_movers <= (b_cap // kc) * kc
    # force != 0: extract anyway, dropping the overflow (the caller's
    # last-resort drain when the drift budget is exhausted and deferral
    # is no longer safe; losses are counted and surfaced).
    forced = rc_ref[2 * n_tiles] != 0
    extract_tile = fits_tile | forced

    def scoped(pend_ref):
        # Staging buffer [N_CH, 2*kc]: compacted movers of each chunk are
        # rotated to the current pending offset and added (zero regions
        # never collide).  Mosaic only allows 128-aligned dynamic lane
        # stores, so the HBM buffer is written in whole kc-blocks whenever
        # a full block is pending (cursor stays a kc multiple).
        pend_ref[...] = jnp.zeros(pend_ref.shape, pend_ref.dtype)

        def body(c, carry):
            cursor, pc, wm, dropped = carry
            sl = pl.ds(c * kc, kc)
            xc, yc, wc, alive, moving = classify(c)
            moving = moving & extract_tile
            mf = moving.astype(jnp.float32)

            # zero leavers' weights in place
            wo_ref[0, 0, sl] = jnp.where(moving, 0.0, wc).reshape(kc)

            # watermark over stayers
            stay_idx = jnp.where(alive & ~moving, lane + c * kc + 1, 0)
            wm = jnp.maximum(wm, jnp.max(stay_idx))

            # chunk-local compaction: rank (1-based) via triangular matmul.
            # DEFAULT is exact at ANY kc: the 0/1 operands are exactly
            # representable in bf16 and the MXU accumulates in f32
            # (preferred_element_type), so integer ranks are exact to 2^24.
            rank_prec = jax.lax.Precision.DEFAULT
            rank = jax.lax.dot_general(
                mf, tri, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                precision=rank_prec,
            )  # [1, kc]
            cnt = rank[0, kc - 1].astype(jnp.int32)
            p_mat = ((rank - 1.0) == out_row.astype(jnp.float32)) & moving
            payload = jnp.concatenate(
                [xc, yc, px_ref[0, 0, sl].reshape(1, kc),
                 py_ref[0, 0, sl].reshape(1, kc), pz_ref[0, 0, sl].reshape(1, kc),
                 wc * mf, jnp.zeros((2, kc), jnp.float32)],
                axis=0,
            )  # [N_CH, kc]
            compact = _permute_dot(payload, p_mat, wsplit)
            # [N_CH, kc] -- mover m in column m

            # Append at the pending offset: rotate right by pc (< kc, and
            # pc + cnt <= 2*kc so live data never wraps) and accumulate.
            cpad = jnp.concatenate(
                [compact, jnp.zeros((N_CH, kc), jnp.float32)], axis=1
            )
            pend_ref[...] += pltpu.roll(cpad, pc, 1)
            pc = pc + cnt

            # Flush a full kc block when available.
            @pl.when(pc >= kc)
            def _flush():
                fits = cursor + kc <= b_cap

                @pl.when(fits)
                def _w():
                    mov_ref[0, :, pl.ds(pl.multiple_of(cursor, kc), kc)] = (
                        pend_ref[:, :kc]
                    )

                # left-by-kc == right-by-kc on a 2*kc-wide buffer
                shifted = pltpu.roll(pend_ref[...], kc, 1)
                zero_tail = jax.lax.broadcasted_iota(jnp.int32, (N_CH, 2 * kc), 1) < kc
                pend_ref[...] = jnp.where(zero_tail, shifted, 0.0)

            flushed = pc >= kc
            over = flushed & (cursor + kc > b_cap)
            dropped = dropped + jnp.where(over, kc, 0)
            cursor = cursor + jnp.where(flushed & ~over, kc, 0)
            pc = jnp.where(flushed, pc - kc, pc)
            return cursor, pc, wm, dropped

        cursor, pc, wm, dropped = jax.lax.fori_loop(
            0, n_chunks, body,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)),
        )

        # Final partial block.
        @pl.when((pc > 0) & (cursor + kc <= b_cap))
        def _tail():
            mov_ref[0, :, pl.ds(pl.multiple_of(cursor, kc), kc)] = pend_ref[:, :kc]

        dropped = dropped + jnp.where((pc > 0) & (cursor + kc > b_cap), pc, 0)
        # Deferred tile: nothing was extracted or lost; report the backlog.
        # (When forced, the tile did extract and `dropped` counts real
        # losses from buffer overflow instead.)
        dropped = jnp.where(extract_tile, dropped, total_movers)

        # Mosaic cannot store scalars to VMEM: pack the stats into lanes
        # 0..2 of channel 6 via a full-row write.
        blane = jax.lax.broadcasted_iota(jnp.int32, (b_cap,), 0)
        stats = jnp.where(
            blane == 0,
            wm.astype(jnp.float32),
            jnp.where(
                blane == 1,
                dropped.astype(jnp.float32),
                jnp.where(blane == 2, cursor.astype(jnp.float32), 0.0),
            ),
        )
        mov_ref[0, 6, :] = stats

    pl.run_scoped(scoped, pltpu.VMEM((N_CH, 2 * kc), jnp.float32))


def _tile_rc(t_total, tile_rows, tile_cols, row0, col0, force, tile_ids=None):
    """[2T+1] scalar-prefetch vector: per-tile global row ids, col ids,
    force flag.  Default layout is the contiguous local grid (row0/col0
    offsets); `tile_ids` (global gid per local bucket, any order) overrides
    it — the striped/balanced placement path (parallel/balanced.py)."""
    if tile_ids is not None:
        rows = (tile_ids // tile_cols).astype(jnp.int32)
        cols = (tile_ids % tile_cols).astype(jnp.int32)
    else:
        tl = jnp.arange(t_total, dtype=jnp.int32)
        rows = jnp.asarray(row0, jnp.int32) + tl // tile_cols
        cols = jnp.asarray(col0, jnp.int32) + tl % tile_cols
    return jnp.concatenate(
        [rows, cols, jnp.asarray(force, jnp.int32).reshape(1)]
    )


def _wsplit_default(wsplit):
    # Default: the byte-transport permute ("int8") — bit-exact selection
    # incl. NaN/inf (tests/test_deal_route.py), measured fastest on v5e
    # at 1e8 slots (docs/R4_BATCH.log part A: deal total 467 ms vs 544
    # for the 3-word bf16 stack; split kernel alone 343 vs 418).  The
    # bf16 word stack ("1", the round-3 default: 527 -> 421 ms over
    # f32-HIGHEST at kc=256) and HIGHEST ("0") stay as knobs.
    if wsplit is None:
        v = os.environ.get("MINIPIC_REBIN_WSPLIT", "int8")
        return "int8" if v == "int8" else v == "1"
    return wsplit


def extract_movers(
    p: ParticleState, *, tile_rows: int, tile_cols: int, tile_ny: int,
    tile_nx: int, b_cap: int, kc: int = 256, interpret: bool = False,
    row0=0, col0=0, force=False, vma_axes=(), wsplit=None, tile_ids=None,
):
    """Returns (p with extracted leavers' w zeroed, movers ParticleState
    [T, b_cap] flat-compacted per tile, watermark [T] i32, pending [T] i32).

    All-or-nothing per tile: a tile whose movers exceed the buffer is left
    UNTOUCHED and its mover count reported in `pending` — no particle is
    lost; the caller re-triggers next step to drain the backlog.  With
    force=True (drift budget exhausted) such tiles extract anyway and
    `pending` counts the overflow as real drops.

    kc: compaction chunk width.  The permutation matmul costs O(kc) exact
    MACs per SLOT (not per mover), so small chunks win.

    row0/col0: global tile offsets of this (shard-local) grid — traced
    scalars in sharded runs."""
    t_total, cap = p.num_tiles, p.capacity
    if cap % kc or kc > b_cap:
        for d in (128, 256, 384, 512):
            if cap % d == 0 and d <= b_cap:
                kc = d
                break
        else:
            kc = cap
    if b_cap % 128:
        raise ValueError("b_cap must be a lane multiple (128)")
    if b_cap < kc:
        raise ValueError("b_cap must be >= the extraction chunk kc")

    kern = functools.partial(
        _extract_kernel,
        tile_nx=tile_nx, tile_ny=tile_ny, tile_cols=tile_cols,
        tile_rows=tile_rows, kc=kc, n_chunks=cap // kc, b_cap=b_cap,
        n_tiles=t_total, wsplit=(False if interpret else _wsplit_default(wsplit)),
    )
    pin = pl.BlockSpec((1, 1, cap), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, N_CH, b_cap), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)

    def r3(a):
        return a.reshape(t_total, 1, cap)

    origin = _tile_rc(t_total, tile_rows, tile_cols, row0, col0, force,
                      tile_ids)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_total,),
        in_specs=[pin] * 6,
        out_specs=[pin, mspec],
    )
    vma = frozenset(vma_axes) if vma_axes else None

    def sds(shape, dt_):
        return (jax.ShapeDtypeStruct(shape, dt_, vma=vma) if vma
                else jax.ShapeDtypeStruct(shape, dt_))

    wo, mov = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            sds((t_total, 1, cap), p.w.dtype),
            sds((t_total, N_CH, b_cap), jnp.float32),
        ],
        interpret=interpret,
    )(origin, r3(p.x), r3(p.y), r3(p.px), r3(p.py), r3(p.pz), r3(p.w))

    wm = mov[:, 6, 0].astype(jnp.int32)
    dropped = mov[:, 6, 1].astype(jnp.int32)
    movers = ParticleState(
        x=mov[:, 0], y=mov[:, 1], px=mov[:, 2], py=mov[:, 3], pz=mov[:, 4],
        w=mov[:, 5],
    )
    return p._replace(w=wo.reshape(t_total, cap)), movers, wm, dropped


def _split_kernel(
    rc_ref,  # scalar-prefetch [2T+1]: tile rows, tile cols, force flag
    x_ref, y_ref, px_ref, py_ref, pz_ref, w_ref,  # in: [1, 1, K] (aliased)
    xo_ref, yo_ref, pxo_ref, pyo_ref, pzo_ref, wo_ref,  # out: [1, 1, K]
    mov_ref,  # out: [1, N_CH, B] outgoing buffer (channel-major)
    *,
    tile_nx: int, tile_ny: int, tile_cols: int, tile_rows: int,
    kc: int, n_chunks: int, b_cap: int, cap: int, n_tiles: int,
    wsplit: bool = True, combined: bool = True,
):
    """Stable split of one bucket in a single streaming pass: stayers
    compacted live-first IN PLACE (via aliasing), movers compacted into
    the outgoing buffer.  Supersedes running extract (movers) and defrag
    (hole compaction) as separate passes: the bucket never accumulates
    watermark holes, so the append stage always finds wm == live count
    and the steady state needs no defrag at all.

    All-or-nothing per tile like _extract_kernel: a tile whose movers
    exceed the buffer passes through untouched (pending counted) unless
    forced.  Stats in mov_ref channel 6: lane 0 = stay count (the new
    watermark), lane 1 = pending/dropped.

    combined=True (default): stayers and movers ride ONE permutation per
    chunk — stayers rank left-stable, movers right-REVERSE-stable (mover
    order is physics-irrelevant and deterministic either way), so each
    chunk costs one [2,kc] rank dot on the stacked masks, one p_mat
    build, and one transport dot of the 6-channel payload, vs two of
    each (6ch + 8ch) on the two-compact path (combined=False, env
    MINIPIC_SPLIT_COMBINED=0 for the on-chip A/B)."""
    t = pl.program_id(0)
    my_row = rc_ref[t].astype(jnp.float32)
    my_col = rc_ref[n_tiles + t].astype(jnp.float32)

    mov_ref[...] = jnp.zeros(mov_ref.shape, mov_ref.dtype)
    tri = _upper_tri(kc)
    out_row = jax.lax.broadcasted_iota(jnp.int32, (kc, kc), 0)
    # DEFAULT rank is exact at any kc: 0/1 bf16 operands, f32 accumulate.
    rank_prec = jax.lax.Precision.DEFAULT
    outs = (xo_ref, yo_ref, pxo_ref, pyo_ref, pzo_ref, wo_ref)
    ins = (x_ref, y_ref, px_ref, py_ref, pz_ref, w_ref)

    # Vectorized preflight (see _extract_kernel).
    xf = x_ref[0, 0, :].reshape(1, n_chunks * kc)
    yf = y_ref[0, 0, :].reshape(1, n_chunks * kc)
    wf = w_ref[0, 0, :].reshape(1, n_chunks * kc)
    mov_all = (wf > 0) & (
        (jnp.floor(xf * (1.0 / tile_nx)) != my_col)
        | (jnp.floor(yf * (1.0 / tile_ny)) != my_row)
    )
    total_movers = jnp.sum(mov_all.astype(jnp.int32)).astype(jnp.int32)
    fits_tile = total_movers <= (b_cap // kc) * kc
    forced = rc_ref[2 * n_tiles] != 0
    extract_tile = fits_tile | forced
    # Buckets are live-compacted (split/append invariant), so chunks past
    # the LAST live slot hold only zero-weight padding — skip them (the
    # tail is re-zeroed by zero_body regardless, and last-INDEX, not
    # count, keeps this exact even for a hole-ridden custom seed_state).
    lane_all = jax.lax.broadcasted_iota(jnp.int32, (1, n_chunks * kc), 1)
    last_live = jnp.max(jnp.where(wf > 0, lane_all, -1)).astype(jnp.int32)
    n_proc = jnp.minimum(jnp.int32(n_chunks), (last_live // kc) + 1)

    def scoped(pend_s_ref, pend_m_ref):
        pend_s_ref[...] = jnp.zeros(pend_s_ref.shape, pend_s_ref.dtype)
        pend_m_ref[...] = jnp.zeros(pend_m_ref.shape, pend_m_ref.dtype)

        def compact(mask, payload, pend_ref, n_rows):
            """Rank+permute one chunk's masked slots.  Returns (count,
            [n_rows, 2kc] zero-padded block).

            Measured on v5e at 1e8 slots: the MXU permutation matmul wins
            — swapping in _scan_compact (bit-serial lane rolls, pure VPU)
            regressed the bench 6.44 -> 4.67e8 pushes/s; the 7-level
            masked-roll chain per chunk serializes worse than the dots."""
            mf = mask.astype(jnp.float32)
            rank = jax.lax.dot_general(
                mf, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=rank_prec,
            )
            cnt = rank[0, kc - 1].astype(jnp.int32)
            p_mat = ((rank - 1.0) == out_row.astype(jnp.float32)) & mask
            comp = _permute_dot(payload, p_mat, wsplit)
            cpad = jnp.concatenate(
                [comp, jnp.zeros((n_rows, kc), jnp.float32)], axis=1
            )
            return cnt, cpad

        lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, kc), 1)

        def partition(staying, moving, payload6):
            """One-permutation stable partition: stayers -> columns
            [0, s_cnt) in order, movers -> [kc-m_cnt, kc) in REVERSE
            order (inclusive mover rank r lands at kc-r).  Both class
            ranks come from one [2,kc] dot on the stacked masks; dead
            lanes never enter p_mat, so transport stays pure selection
            (exact for the int8 byte mode, NaN/inf included)."""
            mf2 = jnp.concatenate(
                [staying.astype(jnp.float32), moving.astype(jnp.float32)],
                axis=0)
            rank2 = jax.lax.dot_general(
                mf2, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=rank_prec,
            )  # [2, kc] inclusive class cumsums
            s_cnt = rank2[0, kc - 1].astype(jnp.int32)
            m_cnt = rank2[1, kc - 1].astype(jnp.int32)
            dest = jnp.where(staying, rank2[0:1] - 1.0,
                             jnp.float32(kc) - rank2[1:2])
            p_mat = (dest == out_row.astype(jnp.float32)) & (staying | moving)
            comp = _permute_dot(payload6, p_mat, wsplit)  # [6, kc]
            s_comp = jnp.where(lane_row < s_cnt, comp, 0.0)
            m_comp = pltpu.roll(comp, m_cnt, 1)  # tail wraps to the front
            m_comp = jnp.where(lane_row < m_cnt, m_comp, 0.0)
            s_cpad = jnp.concatenate(
                [s_comp, jnp.zeros((6, kc), jnp.float32)], axis=1)
            m_cpad = jnp.concatenate(
                [jnp.concatenate(
                    [m_comp, jnp.zeros((N_CH - 6, kc), jnp.float32)], axis=0),
                 jnp.zeros((N_CH, kc), jnp.float32)], axis=1)
            return s_cnt, s_cpad, m_cnt, m_cpad

        def body(c, carry):
            s_cur, s_pc, m_cur, m_pc, dropped = carry
            sl = pl.ds(c * kc, kc)
            rows6 = [r[0, 0, sl].reshape(1, kc) for r in ins]
            xc, yc, wc = rows6[0], rows6[1], rows6[5]
            alive = wc > 0
            moving = alive & (
                (jnp.floor(xc * (1.0 / tile_nx)) != my_col)
                | (jnp.floor(yc * (1.0 / tile_ny)) != my_row)
            ) & extract_tile
            staying = alive & ~moving
            payload6 = jnp.concatenate(rows6, axis=0)  # [6, kc]

            if combined:
                s_cnt, s_cpad, m_cnt, m_cpad = partition(
                    staying, moving, payload6)
            else:
                # stayers -> in-place compaction (cursor <= read point)
                s_cnt, s_cpad = compact(staying, payload6, pend_s_ref, 6)
                payload8 = jnp.concatenate(
                    [payload6 * jnp.where(moving, 1.0, 0.0),
                     jnp.zeros((2, kc), jnp.float32)], axis=0
                )
                m_cnt, m_cpad = compact(moving, payload8, pend_m_ref, N_CH)

            pend_s_ref[...] += pltpu.roll(s_cpad, s_pc, 1)
            s_pc = s_pc + s_cnt

            @pl.when(s_pc >= kc)
            def _flush_s():
                slw = pl.ds(pl.multiple_of(s_cur, kc), kc)
                for i, o in enumerate(outs):
                    o[0, 0, slw] = pend_s_ref[i, :kc]
                shifted = pltpu.roll(pend_s_ref[...], kc, 1)
                ztail = jax.lax.broadcasted_iota(jnp.int32, (6, 2 * kc), 1) < kc
                pend_s_ref[...] = jnp.where(ztail, shifted, 0.0)

            s_flush = s_pc >= kc
            s_cur = s_cur + jnp.where(s_flush, kc, 0)
            s_pc = jnp.where(s_flush, s_pc - kc, s_pc)

            # movers -> outgoing buffer (N_CH channels; 6,7 spare/stats)
            pend_m_ref[...] += pltpu.roll(m_cpad, m_pc, 1)
            m_pc = m_pc + m_cnt

            @pl.when(m_pc >= kc)
            def _flush_m():
                fits = m_cur + kc <= b_cap

                @pl.when(fits)
                def _w():
                    mov_ref[0, :, pl.ds(pl.multiple_of(m_cur, kc), kc)] = (
                        pend_m_ref[:, :kc]
                    )

                shifted = pltpu.roll(pend_m_ref[...], kc, 1)
                ztail = jax.lax.broadcasted_iota(jnp.int32, (N_CH, 2 * kc), 1) < kc
                pend_m_ref[...] = jnp.where(ztail, shifted, 0.0)

            m_flush = m_pc >= kc
            over = m_flush & (m_cur + kc > b_cap)
            dropped = dropped + jnp.where(over, kc, 0)
            m_cur = m_cur + jnp.where(m_flush & ~over, kc, 0)
            m_pc = jnp.where(m_flush, m_pc - kc, m_pc)
            return s_cur, s_pc, m_cur, m_pc, dropped

        z = jnp.int32(0)
        s_cur, s_pc, m_cur, m_pc, dropped = jax.lax.fori_loop(
            0, n_proc, body, (z, z, z, z, z)
        )

        @pl.when(s_pc > 0)
        def _tail_s():
            slw = pl.ds(pl.multiple_of(s_cur, kc), kc)
            for i, o in enumerate(outs):
                o[0, 0, slw] = pend_s_ref[i, :kc]

        @pl.when((m_pc > 0) & (m_cur + kc <= b_cap))
        def _tail_m():
            mov_ref[0, :, pl.ds(pl.multiple_of(m_cur, kc), kc)] = pend_m_ref[:, :kc]

        dropped = dropped + jnp.where((m_pc > 0) & (m_cur + kc > b_cap), m_pc, 0)
        dropped = jnp.where(extract_tile, dropped, total_movers)

        live = s_cur + s_pc
        done_blocks = (s_cur // kc) + jnp.where(s_pc > 0, 1, 0)

        def zero_body(b, _):
            @pl.when(b >= done_blocks)
            def _z():
                slw = pl.ds(pl.multiple_of(b * kc, kc), kc)
                for o in outs:
                    o[0, 0, slw] = jnp.zeros((kc,), jnp.float32)
            return 0

        jax.lax.fori_loop(0, n_chunks, zero_body, 0)

        blane = jax.lax.broadcasted_iota(jnp.int32, (b_cap,), 0)
        stats = jnp.where(
            blane == 0, live.astype(jnp.float32),
            jnp.where(blane == 1, dropped.astype(jnp.float32), 0.0),
        )
        mov_ref[0, 6, :] = stats

    pl.run_scoped(
        scoped,
        pltpu.VMEM((6, 2 * kc), jnp.float32),
        pltpu.VMEM((N_CH, 2 * kc), jnp.float32),
    )


def split_kc_env(default: int = 512) -> int:
    """Resolve MINIPIC_SPLIT_KC, rounded UP to a multiple of 512 — the
    single alignment rule shared by Simulation.__init__/ensure_capacity
    (bucket-capacity quantum) and split_buckets (chunk size).  The re-bin
    kernels slice in 128-lane blocks and the int8 K-fold needs kc/4
    lane-aligned, so a raw env value like 600 or 1000 would produce a
    capacity the kernels reject at runtime with an obscure Mosaic error
    (round-4 advisor finding); rounding here keeps any setting valid."""
    v = int(os.environ.get("MINIPIC_SPLIT_KC", str(default)))
    if v <= 0:
        raise ValueError(f"MINIPIC_SPLIT_KC must be positive, got {v}")
    return -(-v // 512) * 512


def split_buckets(
    p: ParticleState, *, tile_rows: int, tile_cols: int, tile_ny: int,
    tile_nx: int, b_cap: int, kc: int = 0, interpret: bool = False,
    row0=0, col0=0, force=False, vma_axes=(), wsplit=None, tile_ids=None,
):
    """One-pass stable split: returns (p with stayers compacted live-first
    and zero tail, movers [T, b_cap] compacted per tile, stay counts [T]
    i32 — the exact post-split watermark — and pending [T] i32).

    Replaces extract_movers + defrag_buckets as the re-bin workhorse: the
    bucket never develops watermark holes, so the append stage always
    fits unless census truly exceeds capacity.

    kc=0 (default) resolves from MINIPIC_SPLIT_KC (default 512).  Swept
    on chip TWICE: round 2 (3-word bf16 permute, two compacts/chunk)
    measured 128/256/896 -> 622/421/545 ms, picking 256; round 4's
    combined partition + int8 byte transport moved the optimum up —
    128/256/512 -> 378/222/168 ms (docs/R4_BATCH.log batch H; the
    headline crossed 1e9 at 512).  The serial per-chunk carry chain
    dominates, so the largest chunk the buffers admit wins."""
    t_total, cap = p.num_tiles, p.capacity
    if kc == 0:
        kc = split_kc_env()
    if cap % kc or kc > b_cap:
        for d in (512, 384, 256, 128):  # largest valid chunk wins
            if cap % d == 0 and d <= b_cap:
                kc = d
                break
        else:
            kc = cap
    if b_cap % 128:
        raise ValueError("b_cap must be a lane multiple (128)")
    if b_cap < kc:
        raise ValueError("b_cap must be >= the split chunk kc")

    kern = functools.partial(
        _split_kernel,
        tile_nx=tile_nx, tile_ny=tile_ny, tile_cols=tile_cols,
        tile_rows=tile_rows, kc=kc, n_chunks=cap // kc, b_cap=b_cap, cap=cap,
        n_tiles=t_total, wsplit=(False if interpret else _wsplit_default(wsplit)),
        combined=os.environ.get("MINIPIC_SPLIT_COMBINED", "1") != "0",
    )
    pin = pl.BlockSpec((1, 1, cap), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, N_CH, b_cap), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)

    def r3(a):
        return a.reshape(t_total, 1, cap)

    origin = _tile_rc(t_total, tile_rows, tile_cols, row0, col0, force,
                      tile_ids)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_total,),
        in_specs=[pin] * 6,
        out_specs=[pin] * 6 + [mspec],
    )
    vma = frozenset(vma_axes) if vma_axes else None

    def sds(shape, dt_):
        return (jax.ShapeDtypeStruct(shape, dt_, vma=vma) if vma
                else jax.ShapeDtypeStruct(shape, dt_))

    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[sds((t_total, 1, cap), p.x.dtype)] * 6
        + [sds((t_total, N_CH, b_cap), jnp.float32)],
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5},
        interpret=interpret,
    )(origin, r3(p.x), r3(p.y), r3(p.px), r3(p.py), r3(p.pz), r3(p.w))
    p2 = ParticleState(*(a.reshape(t_total, cap) for a in outs[:6]))
    mov = outs[6]
    counts = mov[:, 6, 0].astype(jnp.int32)
    pending = mov[:, 6, 1].astype(jnp.int32)
    movers = ParticleState(
        x=mov[:, 0], y=mov[:, 1], px=mov[:, 2], py=mov[:, 3], pz=mov[:, 4],
        w=mov[:, 5],
    )
    return p2, movers, counts, pending


# Deal-route direction order: d8 index = (dr+1)*3 + (dc+1), self (1,1)
# removed.  DIR_OFFSETS[d8] = (dr, dc) of the DESTINATION relative to the
# source tile.
DIR_OFFSETS = tuple(
    (dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1) if (dr, dc) != (0, 0)
)


def _rows8_sum(a):
    """[8, kc] -> [1, kc] pairwise-tree row sum (aligned halvings)."""
    a = a[:4] + a[4:]
    a = a[:2] + a[2:]
    return a[:1] + a[1:2]


def _segment_kernel(
    rc_ref,  # scalar-prefetch [2T+1]: tile rows, tile cols (+unused flag)
    x_ref, y_ref, px_ref, py_ref, pz_ref, w_ref,  # movers in: [1, 1, MC]
    seg_ref,  # out [1, N_CH, 8*b_seg]: per-direction compacted runs
    *,
    tile_nx: int, tile_ny: int, tile_cols: int, tile_rows: int,
    kc: int, n_chunks: int, b_seg: int, n_tiles: int, wsplit: bool = True,
    fc: int = 0,
):
    """Bin one tile's (already compacted) movers by destination direction:
    segment d of the output holds, live-compacted, the movers whose
    destination tile is this tile's d8-neighbor.  The route then needs no
    sort at all — arrivals at tile t are the 8 neighbors' matching
    segments, fetched by static grid rolls (binning._roll_segments).

    ONE combined permutation per chunk: the 8 per-direction ranks come
    from a single [8, kc] triangular dot, the within-chunk segment bases
    from their tiny cumsum, and one permute dot scatters the chunk into
    direction-ordered runs; per-direction placement is then a roll +
    masked accumulate into that direction's pending lane window.

    A mover more than one tile from home (corrupted/unwrapped position)
    cannot be addressed by a neighbor segment; it is zero-weighted and
    counted (same policy as parallel/exchange.py's >1-hop kill).  Segment
    overflow also drops and counts — unlike the split kernel there is no
    deferral here, the movers are already out of their buckets (size via
    Deck.mover_seg_cap).  Stats in channel 6: lane d = dropped count of
    direction d, lane 8 = killed >1-hop movers.

    fc (flush chunk) decouples the segment-buffer write granularity from
    the processing chunk: pending runs flush to seg_ref in fc-slot blocks
    (up to kc/fc per chunk, statically unrolled), so kc only needs to
    divide the mover capacity while b_seg only needs fc-divisibility —
    this is what admits kc=512 chunks against the b_seg=768 buffer the
    sizing formula produces (round-4 ledger: segment was capped at
    kc=256 by b_seg % kc, costing 66 ms of the 469 ms deal re-bin)."""
    if fc <= 0:
        fc = kc
    t = pl.program_id(0)
    my_row = rc_ref[t].astype(jnp.float32)
    my_col = rc_ref[n_tiles + t].astype(jnp.float32)

    seg_ref[...] = jnp.zeros(seg_ref.shape, seg_ref.dtype)
    tri = _upper_tri(kc)
    out_row = jax.lax.broadcasted_iota(jnp.int32, (kc, kc), 0)
    col2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * kc), 1)
    ins = (x_ref, y_ref, px_ref, py_ref, pz_ref, w_ref)

    def scoped(pend_ref):  # [64, 2kc]: direction d rows [8d, 8d+6)
        pend_ref[...] = jnp.zeros(pend_ref.shape, pend_ref.dtype)

        def body(c, carry):
            pc, cur, dropped, killed = carry
            sl = pl.ds(c * kc, kc)
            rows6 = [r[0, 0, sl].reshape(1, kc) for r in ins]
            xc, yc, wc = rows6[0], rows6[1], rows6[5]
            alive = wc > 0
            dc = jnp.floor(xc * (1.0 / tile_nx)) - my_col
            dr = jnp.floor(yc * (1.0 / tile_ny)) - my_row
            # Periodic wrap: a destination on the far grid edge is the
            # adjacent neighbor.  (Non-periodic decks never produce the
            # far-edge deltas, so the fold is inert there.)
            dc = jnp.where(dc > 1.5, dc - tile_cols,
                           jnp.where(dc < -1.5, dc + tile_cols, dc))
            dr = jnp.where(dr > 1.5, dr - tile_rows,
                           jnp.where(dr < -1.5, dr + tile_rows, dr))
            hop1 = (jnp.abs(dc) <= 1.5) & (jnp.abs(dr) <= 1.5)
            d9 = (dr.astype(jnp.int32) + 1) * 3 + (dc.astype(jnp.int32) + 1)
            mov = alive & hop1 & (d9 != 4)
            killed = killed + jnp.sum(
                (alive & ~hop1).astype(jnp.int32)
            ).astype(jnp.int32)
            d8 = d9 - (d9 > 4).astype(jnp.int32)  # 0..7

            mrows = jax.lax.broadcasted_iota(jnp.int32, (8, kc), 0)
            mf = ((mrows == d8) & mov).astype(jnp.float32)  # [8, kc]
            ranks = jax.lax.dot_general(
                mf, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )  # [8, kc], 1-based within direction
            # Per-direction counts and exclusive prefix as SCALARS (Mosaic
            # has no cumsum lowering, and tiny [8,1]/[1,1] vector concats
            # hit layout-offset bugs; scalar extract + broadcast lowers
            # clean).  off8v broadcasts the prefix back over the rows for
            # the base computation.
            cnt_s = [ranks[d, kc - 1] for d in range(8)]
            off_s = []
            acc0 = jnp.float32(0.0)
            for d in range(8):
                off_s.append(acc0)
                acc0 = acc0 + cnt_s[d]
            off8v = jnp.zeros((8, kc), jnp.float32)
            for d in range(8):
                off8v = jnp.where(mrows == d, off_s[d], off8v)
            base = _rows8_sum(mf * off8v)  # [1, kc]: own-direction base
            rankd = _rows8_sum(mf * ranks)
            rank_all = base + rankd  # 1-based, direction-ordered
            p_mat = (
                (rank_all - 1.0) == out_row.astype(jnp.float32)
            ) & mov
            payload8 = jnp.concatenate(
                [jnp.concatenate(rows6, axis=0) * jnp.where(mov, 1.0, 0.0),
                 jnp.zeros((2, kc), jnp.float32)], axis=0
            )
            comp = _permute_dot(payload8, p_mat, wsplit)  # [8, kc]
            cpad = jnp.concatenate(
                [comp, jnp.zeros((8, kc), jnp.float32)], axis=1
            )  # [8, 2kc]

            new_pc, new_cur, new_drop = [], [], []
            for d in range(8):
                start = off_s[d].astype(jnp.int32)
                cnt = cnt_s[d].astype(jnp.int32)
                pcd, curd, dropd = pc[d], cur[d], dropped[d]
                # Run d sits at columns [start, start+cnt) of comp; move it
                # to [pcd, pcd+cnt) (never wraps: both < kc, width <= kc).
                shift = jnp.where(
                    pcd >= start, pcd - start, pcd - start + 2 * kc
                )
                rolled = pltpu.roll(cpad, shift, 1)
                selm = (col2 >= pcd) & (col2 < pcd + cnt)
                pend_ref[8 * d : 8 * (d + 1), :] += jnp.where(
                    selm, rolled, 0.0
                )
                pcd = pcd + cnt

                # Flush full fc-blocks (statically unrolled: pcd < fc on
                # entry and grows by cnt <= kc, so at most kc/fc flushes).
                for _f in range(kc // fc):
                    @pl.when(pcd >= fc)
                    def _flush(d=d, curd=curd):
                        @pl.when(curd + fc <= b_seg)
                        def _w():
                            slw = pl.ds(
                                d * b_seg + pl.multiple_of(curd, fc), fc
                            )
                            seg_ref[0, 0:6, slw] = pend_ref[
                                8 * d : 8 * d + 6, :fc
                            ]

                        shifted = pltpu.roll(
                            pend_ref[8 * d : 8 * (d + 1), :], 2 * kc - fc, 1
                        )
                        ztail = (
                            jax.lax.broadcasted_iota(
                                jnp.int32, (8, 2 * kc), 1)
                            < 2 * kc - fc
                        )
                        pend_ref[8 * d : 8 * (d + 1), :] = jnp.where(
                            ztail, shifted, 0.0
                        )

                    flush = pcd >= fc
                    over = flush & (curd + fc > b_seg)
                    dropd = dropd + jnp.where(over, fc, 0)
                    curd = curd + jnp.where(flush & ~over, fc, 0)
                    pcd = jnp.where(flush, pcd - fc, pcd)
                new_pc.append(pcd)
                new_cur.append(curd)
                new_drop.append(dropd)
            return tuple(new_pc), tuple(new_cur), tuple(new_drop), killed

        z = jnp.int32(0)
        pc, cur, dropped, killed = jax.lax.fori_loop(
            0, n_chunks, body, ((z,) * 8, (z,) * 8, (z,) * 8, z)
        )

        drop_tot = []
        for d in range(8):
            @pl.when((pc[d] > 0) & (cur[d] + kc <= b_seg))
            def _tail(d=d):
                slw = pl.ds(d * b_seg + pl.multiple_of(cur[d], kc), kc)
                seg_ref[0, 0:6, slw] = pend_ref[8 * d : 8 * d + 6, :kc]

            drop_tot.append(
                dropped[d]
                + jnp.where((pc[d] > 0) & (cur[d] + kc > b_seg), pc[d], 0)
            )

        lane = jax.lax.broadcasted_iota(jnp.int32, (8 * b_seg,), 0)
        stats = jnp.where(lane == 8, killed.astype(jnp.float32), 0.0)
        for d in range(8):
            stats = jnp.where(
                lane == d, drop_tot[d].astype(jnp.float32), stats
            )
        seg_ref[0, 6, :] = stats

    pl.run_scoped(scoped, pltpu.VMEM((64, 2 * kc), jnp.float32))


def segment_movers(
    movers: ParticleState, *, tile_rows: int, tile_cols: int, tile_ny: int,
    tile_nx: int, b_seg: int, kc: int = 0, interpret: bool = False,
    vma_axes=(), wsplit=None, row0=0, col0=0, grid_rows=None,
    grid_cols=None, packed: bool = False,
):
    """Deal-route stage 1: bin each tile's compacted movers by destination
    direction.  Returns (segments ParticleState [T, 8*b_seg] — direction d
    compacted at columns [d*b_seg, (d+1)*b_seg) — and dropped [T] i32:
    per-direction segment overflow plus >1-hop kills).

    kc=0 resolves from MINIPIC_SEG_KC (default 512, same serial-carry-
    chain economics as the split kernel's chunk sweep — the flush chunk
    fc = gcd(kc, b_seg) decouples the chunk from b_seg divisibility, so
    512 applies against the sizing formula's b_seg=768 where round 4 was
    capped at 256).

    Sharded use: tile_rows/tile_cols describe the LOCAL contiguous block
    layout, row0/col0 its global tile offset (traced scalars are fine —
    they ride the scalar-prefetch origin vector), and grid_rows/grid_cols
    the GLOBAL tile counts for the periodic far-edge fold (default: the
    local counts, i.e. the single-device case)."""
    import math as _math

    t_total, mc = movers.num_tiles, movers.capacity
    if kc == 0:
        kc = int(os.environ.get("MINIPIC_SEG_KC", "512"))
    fc = _math.gcd(kc, b_seg)
    if mc % kc or fc % 128:
        for d in (512, 384, 256, 128):  # largest valid chunk wins
            if mc % d == 0 and d <= mc and _math.gcd(d, b_seg) % 128 == 0:
                kc = d
                fc = _math.gcd(d, b_seg)
                break
        else:
            raise ValueError(
                f"mover cap {mc} / b_seg {b_seg} admit no 128-aligned chunk")

    kern = functools.partial(
        _segment_kernel,
        tile_nx=tile_nx, tile_ny=tile_ny,
        tile_cols=(grid_cols if grid_cols is not None else tile_cols),
        tile_rows=(grid_rows if grid_rows is not None else tile_rows),
        kc=kc, n_chunks=mc // kc, b_seg=b_seg, fc=fc,
        n_tiles=t_total, wsplit=(False if interpret else _wsplit_default(wsplit)),
    )
    pin = pl.BlockSpec((1, 1, mc), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, N_CH, 8 * b_seg), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def r3(a):
        return a.reshape(t_total, 1, mc)

    origin = _tile_rc(t_total, tile_rows, tile_cols, row0, col0, False, None)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_total,),
        in_specs=[pin] * 6,
        out_specs=sspec,
    )
    vma = frozenset(vma_axes) if vma_axes else None
    sds = (jax.ShapeDtypeStruct((t_total, N_CH, 8 * b_seg), jnp.float32,
                                vma=vma)
           if vma else
           jax.ShapeDtypeStruct((t_total, N_CH, 8 * b_seg), jnp.float32))
    seg = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=sds,
        interpret=interpret,
    )(origin, r3(movers.x), r3(movers.y), r3(movers.px), r3(movers.py),
      r3(movers.pz), r3(movers.w))
    dropped = jnp.sum(seg[:, 6, :9], axis=1).astype(jnp.int32)
    if packed:
        # Raw [T, 8ch, 8*b_seg] for append_segments — no per-channel
        # unpack copies (the fused path reads the channel sublanes
        # directly; unpack_segments recovers the ParticleState view for
        # the defrag fallback).
        return seg, dropped
    return unpack_segments(seg), dropped


def unpack_segments(seg) -> ParticleState:
    """ParticleState view of segment_movers' packed [T, 8ch, W] output."""
    return ParticleState(
        x=seg[:, 0], y=seg[:, 1], px=seg[:, 2], py=seg[:, 3], pz=seg[:, 4],
        w=seg[:, 5],
    )


def _defrag_kernel(
    x_ref, y_ref, px_ref, py_ref, pz_ref, w_ref,  # in: [1, 1, K] (aliased)
    *refs,  # [6 incoming [1,1,B] if merge] + 6 outs [1,1,K] + cnt [1,1,128]
    kc: int, n_chunks: int, in_chunks: int, cap: int, wsplit: bool = True,
):
    """In-bucket compaction: squeeze w==0 holes out of one tile's bucket,
    live slots first, zero tail — optionally streaming the tile's routed
    *incoming* buffer through the same pipeline (merge-append), so the
    result fits whenever census <= capacity with no alignment slack.  No
    cross-tile movement — this replaces the global defragmenting sort
    (whose ~6 GB of transients at 1e8 slots were the step's peak-memory
    driver) with a VMEM-local streaming pass.  In-place via aliasing:
    compacted blocks land at cursor <= read point, so the write never
    overtakes the unread input.  Census overflow beyond capacity is
    dropped and counted (cnt lane 1)."""
    ins = (x_ref, y_ref, px_ref, py_ref, pz_ref, w_ref)
    inc = refs[:6] if in_chunks else ()
    outs = refs[6 : 12] if in_chunks else refs[:6]
    cnt_ref = refs[12] if in_chunks else refs[6]
    tri = _upper_tri(kc)
    out_row = jax.lax.broadcasted_iota(jnp.int32, (kc, kc), 0)
    # DEFAULT rank is exact at any kc: 0/1 bf16 operands, f32 accumulate.
    rank_prec = jax.lax.Precision.DEFAULT

    def scoped(pend_ref):
        pend_ref[...] = jnp.zeros(pend_ref.shape, pend_ref.dtype)

        def step_chunk(carry, payload, wc):
            cursor, pc, dropped = carry
            af = (wc > 0).astype(jnp.float32)
            rank = jax.lax.dot_general(
                af, tri, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=rank_prec,
            )
            cnt = rank[0, kc - 1].astype(jnp.int32)
            p_mat = ((rank - 1.0) == out_row.astype(jnp.float32)) & (wc > 0)
            compact = _permute_dot(payload, p_mat, wsplit)
            cpad = jnp.concatenate(
                [compact, jnp.zeros((6, kc), jnp.float32)], axis=1
            )
            pend_ref[...] += pltpu.roll(cpad, pc, 1)
            pc = pc + cnt

            @pl.when(pc >= kc)
            def _flush():
                fits = cursor + kc <= cap

                @pl.when(fits)
                def _w():
                    slw = pl.ds(pl.multiple_of(cursor, kc), kc)
                    for i, o in enumerate(outs):
                        o[0, 0, slw] = pend_ref[i, :kc]

                shifted = pltpu.roll(pend_ref[...], kc, 1)
                zero_tail = jax.lax.broadcasted_iota(jnp.int32, (6, 2 * kc), 1) < kc
                pend_ref[...] = jnp.where(zero_tail, shifted, 0.0)

            flushed = pc >= kc
            over = flushed & (cursor + kc > cap)
            dropped = dropped + jnp.where(over, kc, 0)
            cursor = cursor + jnp.where(flushed & ~over, kc, 0)
            pc = jnp.where(flushed, pc - kc, pc)
            return cursor, pc, dropped

        def bucket_body(c, carry):
            sl = pl.ds(c * kc, kc)
            payload = jnp.concatenate(
                [r[0, 0, sl].reshape(1, kc) for r in ins], axis=0
            )
            return step_chunk(carry, payload, payload[5:6])

        carry = jax.lax.fori_loop(
            0, n_chunks, bucket_body, (jnp.int32(0), jnp.int32(0), jnp.int32(0))
        )

        if in_chunks:
            def inc_body(c, carry):
                sl = pl.ds(c * kc, kc)
                payload = jnp.concatenate(
                    [r[0, 0, sl].reshape(1, kc) for r in inc], axis=0
                )
                return step_chunk(carry, payload, payload[5:6])

            carry = jax.lax.fori_loop(0, in_chunks, inc_body, carry)

        cursor, pc, dropped = carry

        # Tail partial block (cursor + kc <= cap when anything remains:
        # the over branch froze the cursor otherwise).
        @pl.when((pc > 0) & (cursor + kc <= cap))
        def _tail():
            slw = pl.ds(pl.multiple_of(cursor, kc), kc)
            for i, o in enumerate(outs):
                o[0, 0, slw] = pend_ref[i, :kc]

        dropped = dropped + jnp.where((pc > 0) & (cursor + kc > cap), pc, 0)
        live = jnp.minimum(cursor + pc, cap)
        done_blocks = (cursor // kc) + jnp.where(pc > 0, 1, 0)

        # Zero every block past the compacted prefix (aliasing does not
        # pre-fill outputs; every element must be written).
        def zero_body(b, _):
            @pl.when(b >= done_blocks)
            def _z():
                slw = pl.ds(pl.multiple_of(b * kc, kc), kc)
                for o in outs:
                    o[0, 0, slw] = jnp.zeros((kc,), jnp.float32)
            return 0

        jax.lax.fori_loop(0, n_chunks, zero_body, 0)

        blane = jax.lax.broadcasted_iota(jnp.int32, (128,), 0)
        cnt_ref[0, 0, :] = jnp.where(
            blane == 0, live.astype(jnp.float32),
            jnp.where(blane == 1, dropped.astype(jnp.float32), 0.0),
        )

    pl.run_scoped(scoped, pltpu.VMEM((6, 2 * kc), jnp.float32))


def defrag_buckets(
    p: ParticleState, incoming: ParticleState | None = None, *,
    kc: int = 128, interpret: bool = False, vma_axes=(), wsplit=None,
):
    """Compact every tile bucket in place (live-first, zero tail),
    optionally merge-appending each tile's routed incoming buffer in the
    same pass.

    Returns (p2, live counts [T] i32, dropped [T] i32) — dropped is
    census overflow beyond bucket capacity (the only loss mode, same as
    the sort's).  The TPU-native replacement for the reference's full
    re-sort defrag: O(slots) streaming VMEM work, no gather/scatter/sort,
    faster than the 7-operand global sort and — decisively — no multi-GB
    sort transients in the step's memory arena."""
    t_total, cap = p.num_tiles, p.capacity
    if cap % kc:
        for d in (128, 256, 384, 512):
            if cap % d == 0:
                kc = d
                break
        else:
            kc = cap
    b_in = 0 if incoming is None else incoming.capacity
    if b_in % kc:
        raise ValueError(f"incoming capacity {b_in} not a multiple of kc {kc}")

    pin = pl.BlockSpec((1, 1, cap), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    iin = pl.BlockSpec((1, 1, b_in), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def r3(a, n=cap):
        return a.reshape(t_total, 1, n)

    vma = frozenset(vma_axes) if vma_axes else None

    def sds(shape, dt_):
        return (jax.ShapeDtypeStruct(shape, dt_, vma=vma) if vma
                else jax.ShapeDtypeStruct(shape, dt_))

    args = [r3(p.x), r3(p.y), r3(p.px), r3(p.py), r3(p.pz), r3(p.w)]
    in_specs = [pin] * 6
    if incoming is not None:
        args += [r3(a, b_in) for a in
                 (incoming.x, incoming.y, incoming.px, incoming.py,
                  incoming.pz, incoming.w)]
        in_specs += [iin] * 6

    outs = pl.pallas_call(
        functools.partial(
            _defrag_kernel, kc=kc, n_chunks=cap // kc,
            in_chunks=b_in // kc, cap=cap, wsplit=(False if interpret else _wsplit_default(wsplit)),
        ),
        grid=(t_total,),
        in_specs=in_specs,
        out_specs=[pin] * 6 + [cspec],
        out_shape=[sds((t_total, 1, cap), p.x.dtype)] * 6
        + [sds((t_total, 1, 128), jnp.float32)],
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5},
        interpret=interpret,
    )(*args)
    p2 = ParticleState(*(a.reshape(t_total, cap) for a in outs[:6]))
    counts = outs[6][:, 0, 0].astype(jnp.int32)
    dropped = outs[6][:, 0, 1].astype(jnp.int32)
    return p2, counts, dropped


def _append_kernel(
    wm_ref,  # scalar-prefetch [T]
    x_ref, y_ref, px_ref, py_ref, pz_ref, w_ref,  # in/out aliased [1,1,K]
    ix_ref, iy_ref, ipx_ref, ipy_ref, ipz_ref, iw_ref,  # incoming [1,1,Bin]
    xo_ref, yo_ref, pxo_ref, pyo_ref, pzo_ref, wo_ref,  # aliased outs
    do_ref,  # [1, 1, 128] dropped-count output (lane 0)
    *,
    b_in: int, cap: int,
):
    t = pl.program_id(0)
    wm = wm_ref[t]
    # Incoming buckets are live-compacted (filler-key sort), so the live
    # prefix length is the only part that must land below `cap`.
    n_in = jnp.sum((iw_ref[0, 0, :] > 0).astype(jnp.int32))
    # 128 of safety absorbs the align-down of the slab anchor.
    fits = wm + n_in <= cap - 128

    do_ref[...] = jnp.zeros(do_ref.shape, do_ref.dtype)

    # Aliasing shares the HBM buffers but does NOT pre-fill the output
    # block: every output element must be written or it comes back as
    # uninitialized VMEM.  Copy the full row first, then overlay the slab.
    xo_ref[...] = x_ref[...]
    yo_ref[...] = y_ref[...]
    pxo_ref[...] = px_ref[...]
    pyo_ref[...] = py_ref[...]
    pzo_ref[...] = pz_ref[...]
    wo_ref[...] = w_ref[...]

    # Slab geometry: dynamic lane stores must be 128-aligned, so anchor the
    # (b_in + 256)-wide slab at o = align128(min(wm, cap - b_slab)) and
    # rotate the incoming data right by (wm - o); the live run [wm, wm+n_in)
    # then never wraps the rotation domain nor the slab (see `fits`).
    b_slab = b_in + 256
    o = (jnp.minimum(wm, cap - b_slab) // 128) * 128
    shift = wm - o
    idx = o + jax.lax.broadcasted_iota(jnp.int32, (1, b_slab), 1)
    sel = (idx >= wm) & (idx < wm + n_in)

    @pl.when(fits)
    def _write():
        sl = pl.ds(pl.multiple_of(o, 128), b_slab)

        def merge(inc_ref, cur_ref, out_ref):
            inc = inc_ref[0, 0, :].reshape(1, b_in)
            padded = jnp.concatenate(
                [inc, jnp.zeros((1, 256), jnp.float32)], axis=1
            )
            rolled = pltpu.roll(padded, shift, 1)
            cur = cur_ref[0, 0, sl].reshape(1, b_slab)
            out_ref[0, 0, sl] = jnp.where(sel, rolled, cur).reshape(b_slab)

        merge(ix_ref, x_ref, xo_ref)
        merge(iy_ref, y_ref, yo_ref)
        merge(ipx_ref, px_ref, pxo_ref)
        merge(ipy_ref, py_ref, pyo_ref)
        merge(ipz_ref, pz_ref, pzo_ref)
        merge(iw_ref, w_ref, wo_ref)

    @pl.when(jnp.logical_not(fits))
    def _drop():
        do_ref[0, 0, :] = jnp.full((do_ref.shape[-1],), n_in.astype(jnp.float32))


def _append_segments_kernel(
    wm_ref, nbr_ref,  # scalar-prefetch [T], [8, T] (transposed, see seg_spec)
    x_ref, y_ref, px_ref, py_ref, pz_ref, w_ref,  # buckets, HBM (aliased)
    *rest,
    b_seg: int, cap: int,
):
    """Deal-route stages 2+3 FUSED: the static grid rolls and the
    watermark append in one kernel, streaming only the watermark slab of
    each bucket (b_slab = 8*b_seg + 256 slots) instead of the whole
    bucket, and reading each arrival run straight from its neighbor's
    segment block via the prefetch-indexed BlockSpecs — the rolled
    `incoming` array is never materialized in HBM.

    Per-tile HBM traffic vs the unfused pair (_roll_segments +
    _append_runs_kernel) at the bench geometry (cap 27136, b_seg 768):
    2*6*cap + 3*6*8*b_seg = 1.44 MB  ->  2*6*b_slab + 8*8*b_seg*4
    = 0.50 MB.

    Seg blocks arrive as [8ch, b_seg] slices of segment_movers' PACKED
    output (rows 0..5 = x..w, row 6 = stats, 7 spare) — the per-channel
    unpack copies are gone too.  Bucket channels are ANY-space aliased
    refs in the [T, 1, cap] view (tile axis = untiled batch dim): the
    slab is DMA'd VMEM<->HBM as a LANE slice at a 128-aligned anchor
    below the watermark; untouched slots persist via the aliasing
    (in-place).  The view matters on real TPU: a [T, cap] 2D memref is
    (8,128)-tiled along T, and Mosaic rejects single-row slices of a
    tiled dim ("slice shape along dimension 0 must be aligned to
    tiling (8)") — interpret mode does not model this, so only on-chip
    runs catch it (docs/R5_BATCH.log batch C).

    Arrival construction (roll + masked accumulate in direction order)
    and the watermark/fits/slab math are IDENTICAL to
    _append_runs_kernel, so the result is bit-equal to the unfused path
    (asserted in tests/test_deal_route.py)."""
    seg_refs = rest[:8]  # [1, 8, b_seg] VMEM, direction d from nbr[t, d]
    xo_ref, yo_ref, pxo_ref, pyo_ref, pzo_ref, wo_ref = rest[8:14]
    do_ref = rest[14]  # [1, 1, 128] dropped-count output (lane 0)
    slab_ref, acc_ref, in_sem, out_sem = rest[15:]
    a_w = 8 * b_seg
    b_slab = a_w + 256
    t = pl.program_id(0)
    wm = wm_ref[t]

    do_ref[...] = jnp.zeros(do_ref.shape, do_ref.dtype)

    # Slab anchor (same math as _append_runs_kernel): o is 128-aligned,
    # shift < 128 unless the watermark crowds the bucket top, where the
    # cap - b_slab clamp keeps [wm, wm + n_in) inside the slab whenever
    # `fits` holds (cap and b_slab are both lane multiples).
    o = (jnp.minimum(wm, cap - b_slab) // 128) * 128
    shift = wm - o
    ins = (x_ref, y_ref, px_ref, py_ref, pz_ref, w_ref)
    outs = (xo_ref, yo_ref, pxo_ref, pyo_ref, pzo_ref, wo_ref)

    def slab_in(i):
        return pltpu.make_async_copy(
            ins[i].at[t, :, pl.ds(pl.multiple_of(o, 128), b_slab)],
            slab_ref.at[i], in_sem.at[i],
        )

    for i in range(6):
        slab_in(i).start()

    colA = jax.lax.broadcasted_iota(jnp.int32, (1, b_slab), 1)
    row8 = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
    off = jnp.int32(0)
    for d in range(8):
        # Rows 6 (stats) and 7 (spare) ride the block; zero them so the
        # accumulate matches _append_runs_kernel's explicit zero pad.
        blk = jnp.where(row8 < 6, seg_refs[d][0], 0.0)  # [8, b_seg]
        n_r = jnp.sum((blk[5:6] > 0).astype(jnp.int32)).astype(jnp.int32)
        padded = jnp.concatenate(
            [blk, jnp.zeros((8, b_slab - b_seg), jnp.float32)], axis=1
        )
        # off <= d*b_seg, so the rolled run never wraps b_slab.
        rolled = pltpu.roll(padded, off, 1)
        sel = (colA >= off) & (colA < off + n_r)
        acc_ref[...] += jnp.where(sel, rolled, 0.0)
        off = off + n_r

    n_in = off
    fits = wm + n_in <= cap - 128
    idx = o + colA
    sel2 = (idx >= wm) & (idx < wm + n_in)

    for i in range(6):
        slab_in(i).wait()

    @pl.when(fits)
    def _write():
        for i in range(6):
            rolled2 = pltpu.roll(acc_ref[i : i + 1, :], shift, 1)
            slab_ref[i] = jnp.where(sel2, rolled2, slab_ref[i])
            pltpu.make_async_copy(
                slab_ref.at[i],
                outs[i].at[t, :, pl.ds(pl.multiple_of(o, 128), b_slab)],
                out_sem.at[i],
            ).start()
        for i in range(6):
            pltpu.make_async_copy(
                slab_ref.at[i],
                outs[i].at[t, :, pl.ds(pl.multiple_of(o, 128), b_slab)],
                out_sem.at[i],
            ).wait()

    @pl.when(jnp.logical_not(fits))
    def _drop():
        do_ref[0, 0, :] = jnp.full(
            (do_ref.shape[-1],), n_in.astype(jnp.float32)
        )


def append_segments(
    p: ParticleState, seg, wm, nbr, *, b_seg: int,
    interpret: bool = False, vma_axes=(),
):
    """Fused deal-route stages 2+3: append each tile's 8 neighbor-segment
    runs at its bucket watermark, reading the runs in place from
    segment_movers' PACKED output `seg` [T, 8ch, 8*b_seg] via the static
    neighbor table `nbr` [T, 8] i32 (nbr[t, d] = flat index of t's
    (-DIR_OFFSETS[d])-neighbor — the tile whose direction-d segment lands
    at t).  Bit-equal to _roll_segments + append_runs; touches ~3x fewer
    HBM bytes.  Returns (p2, dropped [T] i32)."""
    t_total, cap = p.num_tiles, p.capacity
    a_w = 8 * b_seg
    if b_seg % 128:
        raise ValueError("b_seg % 128 == 0 required")
    if cap < a_w + 256:
        raise ValueError(
            "bucket capacity must be >= segment window + 256 (slab slack)"
        )
    if seg.shape != (t_total, N_CH, a_w):
        raise ValueError(f"seg must be [T, {N_CH}, 8*b_seg], got {seg.shape}")

    pany = pl.BlockSpec(memory_space=pl.ANY)
    dspec = pl.BlockSpec((1, 1, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM)

    def seg_spec(d):
        # nbr arrives TRANSPOSED [8, T]: SMEM prefetch operands are
        # lane-padded to 128 in the minor dim, so [T, 8] would cost
        # T*128 i32 (2 MB at T=4096 — over the 1 MB SMEM budget, seen
        # on chip in batch D) while [8, T] stays at the true 131 KB.
        return pl.BlockSpec(
            (1, N_CH, b_seg),
            lambda i, wm_ref, nbr_ref, d=d: (nbr_ref[d, i], 0, d),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_total,),
        in_specs=[pany] * 6 + [seg_spec(d) for d in range(8)],
        out_specs=[pany] * 6 + [dspec],
        scratch_shapes=[
            pltpu.VMEM((6, 1, a_w + 256), jnp.float32),
            pltpu.VMEM((8, a_w + 256), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )
    vma = frozenset(vma_axes) if vma_axes else None

    def sds(shape, dt_):
        return (jax.ShapeDtypeStruct(shape, dt_, vma=vma) if vma
                else jax.ShapeDtypeStruct(shape, dt_))

    def r3(a):
        # [T, 1, cap] view: tile axis as untiled batch dim so the
        # in-kernel slab DMA slices along lanes (see kernel docstring).
        return a.reshape(t_total, 1, cap)

    outs = pl.pallas_call(
        functools.partial(_append_segments_kernel, b_seg=b_seg, cap=cap),
        grid_spec=grid_spec,
        out_shape=[sds((t_total, 1, cap), p.x.dtype)] * 6
        + [sds((t_total, 1, 128), jnp.float32)],
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3, 6: 4, 7: 5},
        interpret=interpret,
    )(
        wm.astype(jnp.int32), nbr.astype(jnp.int32).T,
        r3(p.x), r3(p.y), r3(p.px), r3(p.py), r3(p.pz), r3(p.w),
        *([seg] * 8),
    )
    p2 = ParticleState(*(a.reshape(t_total, cap) for a in outs[:6]))
    dropped = outs[6][:, 0, 0].astype(jnp.int32)
    return p2, dropped


def _append_runs_kernel(
    wm_ref,  # scalar-prefetch [T]
    x_ref, y_ref, px_ref, py_ref, pz_ref, w_ref,  # in/out aliased [1,1,K]
    ix_ref, iy_ref, ipx_ref, ipy_ref, ipz_ref, iw_ref,  # incoming [1,1,A]
    xo_ref, yo_ref, pxo_ref, pyo_ref, pzo_ref, wo_ref,  # aliased outs
    do_ref,  # [1, 1, 128] dropped-count output (lane 0)
    *,
    b_seg: int, runs: int, cap: int,
):
    """_append_kernel generalized to `runs` live-compacted runs at static
    offsets r*b_seg inside the incoming buffer (the deal-route's rolled
    neighbor segments): the runs are first rolled into one contiguous
    arrival block in VMEM, then slab-merged at the watermark exactly like
    the single-run append."""
    a_w = runs * b_seg
    b_slab = a_w + 256
    t = pl.program_id(0)
    wm = wm_ref[t]

    do_ref[...] = jnp.zeros(do_ref.shape, do_ref.dtype)
    xo_ref[...] = x_ref[...]
    yo_ref[...] = y_ref[...]
    pxo_ref[...] = px_ref[...]
    pyo_ref[...] = py_ref[...]
    pzo_ref[...] = pz_ref[...]
    wo_ref[...] = w_ref[...]

    inc = (ix_ref, iy_ref, ipx_ref, ipy_ref, ipz_ref, iw_ref)
    colA = jax.lax.broadcasted_iota(jnp.int32, (1, b_slab), 1)

    def scoped(acc_ref):  # [8, b_slab]; rows 0..5 = channels
        acc_ref[...] = jnp.zeros(acc_ref.shape, acc_ref.dtype)
        off = jnp.int32(0)
        for r in range(runs):
            sl = pl.ds(r * b_seg, b_seg)
            blk = jnp.concatenate(
                [ref[0, 0, sl].reshape(1, b_seg) for ref in inc]
                + [jnp.zeros((2, b_seg), jnp.float32)], axis=0
            )  # [8, b_seg]
            n_r = jnp.sum((blk[5:6] > 0).astype(jnp.int32)).astype(jnp.int32)
            padded = jnp.concatenate(
                [blk, jnp.zeros((8, b_slab - b_seg), jnp.float32)], axis=1
            )
            # off <= r*b_seg, so the rolled run never wraps b_slab.
            rolled = pltpu.roll(padded, off, 1)
            sel = (colA >= off) & (colA < off + n_r)
            acc_ref[...] += jnp.where(sel, rolled, 0.0)
            off = off + n_r

        n_in = off
        fits = wm + n_in <= cap - 128
        o = (jnp.minimum(wm, cap - b_slab) // 128) * 128
        shift = wm - o
        idx = o + colA
        sel2 = (idx >= wm) & (idx < wm + n_in)

        @pl.when(fits)
        def _write():
            slw = pl.ds(pl.multiple_of(o, 128), b_slab)
            outs = (xo_ref, yo_ref, pxo_ref, pyo_ref, pzo_ref, wo_ref)
            curs = (x_ref, y_ref, px_ref, py_ref, pz_ref, w_ref)
            for i, (cur_ref, out_ref) in enumerate(zip(curs, outs)):
                # shift < 128 and n_in <= a_w, so the live run stays
                # inside the slab after the roll.
                rolled2 = pltpu.roll(acc_ref[i : i + 1, :], shift, 1)
                cur = cur_ref[0, 0, slw].reshape(1, b_slab)
                out_ref[0, 0, slw] = jnp.where(
                    sel2, rolled2, cur
                ).reshape(b_slab)

        @pl.when(jnp.logical_not(fits))
        def _drop():
            do_ref[0, 0, :] = jnp.full(
                (do_ref.shape[-1],), n_in.astype(jnp.float32)
            )

    pl.run_scoped(scoped, pltpu.VMEM((8, b_slab), jnp.float32))


def append_runs(
    p: ParticleState, incoming: ParticleState, wm, *, b_seg: int,
    interpret: bool = False, vma_axes=(),
):
    """Append `runs = incoming.capacity // b_seg` live-compacted runs per
    tile at the bucket watermark (deal-route stage 3).  Returns
    (p2, dropped [T] i32)."""
    t_total, cap = p.num_tiles, p.capacity
    a_w = incoming.capacity
    runs = a_w // b_seg
    if a_w % b_seg or b_seg % 128:
        raise ValueError("incoming must be runs * b_seg, b_seg % 128 == 0")
    if cap < a_w + 256:
        raise ValueError(
            "bucket capacity must be >= segment window + 256 (slab slack)"
        )

    pin = pl.BlockSpec((1, 1, cap), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    iin = pl.BlockSpec((1, 1, a_w), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, 1, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)

    def r3(a, n):
        return a.reshape(t_total, 1, n)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_total,),
        in_specs=[pin] * 6 + [iin] * 6,
        out_specs=[pin] * 6 + [dspec],
    )
    vma = frozenset(vma_axes) if vma_axes else None

    def sds(shape, dt_):
        return (jax.ShapeDtypeStruct(shape, dt_, vma=vma) if vma
                else jax.ShapeDtypeStruct(shape, dt_))

    outs = pl.pallas_call(
        functools.partial(_append_runs_kernel, b_seg=b_seg, runs=runs, cap=cap),
        grid_spec=grid_spec,
        out_shape=[sds((t_total, 1, cap), p.x.dtype)] * 6
        + [sds((t_total, 1, 128), jnp.float32)],
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5},
        interpret=interpret,
    )(
        wm.astype(jnp.int32),
        r3(p.x, cap), r3(p.y, cap), r3(p.px, cap), r3(p.py, cap),
        r3(p.pz, cap), r3(p.w, cap),
        r3(incoming.x, a_w), r3(incoming.y, a_w), r3(incoming.px, a_w),
        r3(incoming.py, a_w), r3(incoming.pz, a_w), r3(incoming.w, a_w),
    )
    p2 = ParticleState(*(a.reshape(t_total, cap) for a in outs[:6]))
    dropped = outs[6][:, 0, 0].astype(jnp.int32)
    return p2, dropped


def append_incoming(
    p: ParticleState, incoming: ParticleState, wm, *, interpret: bool = False,
    vma_axes=(),
):
    """Write each tile's incoming slab at its watermark (in-place via
    aliasing).  Returns (p2, dropped [T] i32)."""
    t_total, cap = p.num_tiles, p.capacity
    b_in = incoming.capacity
    if b_in % 128:
        raise ValueError("incoming capacity must be a lane multiple")
    if cap < b_in + 256:
        raise ValueError(
            "bucket capacity must be >= incoming buffer + 256 (slab slack)"
        )

    # index maps receive the scalar-prefetch ref as a trailing arg
    pin = pl.BlockSpec((1, 1, cap), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    iin = pl.BlockSpec((1, 1, b_in), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)
    dspec = pl.BlockSpec((1, 1, 128), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM)

    def r3(a, n):
        return a.reshape(t_total, 1, n)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_total,),
        in_specs=[pin] * 6 + [iin] * 6,
        out_specs=[pin] * 6 + [dspec],
    )
    vma = frozenset(vma_axes) if vma_axes else None

    def sds(shape, dt_):
        return (jax.ShapeDtypeStruct(shape, dt_, vma=vma) if vma
                else jax.ShapeDtypeStruct(shape, dt_))

    outs = pl.pallas_call(
        functools.partial(_append_kernel, b_in=b_in, cap=cap),
        grid_spec=grid_spec,
        out_shape=[sds((t_total, 1, cap), p.x.dtype)] * 6
        + [sds((t_total, 1, 128), jnp.float32)],
        input_output_aliases={1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5},
        interpret=interpret,
    )(
        wm.astype(jnp.int32),
        r3(p.x, cap), r3(p.y, cap), r3(p.px, cap), r3(p.py, cap),
        r3(p.pz, cap), r3(p.w, cap),
        r3(incoming.x, b_in), r3(incoming.y, b_in), r3(incoming.px, b_in),
        r3(incoming.py, b_in), r3(incoming.pz, b_in), r3(incoming.w, b_in),
    )
    p2 = ParticleState(*(a.reshape(t_total, cap) for a in outs[:6]))
    dropped = outs[6][:, 0, 0].astype(jnp.int32)
    return p2, dropped
