"""Round-3: deal-route (segment + roll + run-append) vs sort route at
bench scale."""
import time

import jax
import jax.numpy as jnp

from minipic_tpu.core.config import Deck, SpeciesSpec
from minipic_tpu.particles.binning import (
    _roll_segments, _route, _seg_neighbor_table, rebin_auto, wrap_positions,
)
from minipic_tpu.ops.pallas.rebin_kernels import (
    append_incoming, append_runs, append_segments, segment_movers,
    split_buckets,
)
from minipic_tpu.simulation import Simulation


def sync(x):
    return float(jax.tree_util.tree_leaves(x)[0][0].sum())


def timeit(fn, *args, n=3):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    grid = 512
    ppc = max(1, round(1e8 / grid**2))
    deck = Deck(
        box_x=grid / 10.0, box_y=grid / 10.0, nx=grid, ny=grid,
        tile_nx=8, tile_ny=8, guard=4,
        species=(SpeciesSpec("ele", charge=-1.0, mass=1.0, ppc=ppc, uth=0.05,
                             shape_order=2),),
        precision="f32", capacity_headroom=1.1, kchunk=0,
    )
    sim = Simulation(deck)
    p = sim.state.species[0]
    sim.state = None
    t = deck.tiling
    # 0.35-cell sigma blast ~= the real drift-trigger mover census
    # (peak ~1650 movers/tile at the bench deck)
    key = jax.random.PRNGKey(0)
    dx_ = jax.random.normal(key, p.x.shape) * 0.35
    dy_ = jax.random.normal(jax.random.fold_in(key, 1), p.y.shape) * 0.35
    p = p._replace(x=jnp.where(p.w > 0, p.x + dx_, p.x),
                   y=jnp.where(p.w > 0, p.y + dy_, p.y))
    p = jax.jit(lambda q: wrap_positions(q, deck.nx, deck.ny, True))(p)
    del dx_, dy_  # 2.7 GB of blast noise — dead once applied

    mc = deck.mover_cap(p.capacity)
    sc = deck.mover_seg_cap(mc)
    print(f"cap={p.capacity} mc={mc} sc={sc}", flush=True)

    splitf = jax.jit(lambda q: split_buckets(
        q, tile_rows=t.tile_rows, tile_cols=t.tile_cols, tile_ny=t.tile_ny,
        tile_nx=t.tile_nx, b_cap=mc))
    ts = timeit(splitf, p)
    p1, movers, wm, pend = splitf(p)
    # p is only needed for the conservation count — free it now (2.7 GB;
    # the fused leg OOMed at 1e8 with p + p1 + p2 + fused outputs live,
    # docs/R5_BATCH.log batch D2).
    live_before = int(jnp.sum((p.w > 0).astype(jnp.int32)))
    del p
    n_mov = jnp.sum((movers.w > 0).astype(jnp.int32), axis=1)
    print(f"split             {ts*1e3:8.1f} ms   movers/tile max={int(n_mov.max())} mean={float(n_mov.mean()):.0f} pend={int(pend.sum())}", flush=True)

    segf = jax.jit(lambda m: segment_movers(
        m, tile_rows=t.tile_rows, tile_cols=t.tile_cols, tile_ny=t.tile_ny,
        tile_nx=t.tile_nx, b_seg=sc))
    tg = timeit(segf, movers)
    seg, segdrop = segf(movers)
    print(f"segment           {tg*1e3:8.1f} ms   dropped={int(segdrop.sum())}", flush=True)
    segw = seg.w.reshape(t.num_tiles, 8, sc)
    nd = jnp.sum((segw > 0).astype(jnp.int32), axis=2)
    print(f"  per-dir max: {[int(x) for x in nd.max(axis=0)]}", flush=True)

    rollf = jax.jit(lambda s: _roll_segments(s, t, sc))
    tr_ = timeit(rollf, seg)
    inc = rollf(seg)
    print(f"rolls             {tr_*1e3:8.1f} ms", flush=True)
    del seg, segw

    appf = jax.jit(lambda q, i, w: append_runs(q, i, w, b_seg=sc))
    ta = timeit(appf, p1, inc, wm)
    p2, dropb = appf(p1, inc, wm)
    print(f"append_runs       {ta*1e3:8.1f} ms   dropped={int(dropb.sum())}", flush=True)
    print(f"DEAL TOTAL        {(ts+tg+tr_+ta)*1e3:8.1f} ms", flush=True)
    del inc, dropb

    # Fused rolls+append (append_segments): packed segment output, static
    # neighbor table, slab-only bucket DMA.  MUST be validated on real
    # hardware, not just interpret: the fused kernel relies on ANY-space
    # input_output_aliases leaving un-DMA'd bucket slots intact (true
    # HBM aliasing) — the verify-skill gotcha list exists because
    # aliasing semantics only show on chip.
    segpf = jax.jit(lambda m: segment_movers(
        m, tile_rows=t.tile_rows, tile_cols=t.tile_cols, tile_ny=t.tile_ny,
        tile_nx=t.tile_nx, b_seg=sc, packed=True))
    tgp = timeit(segpf, movers)
    seg_raw, _sd = segpf(movers)
    nbr = _seg_neighbor_table(t)
    fusedf = jax.jit(lambda q, s, w: append_segments(q, s, w, nbr, b_seg=sc))
    tf = timeit(fusedf, p1, seg_raw, wm)
    p2f, dropf = fusedf(p1, seg_raw, wm)
    eq = all(bool(jnp.array_equal(a, b).item())
             for a, b in zip(tuple(p2), tuple(p2f)))
    print(f"segment(packed)   {tgp*1e3:8.1f} ms", flush=True)
    print(f"append_segments   {tf*1e3:8.1f} ms   dropped={int(dropf.sum())}"
          f"   BITEXACT={eq}", flush=True)
    print(f"DEAL TOTAL(fused) {(ts+tgp+tf)*1e3:8.1f} ms", flush=True)
    if not eq:
        raise SystemExit("FUSED APPEND MISMATCH vs unfused deal route")
    del p2f, dropf, seg_raw

    # conservation cross-check on chip (live_before counted pre-split)
    live_after = int(jnp.sum((p2.w > 0).astype(jnp.int32)))
    print(f"live before/after deal: {live_before} {live_after} "
          f"(pend {int(pend.sum())})", flush=True)

    # Sort-route baseline: at bench scale several full-capacity particle
    # sets are live by here (~2.6 GB each) and the _route sort OOMed the
    # chip (docs/R4_BATCH.log, RESOURCE_EXHAUSTED) — free everything the
    # baseline doesn't need and keep it non-fatal.
    del p2
    try:
        routef = jax.jit(lambda m, q: _route(m, q, t, mc))
        tro = timeit(routef, movers, p1)
        incoming, ovf = routef(movers, p1)
        del ovf
        app0f = jax.jit(lambda q, i, w: append_incoming(q, i, w))
        ta0 = timeit(app0f, p1, incoming, wm)
        print(f"route(sort)       {tro*1e3:8.1f} ms   append {ta0*1e3:8.1f} ms", flush=True)
        print(f"SORT TOTAL        {(ts+tro+ta0)*1e3:8.1f} ms", flush=True)
    except Exception as e:  # noqa: BLE001 — baseline only, keep deal data
        print(f"sort-route baseline failed: {type(e).__name__}: {e}",
              flush=True)


if __name__ == "__main__":
    main()
