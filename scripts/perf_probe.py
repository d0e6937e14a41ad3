"""Per-stage timing of the bench step on the real chip.

Usage:
    python scripts/perf_probe.py [--tile 16 --guard 4 --rebin 8 --kchunk 4096
                                  --particles 1e8 --grid 512 --mover 4096]

Times each stage of the PIC step separately (with a host-read sync after
each — axon's block_until_ready does not block) and the fused whole-step
scan, so the step-time budget table in docs/ROADMAP.md sums to the
measured total.
"""
import argparse
import time

import jax
import jax.numpy as jnp


def sync(x):
    if isinstance(x, tuple):
        x = x[0]
    leaves = jax.tree_util.tree_leaves(x)
    return float(leaves[0].sum())


def timeit(fn, *args, n=3, warmup=1):
    for _ in range(warmup):
        sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    # Defaults = the HEADLINE bench deck (bench.py): 8x8 tiles, guard 4,
    # whole-bucket chunks, TSC, int8 matched-quantization deposit.
    ap.add_argument("--tile", type=int, default=8)
    ap.add_argument("--guard", type=int, default=4)
    ap.add_argument("--rebin", type=int, default=8)
    ap.add_argument("--kchunk", type=int, default=0)
    ap.add_argument("--particles", type=float, default=1e8)
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--mover", type=int, default=0)
    ap.add_argument("--headroom", type=float, default=1.1)
    ap.add_argument("--gather", default="exact")
    ap.add_argument("--deposit", default="int8")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--order", type=int, default=2)
    args = ap.parse_args()

    from minipic_tpu.core.config import Deck, SpeciesSpec
    from minipic_tpu.simulation import (
        Simulation, build_step, advance_species_tiles, resolve_backend, _tile_origins,
    )
    from minipic_tpu.fields.halo import pad_fields_periodic, fold_block_periodic
    from minipic_tpu.fields.tiles import extract_field_tiles, fold_tiles
    from minipic_tpu.fields.yee import update_b_half_periodic, update_e_full_periodic
    from minipic_tpu.particles.binning import rebin, rebin_auto, wrap_positions
    from minipic_tpu.core.state import CurrentState

    grid = args.grid
    ppc = max(1, round(args.particles / grid**2))
    deck = Deck(
        box_x=grid / 10.0, box_y=grid / 10.0, nx=grid, ny=grid,
        tile_nx=args.tile, tile_ny=args.tile, guard=args.guard,
        species=(SpeciesSpec("ele", charge=-1.0, mass=1.0, ppc=ppc, uth=0.05,
                             shape_order=args.order),),
        precision="f32", rebin_interval=args.rebin,
        capacity_headroom=args.headroom,
        mover_capacity=(args.mover if args.mover > 0 else None),
        kchunk=args.kchunk, gather_precision=args.gather,
        deposit=args.deposit,
    )
    sim = Simulation(deck)
    state = sim.state
    sim.state = None
    tiling = deck.tiling
    g = deck.guard
    backend, interpret = resolve_backend(deck)
    p = state.species[0]
    n_live = int((p.w > 0).sum())
    print(f"tile={args.tile} g={g} rebin={args.rebin} kchunk={args.kchunk} "
          f"cap={p.capacity} tiles={p.num_tiles} live={n_live:.3e} backend={backend}")

    # --- stage: halo pad + window extract ---
    @jax.jit
    def stage_extract(f):
        fpad = pad_fields_periodic(f, g)
        return extract_field_tiles(fpad, tiling.tile_rows, tiling.tile_cols,
                                   tiling.tile_ny, tiling.tile_nx, g)

    t_extract = timeit(stage_extract, state.fields); print(f"extract       {t_extract*1e3:9.1f} ms", flush=True)
    ftiles = stage_extract(state.fields)

    # --- stage: fused advance (gather+push+deposit) ---
    spec = deck.species[0]

    @jax.jit
    def stage_advance(pp, ft):
        return advance_species_tiles(
            pp, ft, qm=spec.charge / spec.mass, q=spec.charge,
            order=spec.shape_order, tile_ny=tiling.tile_ny, tile_nx=tiling.tile_nx,
            origins=_tile_origins(tiling, deck.dtype), g=g,
            dt=deck.dt, dx=deck.dx, dy=deck.dy, kchunk=deck.kchunk,
            backend=backend, interpret=interpret,
            gather_precision=deck.gather_precision,
            deposit_mode=deck.deposit,
            # uniform q*w so the int8 path engages (simulation.py gate)
            qw0=spec.charge * deck.dx * deck.dy / spec.ppc,
            wrap=(deck.nx, deck.ny), grid=(deck.nx, deck.ny),
            return_disp=True,  # the drift-trigger step requests this
        )

    t_advance = timeit(stage_advance, p, ftiles); print(f"advance       {t_advance*1e3:9.1f} ms", flush=True)
    pnew, (jx, jy, jz), _disp = stage_advance(p, ftiles)

    # --- stage: fold J + yee x3 ---
    @jax.jit
    def stage_field(f, jx, jy, jz):
        def to_global(t):
            tr = t.reshape(tiling.tile_rows, tiling.tile_cols,
                           tiling.tile_ny + 2 * g, tiling.tile_nx + 2 * g)
            return fold_block_periodic(fold_tiles(tr, tiling.tile_ny, tiling.tile_nx, g), g)
        j = CurrentState(to_global(jx), to_global(jy), to_global(jz))
        f = update_b_half_periodic(f, deck.dt, deck.dx, deck.dy)
        f = update_e_full_periodic(f, deck.dt, deck.dx, deck.dy, j)
        return update_b_half_periodic(f, deck.dt, deck.dx, deck.dy)

    t_field = timeit(stage_field, state.fields, jx, jy, jz); print(f"field(J+yee)  {t_field*1e3:9.1f} ms", flush=True)

    # --- stage: wrap ---
    @jax.jit
    def stage_wrap(pp):
        return wrap_positions(pp, deck.nx, deck.ny, True)

    t_wrap = timeit(stage_wrap, pnew); print(f"wrap          {t_wrap*1e3:9.1f} ms", flush=True)
    pw = stage_wrap(pnew)
    del pnew, jx, jy, jz, ftiles  # free device memory before the sort stages

    # --- stage: rebin (incremental auto) ---
    mc = deck.mover_cap(p.capacity)

    @jax.jit
    def stage_rebin(pp):
        return rebin_auto(pp, tiling, mc, interpret=interpret)[:2]

    t_rebin = timeit(stage_rebin, pw); print(f"rebin_auto    {t_rebin*1e3:9.1f} ms", flush=True)

    # --- rebin sub-stages ---
    from minipic_tpu.ops.pallas.rebin_kernels import append_incoming, split_buckets
    from minipic_tpu.particles.binning import rebin_flat

    @jax.jit
    def stage_xtract(pp):
        return split_buckets(pp, tile_rows=tiling.tile_rows, tile_cols=tiling.tile_cols,
                             tile_ny=tiling.tile_ny, tile_nx=tiling.tile_nx,
                             b_cap=mc, interpret=interpret)

    t_x = timeit(stage_xtract, pw); print(f"  split       {t_x*1e3:9.1f} ms", flush=True)
    p1, movers, wm, _da = stage_xtract(pw)

    @jax.jit
    def stage_route(mv):
        flat = jax.tree_util.tree_map(lambda a: a.reshape(pw.num_tiles * mc), mv)
        return rebin_flat(flat, tile_rows=tiling.tile_rows, tile_cols=tiling.tile_cols,
                          tile_nx=tiling.tile_nx, tile_ny=tiling.tile_ny, capacity=mc)

    t_r = timeit(stage_route, movers); print(f"  route       {t_r*1e3:9.1f} ms", flush=True)
    incoming, _ = stage_route(movers)

    @jax.jit
    def stage_append(pp, inc, w):
        return append_incoming(pp, inc, w, interpret=interpret)

    t_a = timeit(stage_append, p1, incoming, wm); print(f"  append      {t_a*1e3:9.1f} ms", flush=True)
    del p1, movers, incoming

    # --- stage: full sort rebin (for comparison) ---
    @jax.jit
    def stage_sort(pp):
        return rebin(pp, tiling)

    t_sort = timeit(stage_sort, pw); print(f"rebin_sort    {t_sort*1e3:9.1f} ms", flush=True)

    # --- stage: diagnostics (kinetic + momentum) ---
    from minipic_tpu.core.state import kinetic_energy, momentum_sum

    @jax.jit
    def stage_diag(pp):
        return kinetic_energy(pp, 1.0), momentum_sum(pp, 1.0)

    t_diag = timeit(stage_diag, pw); print(f"diag          {t_diag*1e3:9.1f} ms", flush=True)

    del p, pw  # free before the whole-step scan

    # --- whole step, scanned ---
    step = build_step(deck)

    def multi(s, n):
        def body(ss, _):
            s2, _d = step(ss)
            return s2, ()
        out, _ = jax.lax.scan(body, s, None, length=n)
        return out

    multi_n = jax.jit(multi, static_argnums=1)
    sync(multi_n(state, args.steps))
    t0 = time.perf_counter()
    out = multi_n(state, args.steps)
    sync(out)
    t_step = (time.perf_counter() - t0) / args.steps

    amort = t_rebin / args.rebin
    budget = t_extract + t_advance + t_field + t_wrap + amort + t_diag
    print(f"rebin amortized /{args.rebin} = {amort*1e3:.1f} ms")
    print(f"SUM (budget)  {budget*1e3:9.1f} ms")
    print(f"STEP (scan)   {t_step*1e3:9.1f} ms   -> {n_live/t_step:.3e} pushes/s", flush=True)


if __name__ == "__main__":
    main()
