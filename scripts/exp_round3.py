"""Round-3 perf experiments: deposit-dot word-split, re-bin permute
word-split, split chunk width, mover-buffer census sizing.

Run on the real chip:  python scripts/exp_round3.py
"""
import argparse
import time

import jax
import jax.numpy as jnp


def sync(x):
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
    ap.add_argument("--particles", type=float, default=1e8)
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--order", type=int, default=2)
    args = ap.parse_args()

    from minipic_tpu.core.config import Deck, SpeciesSpec
    from minipic_tpu.simulation import (
        Simulation, advance_species_tiles, resolve_backend, _tile_origins,
    )
    from minipic_tpu.fields.halo import pad_fields_periodic
    from minipic_tpu.fields.tiles import extract_field_tiles
    from minipic_tpu.ops.pallas.rebin_kernels import append_incoming, split_buckets
    from minipic_tpu.particles.binning import rebin_flat, wrap_positions

    grid = args.grid
    ppc = max(1, round(args.particles / grid**2))
    deck = Deck(
        box_x=grid / 10.0, box_y=grid / 10.0, nx=grid, ny=grid,
        tile_nx=8, tile_ny=8, guard=4,
        species=(SpeciesSpec("ele", charge=-1.0, mass=1.0, ppc=ppc, uth=0.05,
                             shape_order=args.order),),
        precision="f32", capacity_headroom=1.1, kchunk=0,
    )
    sim = Simulation(deck)
    state = sim.state
    sim.state = None
    tiling = deck.tiling
    g = deck.guard
    backend, interpret = resolve_backend(deck)
    p = state.species[0]
    print(f"order={args.order} cap={p.capacity} tiles={p.num_tiles} "
          f"auto_mover={deck.mover_cap(p.capacity)}", flush=True)

    @jax.jit
    def stage_extract(f):
        fpad = pad_fields_periodic(f, g)
        return extract_field_tiles(fpad, tiling.tile_rows, tiling.tile_cols,
                                   tiling.tile_ny, tiling.tile_nx, g)

    ftiles = stage_extract(state.fields)
    spec = deck.species[0]

    # --- A: deposit mode on the advance kernel ---
    # wsplit stacks 6x along K; body_sub bounds the bf16 word intermediates
    # to fit scoped VMEM (whole-bucket chunks are 26880 lanes).
    from minipic_tpu.ops.pallas.ppd_kernel import fused_push_deposit

    counts = jnp.max(
        (jnp.arange(p.capacity, dtype=jnp.int32)[None, :] + 1)
        * (p.w > 0).astype(jnp.int32), axis=1)
    ox, oy = _tile_origins(tiling, deck.dtype)
    for mode, bs in (("highest", 0), ("wsplit", 5), ("wsplit", 10),
                     ("wsplit", 21), ("highest", 5)):
        def stage_advance(pp, ft, cnt, mode=mode, bs=bs):
            return fused_push_deposit(
                pp, ft, cnt, (ox, oy), qm=spec.charge / spec.mass,
                q=spec.charge, order=spec.shape_order,
                tile_ny=tiling.tile_ny, tile_nx=tiling.tile_nx, g=g,
                dt=deck.dt, dx=deck.dx, dy=deck.dy, kc=p.capacity,
                gather_precision="exact", deposit_mode=mode, body_sub=bs,
                wrap=(deck.nx, deck.ny), grid=(deck.nx, deck.ny),
            )
        try:
            t = timeit(jax.jit(stage_advance), p, ftiles, counts)
            print(f"advance deposit={mode:8s} body_sub={bs:2d} {t*1e3:9.1f} ms", flush=True)
        except Exception as e:
            print(f"advance deposit={mode:8s} body_sub={bs:2d} FAILED: {str(e)[:120]}", flush=True)

    pw = jax.jit(lambda pp: wrap_positions(pp, deck.nx, deck.ny, True))(p)

    # --- B: split kernel wsplit x kc ---
    for wsp in (False, True):
        for kc in (128, 256):
            def stage_split(pp, wsp=wsp, kc=kc):
                return split_buckets(
                    pp, tile_rows=tiling.tile_rows, tile_cols=tiling.tile_cols,
                    tile_ny=tiling.tile_ny, tile_nx=tiling.tile_nx,
                    b_cap=4096, kc=kc, interpret=interpret, wsplit=wsp)
            t = timeit(jax.jit(stage_split), pw)
            print(f"split wsplit={int(wsp)} kc={kc:4d} {t*1e3:9.1f} ms", flush=True)

    # --- C: route sort vs mover buffer size ---
    p1, movers, wm, _pend = jax.jit(
        lambda pp: split_buckets(
            pp, tile_rows=tiling.tile_rows, tile_cols=tiling.tile_cols,
            tile_ny=tiling.tile_ny, tile_nx=tiling.tile_nx,
            b_cap=4096, interpret=interpret, wsplit=True)
    )(pw)
    n_mov = jnp.sum((movers.w > 0).astype(jnp.int32), axis=1)
    print(f"movers/tile: max={int(n_mov.max())} mean={float(n_mov.mean()):.0f}",
          flush=True)
    for mc in (4096, 2048, 1024, 512):
        def stage_route(mv, mc=mc):
            flat = jax.tree_util.tree_map(
                lambda a: a[:, :mc].reshape(pw.num_tiles * mc), mv)
            return rebin_flat(
                flat, tile_rows=tiling.tile_rows, tile_cols=tiling.tile_cols,
                tile_nx=tiling.tile_nx, tile_ny=tiling.tile_ny, capacity=mc)
        t = timeit(jax.jit(stage_route), movers)
        print(f"route mc={mc:5d} {t*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
