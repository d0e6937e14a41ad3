"""Round-3: time red_mode tree vs ytree on the fused kernel at bench scale."""
import time

import jax
import jax.numpy as jnp

from minipic_tpu.core.config import Deck, SpeciesSpec
from minipic_tpu.ops.pallas.ppd_kernel import fused_push_deposit
from minipic_tpu.simulation import Simulation, _tile_origins
from minipic_tpu.fields.halo import pad_fields_periodic
from minipic_tpu.fields.tiles import extract_field_tiles


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
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--order", type=int, default=2)
    args = ap.parse_args()
    grid = 512
    ppc = max(1, round(1e8 / grid**2))
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
    p = state.species[0]
    fpad = pad_fields_periodic(state.fields, g)
    ftiles = extract_field_tiles(fpad, tiling.tile_rows, tiling.tile_cols,
                                 tiling.tile_ny, tiling.tile_nx, g)
    counts = jnp.max(
        (jnp.arange(p.capacity, dtype=jnp.int32)[None, :] + 1)
        * (p.w > 0).astype(jnp.int32), axis=1)
    ox, oy = _tile_origins(tiling, deck.dtype)
    print(f"order={args.order} cap={p.capacity} tiles={p.num_tiles}", flush=True)

    for mode, bs in (("tree", 0), ("ytree", 0), ("ytree", 5), ("ytree", 2)):
        def f(pp, ft, cnt, mode=mode, bs=bs):
            return fused_push_deposit(
                pp, ft, cnt, (ox, oy), qm=-1.0, q=-1.0, order=args.order,
                tile_ny=tiling.tile_ny, tile_nx=tiling.tile_nx, g=g,
                dt=deck.dt, dx=deck.dx, dy=deck.dy, kc=p.capacity,
                wrap=(deck.nx, deck.ny), grid=(deck.nx, deck.ny),
                red_mode=mode, body_sub=bs, return_disp=True,
            )
        try:
            t = timeit(jax.jit(f), p, ftiles, counts)
            print(f"advance red={mode:6s} body_sub={bs}  {t*1e3:8.1f} ms", flush=True)
        except Exception as e:
            print(f"advance red={mode:6s} body_sub={bs}  FAILED: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
