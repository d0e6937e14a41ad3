"""Round-3 batch 3: deposit MXU array packing on the fused kernel
(pack2: masked block-diagonal — negative; kfold: K-halves reshaped onto
M/N — the fix)."""
import time

import jax
import jax.numpy as jnp

from minipic_tpu.core.config import Deck, SpeciesSpec
from minipic_tpu.ops.pallas.ppd_kernel import fused_push_deposit
from minipic_tpu.simulation import Simulation, resolve_backend, _tile_origins
from minipic_tpu.fields.halo import pad_fields_periodic
from minipic_tpu.fields.tiles import extract_field_tiles


def sync(x):
    return float(jax.tree_util.tree_leaves(x)[0].sum())


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

    outs = {}
    for mode in ("highest", "kfold", "pack2"):
        def f(pp, ft, mode=mode):
            return fused_push_deposit(
                pp, ft, counts, (ox, oy), qm=-1.0, q=-1.0, order=2,
                tile_ny=tiling.tile_ny, tile_nx=tiling.tile_nx, g=g,
                dt=deck.dt, dx=deck.dx, dy=deck.dy, kc=p.capacity,
                wrap=(deck.nx, deck.ny), grid=(deck.nx, deck.ny),
                deposit_mode=mode,
            )
        jf = jax.jit(f)
        t = timeit(jf, p, ftiles)
        outs[mode] = jf(p, ftiles)
        print(f"advance deposit={mode:8s} {t*1e3:9.1f} ms", flush=True)

    # exactness: pack2 J must match HIGHEST J to f32 round-off
    import numpy as np
    for i, nm in ((1, "jx"), ):
        a = np.asarray(outs["highest"][1][0])
        b = np.asarray(outs["kfold"][1][0])
        scale = np.abs(a).max()
        print(f"jx max|diff| = {np.abs(a-b).max():.3e} (scale {scale:.3e})", flush=True)


if __name__ == "__main__":
    main()
