"""int8 matched-quantization deposit: on-chip exactness + speed.

1. Continuity residual of the int8-deposited J against rho built from the
   SAME quantized shapes (deposit_rho_chunk(quantize=S)) — must sit at
   f32 fold roundoff, like the HIGHEST path does against f32 rho.
2. Full-kernel timing at the bench deck, deposit highest vs int8.
3. J field difference int8 vs highest (expected ~shape-quantization).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from minipic_tpu.core.config import Deck, SpeciesSpec
from minipic_tpu.simulation import (
    Simulation, _tile_origins, advance_species_tiles, resolve_backend,
    tile_local_coords,
)
from minipic_tpu.particles.deposit import deposit_rho_chunk
from minipic_tpu.fields.halo import fold_block_periodic, pad_fields_periodic
from minipic_tpu.fields.tiles import extract_field_tiles, fold_tiles


def sync(x):
    return float(jax.tree_util.tree_leaves(x)[0].sum())


def timeit(fn, *args, n=3):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def continuity(order=2):
    deck = Deck(
        box_x=12.8, box_y=12.8, nx=128, ny=128, tile_nx=8, tile_ny=8,
        guard=4, kchunk=0,
        species=(SpeciesSpec("r", charge=-1.0, mass=1.0, ppc=16, ux=0.2,
                             uth=0.02, shape_order=order),),
    )
    sim = Simulation(deck)
    tiling = deck.tiling
    g = deck.guard
    backend, interpret = resolve_backend(deck)
    spec = deck.species[0]
    from minipic_tpu.ops.pallas.ppd_kernel import qshape_scale
    S = qshape_scale(order)
    qw0 = spec.charge * deck.dx * deck.dy / spec.ppc

    @jax.jit
    def residual(state):
        fpad = pad_fields_periodic(state.fields, g)
        ftiles = extract_field_tiles(fpad, tiling.tile_rows, tiling.tile_cols,
                                     tiling.tile_ny, tiling.tile_nx, g)
        ox, oy = _tile_origins(tiling, deck.dtype)

        def rho_of(p):
            xi, eta = tile_local_coords(p.x, p.y, (ox, oy), tiling.tile_nx,
                                        tiling.tile_ny, (deck.nx, deck.ny))
            r = deposit_rho_chunk(xi, eta, p.w * spec.charge,
                                  tiling.tile_ny, tiling.tile_nx, g,
                                  order, deck.dx, deck.dy, quantize=S)
            tr = r.reshape(tiling.tile_rows, tiling.tile_cols,
                           tiling.tile_ny + 2 * g, tiling.tile_nx + 2 * g)
            return fold_block_periodic(
                fold_tiles(tr, tiling.tile_ny, tiling.tile_nx, g), g)

        p = state.species[0]
        rho0 = rho_of(p)
        pnew, (jx, jy, jz) = advance_species_tiles(
            p, ftiles, qm=spec.charge / spec.mass, q=spec.charge,
            order=order, tile_ny=tiling.tile_ny,
            tile_nx=tiling.tile_nx, origins=(ox, oy), g=g,
            dt=deck.dt, dx=deck.dx, dy=deck.dy, kchunk=deck.kchunk,
            backend=backend, interpret=interpret,
            deposit_mode="int8", qw0=qw0,
        )
        rho1 = rho_of(pnew)

        def glob(t):
            tr = t.reshape(tiling.tile_rows, tiling.tile_cols,
                           tiling.tile_ny + 2 * g, tiling.tile_nx + 2 * g)
            return fold_block_periodic(
                fold_tiles(tr, tiling.tile_ny, tiling.tile_nx, g), g)

        jxg, jyg = glob(jx), glob(jy)
        divx = (jxg - jnp.roll(jxg, 1, axis=1)) / deck.dx
        divy = (jyg - jnp.roll(jyg, 1, axis=0)) / deck.dy
        res = (rho1 - rho0) / deck.dt + divx + divy
        return jnp.max(jnp.abs(res)), jnp.max(jnp.abs(rho0)) / deck.dt

    rm, sc = residual(sim.state)
    print(f"order {order}: int8 continuity (quantized rho): "
          f"max {float(rm):.3e} scale {float(sc):.3e} "
          f"rel {float(rm/sc):.3e}", flush=True)


def bench_timing():
    grid = 512
    ppc = max(1, round(1e8 / grid**2))
    deck = Deck(
        box_x=grid / 10.0, box_y=grid / 10.0, nx=grid, ny=grid,
        tile_nx=8, tile_ny=8, guard=4,
        species=(SpeciesSpec("ele", charge=-1.0, mass=1.0, ppc=ppc,
                             uth=0.05, shape_order=2),),
        precision="f32", capacity_headroom=1.1, kchunk=0,
    )
    sim = Simulation(deck)
    state = sim.state
    sim.state = None
    tiling = deck.tiling
    g = deck.guard
    backend, interpret = resolve_backend(deck)
    p = state.species[0]
    spec = deck.species[0]
    fpad = pad_fields_periodic(state.fields, g)
    ftiles = extract_field_tiles(fpad, tiling.tile_rows, tiling.tile_cols,
                                 tiling.tile_ny, tiling.tile_nx, g)
    ox, oy = _tile_origins(tiling, deck.dtype)
    qw0 = spec.charge * deck.dx * deck.dy / spec.ppc
    n_live = int((p.w > 0).sum())

    outs = {}
    for mode in ("highest", "int8"):
        def f(pp, ft, mode=mode):
            return advance_species_tiles(
                pp, ft, qm=-1.0, q=-1.0, order=2,
                tile_ny=tiling.tile_ny, tile_nx=tiling.tile_nx,
                origins=(ox, oy), g=g, dt=deck.dt, dx=deck.dx, dy=deck.dy,
                kchunk=deck.kchunk, backend=backend, interpret=interpret,
                deposit_mode=mode, qw0=qw0,
                wrap=(deck.nx, deck.ny), grid=(deck.nx, deck.ny),
            )
        jf = jax.jit(f)
        t = timeit(jf, p, ftiles)
        _, (jx, jy, jz) = jf(p, ftiles)
        outs[mode] = (np.asarray(jx), np.asarray(jy), np.asarray(jz))
        print(f"advance deposit={mode:8s} {t*1e3:7.1f} ms "
              f"({n_live/t:.2e} p/s)", flush=True)
    for name, i in (("jx", 0), ("jy", 1), ("jz", 2)):
        a, b = outs["highest"][i], outs["int8"][i]
        sc = np.abs(a).max() + 1e-30
        print(f"  {name}: rel max|diff| {np.abs(a-b).max()/sc:.3e}", flush=True)


if __name__ == "__main__":
    continuity(order=2)
    continuity(order=1)
    bench_timing()
