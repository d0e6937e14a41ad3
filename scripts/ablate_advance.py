"""Ablation timing of the fused advance kernel's stages.

The MXU dots were measured free (~2 ms of a 200 ms kernel at 1e8
particles) — the kernel is VPU-issue bound.  This script times variants
with individual VPU stages stubbed out (via ppd_kernel's `ablate` hook)
to attribute the elementwise cost.  Physics is meaningless in ablated
variants — timing only.
"""
import argparse
import time

import jax
import jax.numpy as jnp

from minipic_tpu.core.config import Deck, SpeciesSpec
from minipic_tpu.ops.pallas.ppd_kernel import fused_push_deposit
from minipic_tpu.simulation import Simulation, resolve_backend, _tile_origins
from minipic_tpu.fields.halo import pad_fields_periodic
from minipic_tpu.fields.tiles import extract_field_tiles


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(leaves[0].sum())


def timeit(fn, *args, n=3):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=8)
    ap.add_argument("--guard", type=int, default=4)
    ap.add_argument("--particles", type=float, default=1e8)
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--kchunk", type=int, default=4096)
    ap.add_argument("--bodysub", type=int, default=0)
    ap.add_argument("--tpb", type=int, default=0)  # tiles_per_block
    ap.add_argument("--wsynth", action="store_true")  # elide the w stream
    ap.add_argument("--order", type=int, default=1)
    ap.add_argument("--quick", action="store_true",
                    help="full + gather variants only (skip ablations)")
    args = ap.parse_args()

    grid = args.grid
    ppc = max(1, round(args.particles / grid**2))
    deck = Deck(
        box_x=grid / 10.0, box_y=grid / 10.0, nx=grid, ny=grid,
        tile_nx=args.tile, tile_ny=args.tile, guard=args.guard,
        species=(SpeciesSpec("ele", charge=-1.0, mass=1.0, ppc=ppc, uth=0.05,
                             shape_order=args.order),),
        precision="f32", capacity_headroom=1.1, kchunk=args.kchunk,
    )
    sim = Simulation(deck)
    state = sim.state
    sim.state = None
    tiling = deck.tiling
    g = deck.guard
    backend, interpret = resolve_backend(deck)
    assert backend == "pallas"
    p = state.species[0]
    fpad = pad_fields_periodic(state.fields, g)
    ftiles = extract_field_tiles(fpad, tiling.tile_rows, tiling.tile_cols,
                                 tiling.tile_ny, tiling.tile_nx, g)
    counts = jnp.max(
        (jnp.arange(p.capacity, dtype=jnp.int32)[None, :] + 1)
        * (p.w > 0).astype(jnp.int32), axis=1)
    n_live = int((p.w > 0).sum())
    ox, oy = _tile_origins(tiling, deck.dtype)

    def run(ablate, gather="exact"):
        def f(pp, ft):
            return fused_push_deposit(
                pp, ft, counts, (ox, oy), qm=-1.0, q=-1.0, order=args.order,
                tile_ny=tiling.tile_ny, tile_nx=tiling.tile_nx, g=g,
                dt=deck.dt, dx=deck.dx, dy=deck.dy,
                kc=(p.capacity if deck.kchunk <= 0 else deck.kchunk),
                wrap=(deck.nx, deck.ny), grid=(deck.nx, deck.ny),
                gather_precision=gather, ablate=ablate, body_sub=args.bodysub,
                tiles_per_block=args.tpb, w_synth=args.wsynth,
                # uniform-weight gate so MINIPIC_DEPOSIT_MODE=int8 engages
                qw0=-deck.dx * deck.dy / deck.species[0].ppc,
            )
        return timeit(jax.jit(f), p, ftiles)

    print(f"tile={args.tile} g={g} kchunk={args.kchunk} live={n_live:.2e}", flush=True)
    t_full = run("")
    print(f"full             {t_full*1e3:8.1f} ms  ({n_live/t_full:.2e} p/s)", flush=True)
    t = run("", gather="fast")
    print(f"fast-gather      {t*1e3:8.1f} ms   -> HIGHEST 6-pass ~{(t_full-t)*1e3:.1f} ms", flush=True)
    t = run("", gather="f32x3")
    print(f"f32x3-gather     {t*1e3:8.1f} ms   (bf16x3, ~1e-6 force err)", flush=True)
    if args.quick:
        return
    for ab in ("red", "boris", "esirkepov", "prep", "stagger-evals", "qshape",
               "depdot", "evals",
               "red,boris,esirkepov,prep,stagger-evals",
               "red,boris,esirkepov,prep,stagger-evals,depdot",
               "red,boris,esirkepov,prep,stagger-evals,depdot,evals"):
        try:
            t = run(ab)
        except Exception as e:  # noqa: BLE001 — one bad lowering must not
            # cost the rest of the table (docs/R4_BATCH.log: "evals"
            # SIGABRTed Mosaic and dropped the combined rows)
            print(f"no-{ab:52s} FAILED {type(e).__name__}", flush=True)
            continue
        print(f"no-{ab:52s} {t*1e3:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
