"""Round-3 batch 2: split kc sweep with DEFAULT rank, order-2 kchunk sweep,
and the real mover census that sizes the route sort."""
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
    from minipic_tpu.core.config import Deck, SpeciesSpec
    from minipic_tpu.simulation import Simulation, build_step
    from minipic_tpu.ops.pallas.rebin_kernels import split_buckets
    from minipic_tpu.particles.binning import rebin_flat

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
    p0 = state.species[0]
    print(f"cap={p0.capacity} tiles={p0.num_tiles} auto_mover={deck.mover_cap(p0.capacity)}", flush=True)

    # --- 1. split kc sweep (DEFAULT rank everywhere now) ---
    for kc in (256, 512, 896):
        if p0.capacity % kc:
            print(f"split kc={kc}: skipped (cap % kc)")
            continue
        def stage_split(pp, kc=kc):
            return split_buckets(
                pp, tile_rows=tiling.tile_rows, tile_cols=tiling.tile_cols,
                tile_ny=tiling.tile_ny, tile_nx=tiling.tile_nx,
                b_cap=4096, kc=kc, wsplit=True)
        try:
            t = timeit(jax.jit(stage_split), p0)
            print(f"split wsplit=1 kc={kc:4d} {t*1e3:9.1f} ms", flush=True)
        except Exception as e:
            print(f"split kc={kc} FAILED: {str(e)[:150]}", flush=True)

    # --- 2. whole-step at kchunk settings (order 2) ---
    import dataclasses
    for kch in (0, 13440, 6720):
        d2 = dataclasses.replace(deck, kchunk=kch)
        try:
            step = jax.jit(build_step(d2))
            t = timeit(lambda s: step(s)[0], state)
            print(f"step kchunk={kch:6d} {t*1e3:9.1f} ms", flush=True)
        except Exception as e:
            print(f"step kchunk={kch} FAILED: {str(e)[:150]}", flush=True)

    # --- 3. mover census over a real drift cycle ---
    step = jax.jit(build_step(deck))

    @jax.jit
    def mover_census(pp):
        t_total = pp.num_tiles
        tl = jnp.arange(t_total)
        mycol = (tl % tiling.tile_cols).astype(jnp.float32)[:, None]
        myrow = (tl // tiling.tile_cols).astype(jnp.float32)[:, None]
        col = jnp.floor(pp.x / tiling.tile_nx)
        row = jnp.floor(pp.y / tiling.tile_ny)
        mov = (pp.w > 0) & ((col != mycol) | (row != myrow))
        per_tile = jnp.sum(mov.astype(jnp.int32), axis=1)
        return per_tile.max(), per_tile.mean()

    s = state
    for i in range(40):
        s, diag = step(s)
        if i % 2 == 1:
            mx, mn = mover_census(s.species[0])
            print(f"step {i+1:3d} movers/tile max={int(mx):5d} mean={float(mn):7.1f} drift={float(s.drift):.2f}", flush=True)

    # --- 4. route timing at candidate mover caps on REAL movers ---
    mc_full = 3840
    p1, movers, wm, _ = jax.jit(
        lambda pp: split_buckets(
            pp, tile_rows=tiling.tile_rows, tile_cols=tiling.tile_cols,
            tile_ny=tiling.tile_ny, tile_nx=tiling.tile_nx,
            b_cap=mc_full, wsplit=True, force=True)
    )(s.species[0])
    n_mov = jnp.sum((movers.w > 0).astype(jnp.int32), axis=1)
    print(f"at split: movers/tile max={int(n_mov.max())} mean={float(n_mov.mean()):.0f}", flush=True)
    for mc in (3840, 2560, 1536):
        def stage_route(mv, mc=mc):
            flat = jax.tree_util.tree_map(
                lambda a: a[:, :mc].reshape(p0.num_tiles * mc), mv)
            return rebin_flat(
                flat, tile_rows=tiling.tile_rows, tile_cols=tiling.tile_cols,
                tile_nx=tiling.tile_nx, tile_ny=tiling.tile_ny, capacity=mc)
        t = timeit(jax.jit(stage_route), movers)
        print(f"route mc={mc:5d} {t*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
