"""On-TPU correctness spot-check for the fused advance kernel.

Runs a small two-stream deck on the real chip and checks, per the verify
recipe (.claude/skills/verify):
  1. Esirkepov continuity: max |(rho1 - rho0)/dt + div_Yee J| ~ round-off
     (exact charge conservation, computed against the kernel's J output).
  2. Pallas step == XLA step (same deck, use_pallas on/off) to f32 tolerance.
  3. Vacuum field energy constancy over 400 steps.
"""
import numpy as np
import jax
import jax.numpy as jnp

from minipic_tpu.core.config import Deck, SpeciesSpec, deck_replace
from minipic_tpu.simulation import Simulation, build_step
from minipic_tpu.core.state import field_energy


def two_stream_deck(**kw):
    # tile 8 / guard 4 -> nyg=16: exercises the fused single-dot gather
    # (word-split exact path) on the real MXU.
    base = dict(
        box_x=12.8, box_y=12.8, nx=128, ny=128, tile_nx=8, tile_ny=8,
        guard=4, rebin_interval=8, kchunk=512,
        species=(
            SpeciesSpec("right", charge=-1.0, mass=1.0, ppc=16, ux=0.2, uth=0.02),
            SpeciesSpec("left", charge=-1.0, mass=1.0, ppc=16, ux=-0.2, uth=0.02),
        ),
    )
    base.update(kw)
    return Deck(**base)


def main():
    print("backend:", jax.default_backend())

    # --- continuity residual through a full step's J ---
    from minipic_tpu.particles.deposit import deposit_rho_chunk
    from minipic_tpu.fields.halo import pad_fields_periodic
    from minipic_tpu.fields.tiles import extract_field_tiles, fold_tiles
    from minipic_tpu.fields.halo import fold_block_periodic
    from minipic_tpu.simulation import (
        advance_species_tiles, _tile_origins, resolve_backend, tile_local_coords,
    )

    deck = two_stream_deck()
    sim = Simulation(deck)
    tiling = deck.tiling
    g = deck.guard
    backend, interpret = resolve_backend(deck)
    print("advance backend:", backend)

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
                                  tiling.tile_ny, tiling.tile_nx, g, spec.shape_order,
                                  deck.dx, deck.dy)
            tr = r.reshape(tiling.tile_rows, tiling.tile_cols,
                           tiling.tile_ny + 2 * g, tiling.tile_nx + 2 * g)
            return fold_block_periodic(fold_tiles(tr, tiling.tile_ny, tiling.tile_nx, g), g)

        res_max = 0.0
        scale = 0.0
        for spec, p in zip(deck.species, state.species):
            rho0 = rho_of(p)
            pnew, (jx, jy, jz) = advance_species_tiles(
                p, ftiles, qm=spec.charge / spec.mass, q=spec.charge,
                order=spec.shape_order, tile_ny=tiling.tile_ny,
                tile_nx=tiling.tile_nx, origins=(ox, oy), g=g,
                dt=deck.dt, dx=deck.dx, dy=deck.dy, kchunk=deck.kchunk,
                backend=backend, interpret=interpret,
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
            res_max = jnp.maximum(res_max, jnp.max(jnp.abs(res)))
            scale = jnp.maximum(scale, jnp.max(jnp.abs(rho0)) / deck.dt)
        return res_max, scale

    rm, sc = residual(sim.state)
    print(f"continuity: max residual {float(rm):.3e}  (scale {float(sc):.3e}, "
          f"rel {float(rm / sc):.3e})")
    assert float(rm / sc) < 2e-6, "charge conservation broken"

    # --- pallas step vs XLA step ---
    d_p = two_stream_deck()
    d_x = deck_replace(d_p, use_pallas="off")
    s_p, s_x = Simulation(d_p), Simulation(d_x)
    step_p, step_x = jax.jit(build_step(d_p)), jax.jit(build_step(d_x))
    sp, sx = s_p.state, s_x.state
    for _ in range(20):
        sp, _ = step_p(sp)
        sx, _ = step_x(sx)
    ex_p, ex_x = np.asarray(sp.fields.ex), np.asarray(sx.fields.ex)
    scale = max(1e-30, np.abs(ex_x).max())
    diff = np.abs(ex_p - ex_x).max() / scale
    print(f"pallas vs XLA after 20 steps: rel ex diff {diff:.3e}")
    assert diff < 5e-4, "pallas/XLA divergence"

    # wrapped positions in range
    for p in sp.species:
        x = np.asarray(p.x)
        assert x.min() >= 0 and x.max() < d_p.nx, (x.min(), x.max())
    print("positions wrapped in range OK")

    # --- vacuum energy constancy ---
    from minipic_tpu.fields import init as finit
    vdeck = Deck(box_x=25.6, box_y=25.6, nx=256, ny=256, tile_nx=16, tile_ny=16,
                 guard=2, species=())
    f = finit.pulse_x(vdeck.domain)
    vsim = Simulation(vdeck, fields=f)
    e0 = float(field_energy(vsim.state.fields, vdeck.dx, vdeck.dy))
    vstep = jax.jit(build_step(vdeck))
    s = vsim.state
    for _ in range(400):
        s, _ = vstep(s)
    e1 = float(field_energy(s.fields, vdeck.dx, vdeck.dy))
    print(f"vacuum energy drift over 400 steps: {abs(e1 - e0) / e0:.3e}")
    assert abs(e1 - e0) / e0 < 1e-5
    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
