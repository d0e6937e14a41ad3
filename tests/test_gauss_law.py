"""Gauss-law preservation: the whole-loop consistency invariant.

Esirkepov deposition + the Yee update imply that div E - rho is a
*constant of motion* (whatever Gauss-law violation the initial condition
has, the evolution must not change it).  This exercises gather, push,
deposit, folding, and the field update together — any stagger or sign slip
anywhere breaks it.
"""
import jax
import jax.numpy as jnp
import numpy as np

from minipic_tpu.core.config import Deck, SpeciesSpec
from minipic_tpu.fields.halo import fold_block_periodic, pad_fields_periodic
from minipic_tpu.fields.tiles import fold_tiles
from minipic_tpu.particles.deposit import deposit_rho_chunk
from minipic_tpu.simulation import Simulation, _tile_origins, tile_local_coords


def _rho_global(sim, deck):
    """Deposit total charge density on the global grid (all species)."""
    tiling = deck.tiling
    g = deck.guard
    rho = jnp.zeros((deck.ny, deck.nx), jnp.float64)
    ox, oy = _tile_origins(tiling, jnp.float64)
    for spec, p in zip(deck.species, sim.state.species):
        xi, eta = tile_local_coords(
            p.x, p.y, (ox, oy), tiling.tile_nx, tiling.tile_ny,
            (deck.nx, deck.ny),
        )
        tiles = deposit_rho_chunk(
            xi, eta, spec.charge * p.w,
            tiling.tile_ny, tiling.tile_nx, g, spec.shape_order,
            deck.dx, deck.dy,
        )
        t4 = tiles.reshape(tiling.tile_rows, tiling.tile_cols,
                           tiling.tile_ny + 2 * g, tiling.tile_nx + 2 * g)
        rho = rho + fold_block_periodic(fold_tiles(t4, tiling.tile_ny, tiling.tile_nx, g), g)
    return rho


def _div_e(f, dx, dy):
    ex, ey = jnp.asarray(f.ex), jnp.asarray(f.ey)
    return (ex - jnp.roll(ex, 1, 1)) / dx + (ey - jnp.roll(ey, 1, 0)) / dy


def test_gauss_law_residual_is_constant_of_motion():
    deck = Deck(
        box_x=8.0, box_y=8.0, nx=32, ny=32, tile_nx=8, tile_ny=8, guard=3,
        species=(
            SpeciesSpec("ele", charge=-1.0, mass=1.0, ppc=4, ux=0.3, uy=0.15, uth=0.05),
            SpeciesSpec("ion", charge=+1.0, mass=10.0, ppc=4, ux=-0.1, uth=0.02),
        ),
        precision="f64",
    )
    sim = Simulation(deck, seed=6)
    resid0 = np.asarray(_div_e(sim.state.fields, deck.dx, deck.dy) - _rho_global(sim, deck))
    sim.step(25)
    resid1 = np.asarray(_div_e(sim.state.fields, deck.dx, deck.dy) - _rho_global(sim, deck))
    scale = max(1e-12, np.abs(np.asarray(_rho_global(sim, deck))).max())
    np.testing.assert_allclose(resid1, resid0, atol=1e-10 * scale)
