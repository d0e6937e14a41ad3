"""Drift-triggered re-binning (Deck.rebin_trigger) and the nearest-image
centering that makes sparse re-bins correct at the periodic boundary.

The governing invariant: the re-bin schedule is an *implementation* choice
— physics must be identical (to round-off) whether particles are re-sorted
every step or only when the measured drift approaches the guard slack.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minipic_tpu.core.config import Deck, SpeciesSpec, deck_replace
from minipic_tpu.particles.binning import tile_counts
from minipic_tpu.simulation import Simulation, build_step, max_step_displacement


def _drifting_deck(**kw):
    """A beam drifting in +x at 0.3c — crosses tile and box boundaries."""
    base = dict(
        box_x=6.4, box_y=6.4, nx=64, ny=64, tile_nx=8, tile_ny=8, guard=4,
        species=(
            SpeciesSpec("beam", charge=-1.0, mass=1.0, ppc=4, ux=0.33, uth=0.01),
            SpeciesSpec("bg", charge=+1.0, mass=1e9, ppc=4),
        ),
        dt_factor=0.5,
    )
    base.update(kw)
    return Deck(**base)


def test_schedule_invariance_across_periodic_wrap():
    """Fields after N steps match between every-step re-binning and
    drift-triggered re-binning, including particles wrapping the box.
    Catches the stale-bucket wrap bug: without nearest-image centering a
    wrapped particle in a boundary tile's bucket sits +-nx outside its
    shape window and silently deposits nothing."""
    n = 60  # beam moves ~0.33*0.35*60 ~ 7 cells: crosses tiles and the box edge
    d_every = _drifting_deck(rebin_trigger="interval", rebin_interval=1)
    d_drift = _drifting_deck(rebin_trigger="drift")
    s_every, s_drift = Simulation(d_every), Simulation(d_drift)
    step_e = jax.jit(build_step(d_every))
    step_d = jax.jit(build_step(d_drift))
    se, sd = s_every.state, s_drift.state
    n_rebins = 0
    for _ in range(n):
        se, de = step_e(se)
        sd, dd = step_d(sd)
        assert int(de.overflow) == 0 and int(dd.overflow) == 0
        n_rebins += int(float(sd.drift) == 0.0)
    assert n_rebins < n / 2, "drift trigger should re-bin far less than every step"
    ez_e = np.asarray(se.fields.ez)
    ez_d = np.asarray(sd.fields.ez)
    scale = max(np.abs(ez_e).max(), 1e-12)
    assert np.abs(ez_e - ez_d).max() / scale < 5e-4, (
        np.abs(ez_e - ez_d).max() / scale
    )
    # Buckets themselves agree after forcing both to re-bin (same census).
    ce = np.asarray(tile_counts(se.species[0]))
    cd = np.asarray(tile_counts(sd.species[0]))
    assert ce.sum() == cd.sum()


def test_drift_accumulates_and_resets():
    deck = _drifting_deck(rebin_trigger="drift")
    sim = Simulation(deck)
    per_step = 0.33 / math.sqrt(1 + 0.33**2) * deck.dt / deck.dx  # beam drift/step
    sim.step(1)
    d1 = float(sim.state.drift)
    assert d1 == pytest.approx(per_step, rel=0.2)  # uth adds a little
    thresh = deck.drift_threshold()
    steps_to_trigger = math.ceil(thresh / d1)
    sim.step(steps_to_trigger + 1)
    # Somewhere in there a re-bin fired and the budget restarted.
    assert float(sim.state.drift) < thresh


def test_displacement_measures_fastest_alive_particle():
    deck = _drifting_deck()
    sim = Simulation(deck)
    p = sim.state.species[0]
    # A dead slot with huge momentum must not count.
    p = p._replace(px=p.px.at[0, 0].set(1e3), w=p.w.at[0, 0].set(0.0))
    disp = float(max_step_displacement([p], deck.dt, deck.dx, deck.dy))
    v = 0.33 / math.sqrt(1 + 0.33**2)
    assert disp < 1.5 * (v + 0.05) * deck.dt / deck.dx
    # Make it alive: it dominates (v ~ c).
    p = p._replace(w=p.w.at[0, 0].set(1.0))
    disp = float(max_step_displacement([p], deck.dt, deck.dx, deck.dy))
    assert disp == pytest.approx(deck.dt / deck.dx, rel=1e-3)


def test_validate_rejects_no_drift_budget():
    deck = _drifting_deck(guard=2, rebin_trigger="drift", species=(
        SpeciesSpec("e", charge=-1.0, mass=1.0, ppc=2, shape_order=2),
    ), dt_factor=0.9)
    with pytest.raises(ValueError, match="drift budget"):
        deck.validate()
