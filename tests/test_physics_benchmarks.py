"""Physics acceptance runs for the BASELINE configs beyond two-stream:
Weibel growth, Landau-damped Langmuir oscillation with TSC shapes, and the
laser-into-plasma smoke test with absorbing boundaries.  Scaled-down grids;
marked slow where the run is long."""
import dataclasses
import math

import jax.numpy as jnp
import numpy as np
import pytest

from minipic_tpu.core.config import Deck, SpeciesSpec
from minipic_tpu.diag.analysis import (
    field_spectrum_x,
    growth_rate,
    two_stream_growth_theory,
)
from minipic_tpu.simulation import Simulation


@pytest.mark.slow
def test_two_stream_growth_rate_vs_theory():
    """QUANTITATIVE kinetic validation: the seeded two-stream mode grows at
    the exact linear-theory rate (the quartic dispersion relation in
    two_stream_growth_theory), not just 'grows by 100x'.

    Cold symmetric beams at +-u0, mode seeded near peak growth
    (k v0 = 0.866 wb -> gamma ~ wb/2).  The fit window [3e-4, 3e-2] in
    mode-power units skips the early non-eigenmode transient (the seed
    projects onto all four dispersion roots; the oscillatory pair
    contaminates the slope until the growing root dominates, ~3/gamma) and
    stops before trapping saturation (~2.4).  Calibrated ratio 1.01 +- 0.05
    across windows; asserted to 15%."""
    u0 = 0.1
    v0 = u0 / math.sqrt(1 + u0 * u0)
    wb = math.sqrt(0.5)  # each beam loads density 1/2
    k = 0.866 * wb / v0
    lx = 2 * math.pi / k
    deck = Deck(
        box_x=lx, box_y=lx / 8, nx=64, ny=8, tile_nx=8, tile_ny=8,
        species=(
            SpeciesSpec("right", charge=-1.0, mass=1.0, ppc=16, ux=u0, uth=0.0025),
            SpeciesSpec("left", charge=-1.0, mass=1.0, ppc=16, ux=-u0, uth=0.0025),
            SpeciesSpec("ion", charge=+1.0, mass=1e9, ppc=16),
        ),
        precision="f64",
    )
    sim = Simulation(deck, seed=7)
    sp = list(sim.state.species)
    for i in (0, 1):
        p = sp[i]
        sp[i] = p._replace(w=p.w * 0.5, px=p.px + 1e-4 * jnp.sin(k * p.x * deck.dx))
    sim.state = sim.state._replace(species=tuple(sp))

    gtheory = two_stream_growth_theory(k, v0, wb)
    times, p1 = [], []
    for i in range(280):
        sim.step(10)
        spec = field_spectrum_x(np.asarray(sim.state.fields.ex))
        times.append((i + 1) * 10 * deck.dt)
        p1.append(spec[1])
    p1 = np.asarray(p1)
    times = np.asarray(times)
    w = np.where((p1 > 3e-4) & (p1 < 3e-2))[0]
    assert len(w) > 20, "growth window never reached — instability failed"
    gam = growth_rate(times[w], p1[w])
    assert abs(gam - gtheory) / gtheory < 0.15, (gam, gtheory, gam / gtheory)


@pytest.mark.slow
def test_weibel_magnetic_energy_grows():
    """Counter-streaming (±uz) beams drive the Weibel instability: in-plane
    B grows exponentially from noise at gamma ~ beta0 * wp scale."""
    uz = 0.6
    deck = Deck(
        box_x=6.4, box_y=6.4, nx=32, ny=32, tile_nx=8, tile_ny=8,
        species=(
            SpeciesSpec("up", charge=-1.0, mass=1.0, ppc=8, uz=uz, uth=0.01),
            SpeciesSpec("down", charge=-1.0, mass=1.0, ppc=8, uz=-uz, uth=0.01),
            SpeciesSpec("ion", charge=+1.0, mass=1e9, ppc=8),
        ),
        precision="f64",
    )
    sim = Simulation(deck, seed=11)
    sp = list(sim.state.species)
    for i in (0, 1):
        sp[i] = sp[i]._replace(w=sp[i].w * 0.5)
    sim.state = sim.state._replace(species=tuple(sp))

    def b_energy():
        f = sim.state.fields
        return float(
            0.5 * (jnp.sum(f.bx**2) + jnp.sum(f.by**2)) * deck.dx * deck.dy
        )

    times, eb = [], []
    tot0 = None
    for i in range(40):
        d = sim.step(5)
        times.append((i + 1) * 5 * deck.dt)
        eb.append(b_energy())
        tot = float(d.field_energy) + float(d.kinetic_energy.sum())
        if tot0 is None:
            tot0 = tot
        assert int(d.overflow) == 0
    eb = np.asarray(eb)
    assert eb[-5:].min() > 100 * eb[0], (eb[0], eb[-1])
    # Fitted linear-phase rate vs the beta0*wp scale.  The cold-beam
    # maximum is ~beta0/sqrt(gamma0) = 0.93 beta0 at uz=0.6; growth from
    # broadband noise weights the whole unstable k-band, measured at
    # 0.66 +- 0.01 beta0 across seeds (11, 12, 13) — asserted to a
    # calibrated 0.5-0.85 window, not the old 0.3-2.5 order-of-magnitude.
    i0, i1 = 3, int(np.argmax(eb)) or len(eb)
    gam = growth_rate(times[i0:i1], eb[i0:i1])
    beta0 = uz / math.sqrt(1 + uz * uz)
    assert 0.5 * beta0 < gam < 0.85 * beta0, (gam, beta0, gam / beta0)
    # Energy conserved through the growth phase.
    assert abs(tot - tot0) / tot0 < 5e-3


@pytest.mark.slow
def test_landau_langmuir_oscillation_tsc():
    """Seeded Langmuir wave at k*lambda_D = 0.35 with quadratic shapes:
    the mode oscillates near w_p, damps (Landau), and total energy is
    conserved — BASELINE config 3's scheme-quality diagnostic."""
    uth = 0.05
    k = 0.35 / uth
    lx = 2 * math.pi / k
    deck = Deck(
        box_x=lx, box_y=lx / 8, nx=64, ny=8, tile_nx=8, tile_ny=8, guard=3,
        species=(
            SpeciesSpec("ele", charge=-1.0, mass=1.0, ppc=8, uth=uth, shape_order=2),
            SpeciesSpec("ion", charge=+1.0, mass=1e9, ppc=8, shape_order=2),
        ),
        precision="f64",
    )
    sim = Simulation(deck, seed=2)
    sp = list(sim.state.species)
    p = sp[0]
    sp[0] = p._replace(px=p.px + 0.2 * uth * jnp.sin(k * p.x * deck.dx))
    sim.state = sim.state._replace(species=tuple(sp))

    # gamma_L ~ 0.034 wp at k lambda_D = 0.35 -> need t of tens of 1/wp.
    # dt ~ 0.005, so sample 3000 steps (t ~ 15).
    fe, tot, times = [], [], []
    for i in range(120):
        d = sim.step(25)
        times.append((i + 1) * 25 * deck.dt)
        fe.append(float(d.field_energy))
        tot.append(float(d.field_energy) + float(d.kinetic_energy.sum()))
    fe = np.asarray(fe)
    times = np.asarray(times)
    # Damping: late-window peak well below the early-window peak
    # (expect ~ e^{-2 gamma_L * 10} ~ 0.5 between the windows).
    early = fe[times < 5.0].max()
    late = fe[times > 10.0].max()
    assert late < 0.75 * early, (early, late)
    assert abs(tot[-1] - tot[0]) / tot[0] < 2e-3


def test_laser_plasma_smoke():
    """Laser enters an underdense slab with absorbing walls: runs stably,
    loses energy only through the damping layer, no overflow (BASELINE
    config 4 at reduced scale)."""
    from minipic_tpu.decks.standard import laser_plasma

    case = laser_plasma(nx=64, ny=64, ppc=2)
    deck = dataclasses.replace(case.deck, precision="f64", absorb_width=10)
    sim = Simulation(deck, fields=case.init_fields(deck), seed=3)
    e0 = None
    for i in range(10):
        d = sim.step(2)
        tot = float(d.field_energy) + float(d.kinetic_energy.sum())
        assert np.isfinite(tot)
        assert int(d.overflow) == 0
        if e0 is None:
            e0 = tot
    assert tot <= e0 * 1.01  # absorbing run must not gain energy
