"""Load-balance machinery: census, adaptive capacity, blob workloads."""
import jax.numpy as jnp
import numpy as np

from minipic_tpu.core.config import Deck, SpeciesSpec
from minipic_tpu.core.state import ParticleState
from minipic_tpu.parallel.balance import CapacityManager, census, with_capacity
from minipic_tpu.simulation import Simulation


def _state_with_counts(counts, cap):
    t = len(counts)
    p = ParticleState.empty(t, cap, jnp.float64)
    w = np.zeros((t, cap))
    for i, c in enumerate(counts):
        w[i, :c] = 1.0
    return p._replace(w=jnp.asarray(w))


def test_census_stats():
    p = _state_with_counts([10, 40, 20, 10], cap=64)
    s = census(p)
    assert s.total == 80 and s.max_tile == 40 and s.capacity == 64
    np.testing.assert_allclose(s.occupancy, 40 / 64)
    np.testing.assert_allclose(s.imbalance, 40 / 20.0)


def test_capacity_manager_grows_on_overflow_and_pressure():
    mgr = CapacityManager(high_water=0.9, growth=1.5)
    p = _state_with_counts([60, 10], cap=64)  # occupancy 0.94 > 0.9
    assert mgr.plan(census(p), overflow=0) >= 96
    p2 = _state_with_counts([10, 10], cap=64)
    assert mgr.plan(census(p2), overflow=0) is None
    assert mgr.plan(census(p2), overflow=5) is not None


def test_with_capacity_grow_preserves_particles():
    p = _state_with_counts([3, 2], cap=8)
    p = p._replace(x=p.x.at[0, :3].set(jnp.asarray([1.0, 2.0, 3.0])))
    p2 = with_capacity(p, 16)
    assert p2.capacity == 16
    assert census(p2).total == 5
    np.testing.assert_array_equal(np.asarray(p2.x[0, :3]), [1, 2, 3])


def test_auto_capacity_growth_on_converging_flow():
    """Two opposing beams converge on the box center: the center tiles'
    occupancy rises; Simulation.run must grow capacity instead of dropping
    particles (the reference's migration scenario, solved by capacity)."""
    deck = Deck(
        box_x=8.0, box_y=4.0, nx=32, ny=16, tile_nx=8, tile_ny=8,
        species=(
            SpeciesSpec("r", charge=-1.0, mass=1e12, ppc=4, ux=0.9),
            SpeciesSpec("l", charge=-1.0, mass=1e12, ppc=4, ux=-0.9),
        ),
        precision="f64",
        # start with zero headroom so convergence must trigger growth
        capacity_headroom=1.0, kchunk=64,
    )
    sim = Simulation(deck)
    # Position beams to converge on x in [2, 6): right beam from [0,4),
    # left beam from [4, 8) -> tile column 1 and 2 double up.
    sp = list(sim.state.species)
    sp[0] = sp[0]._replace(x=sp[0].x * 0.5)
    sp[1] = sp[1]._replace(x=4.0 + sp[1].x * 0.5)
    # re-bin to the new positions (counts now 2x in half the tiles ->
    # immediate overflow unless capacity grows)
    from minipic_tpu.particles.binning import rebin

    n_before = 0
    grew = False
    for i, p in enumerate(sp):
        p, ov = rebin(p, deck.tiling)
        lost = int(ov)
        if lost:
            sim.state = sim.state._replace(species=tuple(sp))
            grew = sim.ensure_capacity(lost) or grew
        sp[i] = p
        n_before += int(p.alive_count())
    sim.state = sim.state._replace(species=tuple(sp))
    sim.ensure_capacity(1)  # force a growth check with pressure
    assert sim.state.species[0].capacity > 64 or grew


def test_with_capacity_shrink_compacts_and_preserves():
    """Shrink re-bins the pool into smaller buckets losslessly."""
    deck = Deck(box_x=4.0, box_y=4.0, nx=16, ny=16, tile_nx=8, tile_ny=8,
                precision="f64")
    t = deck.tiling  # 2x2 tiles
    p = ParticleState.empty(4, 32, jnp.float64)
    # 3 particles in tile 0, 5 in tile 3, positions inside the right tiles
    xs = np.zeros((4, 32)); ys = np.zeros((4, 32)); w = np.zeros((4, 32))
    xs[0, :3] = [1.0, 2.0, 3.0]; ys[0, :3] = 1.0; w[0, :3] = 1.0
    xs[3, :5] = 9.0 + np.arange(5) * 0.5; ys[3, :5] = 9.0; w[3, :5] = 2.0
    p = p._replace(x=jnp.asarray(xs), y=jnp.asarray(ys), w=jnp.asarray(w))

    p2 = with_capacity(p, 8, t)
    assert p2.capacity == 8
    assert census(p2).total == 8
    np.testing.assert_allclose(np.asarray(p2.w).sum(), 13.0)  # 3*1 + 5*2
    # too-small shrink must refuse, not drop
    import pytest
    with pytest.raises(ValueError):
        with_capacity(p, 4, t)
    with pytest.raises(ValueError):
        with_capacity(p, 8)  # no tiling


def test_capacity_manager_shrinks_after_calm_spell():
    mgr = CapacityManager(low_water=0.5, shrink_patience=3, shrink_headroom=1.5)
    hot = _state_with_counts([60, 10], cap=64)
    calm = _state_with_counts([10, 10], cap=256)
    # hot spot: grows
    assert mgr.plan(census(hot), 0) is not None
    # three calm checks -> shrink to ~max_tile * 1.5
    assert mgr.plan(census(calm), 0) is None
    assert mgr.plan(census(calm), 0) is None
    got = mgr.plan(census(calm), 0)
    assert got is not None and got < 256 and got >= 15
    # counter reset after the shrink fires
    assert mgr.plan(census(calm), 0) is None


def test_simulation_capacity_grows_then_shrinks():
    """A transient hot spot inflates capacity; after it disperses the
    manager shrinks the buckets back (VERDICT round-1 item 7)."""
    deck = Deck(
        box_x=8.0, box_y=8.0, nx=16, ny=16, tile_nx=8, tile_ny=8,
        species=(SpeciesSpec("e", charge=-1.0, mass=1e12, ppc=2, uth=0.0),),
        precision="f64", capacity_headroom=1.0, kchunk=8,
    )
    sim = Simulation(deck)
    cap0 = sim.state.species[0].capacity
    p = sim.state.species[0]
    # herd every particle into tile 0's cells (hot spot), re-bin with growth
    from minipic_tpu.particles.binning import rebin

    crowded = p._replace(x=jnp.mod(p.x, 8.0), y=jnp.mod(p.y, 8.0))
    _, ov = rebin(crowded, deck.tiling)
    sim.state = sim.state._replace(species=(crowded,))
    sim.ensure_capacity(int(ov))
    # rebin at the grown capacity so the hot tile actually holds them
    p_grown, ov2 = rebin(sim.state.species[0], deck.tiling)
    assert int(ov2) == 0
    cap_hot = p_grown.capacity
    assert cap_hot > cap0
    # disperse back to uniform; calm checks should shrink
    disp = p_grown._replace(
        x=jnp.where(p_grown.w > 0, jnp.mod(p_grown.x * 7.7, 16.0), p_grown.x),
        y=jnp.where(p_grown.w > 0, jnp.mod(p_grown.y * 7.7, 16.0), p_grown.y),
    )
    disp, ov3 = rebin(disp, deck.tiling)
    assert int(ov3) == 0
    sim.state = sim.state._replace(species=(disp,))
    n_live = int(disp.alive_count())
    for _ in range(sim._capmgrs[0].shrink_patience if sim._capmgrs else 4):
        shrunk = sim.ensure_capacity(0)
    assert shrunk and sim.state.species[0].capacity < cap_hot
    assert int(sim.state.species[0].alive_count()) == n_live


def test_mover_cap_auto_derivation():
    """Auto mover sizing from deck kinematics lands near the hand-tuned
    bench value (4096 at uth=0.05, rebin 8, tile 16, ~107k cap)."""
    deck = Deck(
        box_x=51.2, box_y=51.2, nx=512, ny=512, tile_nx=16, tile_ny=16,
        guard=4, rebin_interval=8, capacity_headroom=1.1,
        species=(SpeciesSpec("e", charge=-1.0, mass=1.0, ppc=381, uth=0.05),),
    )
    cap = deck.capacity()
    mc = deck.mover_cap(cap)
    assert mc % 128 == 0
    assert 2048 <= mc <= 16384  # same ballpark as the tuned 4096
    # explicit knob still wins
    import dataclasses
    d2 = dataclasses.replace(deck, mover_capacity=4096)
    assert d2.mover_cap(cap) == 4096
    # cold stationary species: floor applies, no crash
    d3 = dataclasses.replace(
        deck, species=(SpeciesSpec("i", charge=1.0, mass=1836.0, ppc=381),)
    )
    assert d3.mover_cap(cap) >= 512
