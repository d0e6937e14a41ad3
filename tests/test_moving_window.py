"""Moving window (tile-quantum frame advance) — beyond-reference
capability for laser-plasma staging.

The window follows the light front at c, shifting one tile column at a
time: fields roll left (vacuum enters), the trailing tile column of
particles outflows, and a freshly-loaded column enters at the leading
edge at its ABSOLUTE position (particles/species.inject_column).
Design invariant under test: a shift never touches tile-local
coordinates, so the drift watermark/guard budget is unaffected and a
rightward pulse stays put in window coordinates."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minipic_tpu.core.config import Deck, SpeciesSpec
from minipic_tpu.fields.init import pulse_x
from minipic_tpu.simulation import Simulation


def _pulse_deck(**kw):
    base = dict(
        box_x=12.8, box_y=6.4, nx=128, ny=64, tile_nx=8, tile_ny=8,
        guard=2, boundary="absorbing", absorb_width=8,
        moving_window=True, species=(), precision="f32",
    )
    base.update(kw)
    return Deck(**base)


def _bz_centroid_x(f):
    w = np.asarray(f.bz) ** 2
    tot = w.sum()
    if tot == 0:
        return np.nan
    return float((w.sum(axis=0) * np.arange(w.shape[1])).sum() / tot)


def test_pulse_stays_in_window():
    """A rightward cos^2 pulse traverses ~32 cells of lab frame over 90
    steps; in the co-moving window its Bz^2 centroid must stay within a
    couple of cells of where it started (FDTD speed ~0.9998c vs window
    speed c)."""
    deck = _pulse_deck()
    fields = pulse_x(deck.domain, amplitude=0.1, center=6.4, tau=1.5,
                     dtype=jnp.float32)
    sim = Simulation(deck, fields=fields)
    x0 = _bz_centroid_x(sim.state.fields)
    n = 90
    sim.step(n)
    x1 = _bz_centroid_x(sim.state.fields)
    shifts = int(sim.state.window_x0) // deck.tile_nx
    lab_cells = n * deck.dt / deck.dx
    assert shifts == int(lab_cells // deck.tile_nx), (shifts, lab_cells)
    # In-window residual = lab motion minus the quantized window advance
    # (sawtooth bounded by tile_nx); the pulse's LAB position equals the
    # window offset + in-window position to ~a cell (FDTD speed 0.9998c).
    resid = lab_cells - int(sim.state.window_x0)
    assert 0.0 <= resid < deck.tile_nx
    assert abs((x1 - x0) - resid) < 1.0, (x0, x1, resid)


def test_plasma_injection_balances_outflow():
    """Uniform plasma: every shift drops one full tile column and injects
    one full tile column — live count and per-column weight must be
    steady, the injected plasma carries the loader's weight, and a
    charge-neutral quiescent plasma stays quiescent through shifts (a
    charge-imbalanced injector would ring the fields at every shift)."""
    deck = _pulse_deck(
        species=(SpeciesSpec("ele", charge=-1.0, mass=1.0, ppc=4,
                             uth=0.01),
                 SpeciesSpec("ion", charge=+1.0, mass=1836.0, ppc=4,
                             uth=0.0)),
        guard=2,
    )
    sim = Simulation(deck)
    n_start = int(sim.state.species[0].alive_count())
    sim.step(120)  # ~4 shifts at dt/dx ~ 0.354, tile_nx = 8
    assert int(sim.state.window_x0) > 2 * deck.tile_nx
    p = sim.state.species[0]
    n_end = int(p.alive_count())
    # steady to within one column of stragglers (thermal drift out of the
    # absorbing walls)
    col = deck.ny * deck.tile_nx * 4
    assert abs(n_end - n_start) < 0.1 * col, (n_start, n_end)
    # injected column carries w = dxdy/ppc
    w_ref = deck.dx * deck.dy / 4
    t = deck.tiling
    wlast = np.asarray(p.w).reshape(t.tile_rows, t.tile_cols, -1)[:, -1, :]
    live = wlast[wlast > 0]
    np.testing.assert_allclose(live, w_ref, rtol=1e-6)
    # quiescence: the window adds no field energy beyond the absorbing-
    # wall sheath this box has anyway (measured: fe/ke = 0.075 without
    # the window, 0.071 with it — thermal electrons outrun the cold ions
    # into the walls and leave a positive sheath; a charge-imbalanced
    # INJECTOR would instead pump fields at every ~23-step shift).
    from minipic_tpu.core.state import field_energy, kinetic_energy

    fe = float(field_energy(sim.state.fields, deck.dx, deck.dy))
    ke = float(kinetic_energy(sim.state.species[0], 1.0))
    assert fe < 0.1 * ke, (fe, ke)


@pytest.mark.slow
def test_window_checkpoint_roundtrip(tmp_path):
    from minipic_tpu.io.checkpoint import load_checkpoint, save_checkpoint

    deck = _pulse_deck(
        species=(SpeciesSpec("ele", charge=-1.0, mass=1.0, ppc=4,
                             uth=0.01),),
    )
    sim = Simulation(deck)
    sim.step(60)
    pth = str(tmp_path / "ck.npz")
    save_checkpoint(pth, sim.state)
    st = load_checkpoint(pth, deck=deck)
    assert int(st.window_x0) == int(sim.state.window_x0) > 0
    # bit-exact continuation
    sim2 = Simulation(deck)
    sim2.state = st
    sim.step(30)
    sim2.step(30)
    np.testing.assert_array_equal(np.asarray(sim.state.fields.ey),
                                  np.asarray(sim2.state.fields.ey))
    np.testing.assert_array_equal(np.asarray(sim.state.species[0].x),
                                  np.asarray(sim2.state.species[0].x))


def test_moving_window_requires_absorbing():
    with pytest.raises(ValueError):
        Deck(box_x=6.4, box_y=6.4, nx=64, ny=64, tile_nx=8, tile_ny=8,
             moving_window=True, species=()).validate()


@pytest.mark.slow
def test_sharded_window_matches_single_device():
    """Sharded moving window == single-device moving window, exactly
    (f64, XLA path): the cross-shard bucket handoff, the ppermute field
    strip, and the per-global-tile-row-keyed injection RNG must together
    reproduce the one-chip run on any mesh."""
    import jax

    from minipic_tpu.parallel.step import (
        ShardedSimulation, shard_major_permutation)

    deck = _pulse_deck(
        species=(SpeciesSpec("ele", charge=-1.0, mass=1.0, ppc=4,
                             uth=0.01),
                 SpeciesSpec("ion", charge=+1.0, mass=1836.0, ppc=4,
                             uth=0.0)),
        precision="f64",
        # 2x2 mesh / 50 steps: full handoff + injection + wrap-mask
        # coverage at 1/4 the collective count — the 8-device 70-step
        # variant intermittently aborted XLA CPU's in-process collective
        # rendezvous when the host was loaded (infra flake, not physics;
        # the kernels are mesh-shape agnostic and the other parity tests
        # cover 2x4/1x8 meshes).
        mesh_shape=(2, 2),
    )
    ref = Simulation(deck, fields=None, seed=7)
    sh = ShardedSimulation(deck, seed=7, devices=jax.devices()[:4])
    n = 50  # >= 2 shifts at dt/dx ~ 0.354, tile_nx = 8
    ref.step(n)
    sh.step(n)
    assert int(ref.state.window_x0) == int(sh.state.window_x0) > 8
    for a, b in zip(ref.state.fields, sh.state.fields):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-10, atol=1e-12)
    perm = shard_major_permutation(deck, sh.mesh)
    for pref, psh in zip(ref.state.species, sh.state.species):
        wa = np.asarray(pref.w) > 0
        wb = np.asarray(psh.w) > 0
        for name in ("x", "y", "px", "py", "pz", "w"):
            a = np.sort(np.where(wa, np.asarray(getattr(pref, name)), 0.0),
                        axis=1)
            b = np.where(wb, np.asarray(getattr(psh, name)), 0.0)
            b_gid = np.empty_like(b)
            b_gid[perm] = b
            b_gid = np.sort(b_gid, axis=1)
            np.testing.assert_allclose(b_gid, a, rtol=1e-10, atol=1e-12,
                                       err_msg=name)


@pytest.mark.slow
def test_balanced_window_matches_single_device():
    """Striped (BalancedSimulation) moving window == single-device moving
    window, exactly (f64, XLA path).  The balanced window never moves
    bucket data: the gid <-> storage map rotates by the shift count
    (parallel/balanced.py k_shift), so the test's storage->gid unpick
    must apply the same rotation.  This is the driver the window exists
    for — the wakefield's leading-edge concentration is what striping
    de-skews."""
    import jax

    from minipic_tpu.parallel.balanced import (
        BalancedSimulation, balanced_permutation)

    deck = _pulse_deck(
        species=(SpeciesSpec("ele", charge=-1.0, mass=1.0, ppc=4,
                             uth=0.01),
                 SpeciesSpec("ion", charge=+1.0, mass=1836.0, ppc=4,
                             uth=0.0)),
        precision="f64",
    )
    n_dev = 4
    ref = Simulation(deck, fields=None, seed=7)
    bal = BalancedSimulation(deck, seed=7, devices=jax.devices()[:n_dev])
    n = 50  # >= 2 shifts at dt/dx ~ 0.354, tile_nx = 8
    ref.step(n)
    bal.step(n)
    assert int(ref.state.window_x0) == int(bal.state.window_x0) > 8
    for a, b in zip(ref.state.fields, bal.state.fields):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-10, atol=1e-12)
    t = deck.tiling
    perm_static = balanced_permutation(
        t.num_tiles, n_dev, t.tile_rows, t.tile_cols)
    k = int(bal.state.window_x0) // deck.tile_nx
    r, c = perm_static // t.tile_cols, perm_static % t.tile_cols
    perm = r * t.tile_cols + (c - k) % t.tile_cols  # storage -> WINDOW gid
    for pref, pbal in zip(ref.state.species, bal.state.species):
        wa = np.asarray(pref.w) > 0
        wb = np.asarray(pbal.w) > 0
        assert wa.sum() == wb.sum()
        for name in ("x", "y", "px", "py", "pz", "w"):
            a = np.sort(np.where(wa, np.asarray(getattr(pref, name)), 0.0),
                        axis=1)
            b = np.where(wb, np.asarray(getattr(pbal, name)), 0.0)
            b_gid = np.empty_like(b)
            b_gid[perm] = b
            b_gid = np.sort(b_gid, axis=1)
            np.testing.assert_allclose(b_gid, a, rtol=1e-10, atol=1e-12,
                                       err_msg=name)
