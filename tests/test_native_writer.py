"""Native async HDF5 writer: byte-identical output to the h5py path."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from minipic_tpu.core.config import Deck
from minipic_tpu.fields import init as finit
from minipic_tpu.io.hdf5 import load_field, save_fields

native = pytest.importorskip("minipic_tpu.io.native")


@pytest.mark.skipif(not native.available(), reason="no g++/libhdf5 runtime")
@pytest.mark.parametrize("ranks", [1, 4])
def test_native_writer_matches_h5py_writer(tmp_path, ranks):
    deck = Deck(box_x=10.0, box_y=10.0, nx=48, ny=48, tile_nx=8, tile_ny=8, precision="f64")
    f = finit.pulse_x(deck.domain, dtype=jnp.float64)

    ref_dir = str(tmp_path / "ref")
    nat_dir = str(tmp_path / "nat")
    save_fields(f, deck.tiling, deck.guard, 7, ref_dir, ranks=ranks)

    w = native.AsyncSnapshotWriter(deck.tiling, deck.guard, nat_dir, ranks=ranks)
    w.submit(f, 7)
    assert w.flush() == 0
    assert w.written() >= ranks

    kw = dict(nx_global=48, ny_global=48, guard=2, interior_nx=8, interior_ny=8)
    for q in ("Ex", "Ey", "Bz"):
        a = load_field(7, ref_dir, q, **kw)
        b = load_field(7, nat_dir, q, **kw)
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not native.available(), reason="no g++/libhdf5 runtime")
def test_native_writer_is_async(tmp_path):
    """Many submits return fast; flush drains everything to disk."""
    deck = Deck(box_x=10.0, box_y=10.0, nx=64, ny=64, tile_nx=8, tile_ny=8, precision="f64")
    f = finit.pulse_x(deck.domain, dtype=jnp.float64)
    out = str(tmp_path / "many")
    w = native.AsyncSnapshotWriter(deck.tiling, deck.guard, out)
    for s in range(10):
        w.submit(f, s)
    assert w.flush() == 0
    files = [p for p in os.listdir(out) if p.endswith(".h5")]
    assert len(files) == 10


def test_particle_snapshot_roundtrip_h5py(tmp_path):
    """save_particles/load_particles schema + particles_from_snapshot restart."""
    import jax.numpy as jnp
    import numpy as np

    from minipic_tpu.core.config import Deck, SpeciesSpec
    from minipic_tpu.io.checkpoint import particles_from_snapshot
    from minipic_tpu.io.hdf5 import load_particles, save_particles
    from minipic_tpu.simulation import Simulation

    deck = Deck(
        box_x=4.0, box_y=4.0, nx=16, ny=16, tile_nx=8, tile_ny=8,
        species=(SpeciesSpec("e", -1.0, 1.0, ppc=2, ux=0.1),
                 SpeciesSpec("i", +1.0, 100.0, ppc=2)),
        precision="f64",
    )
    sim = Simulation(deck)
    sim.step(2)
    folder = str(tmp_path)
    save_particles(sim.state.species, ["e", "i"], 2, folder)

    data = load_particles(2, folder)
    for i, name in enumerate(("e", "i")):
        p = sim.state.species[i]
        live = np.asarray(p.w).ravel() > 0
        assert len(data[name]["x"]) == int(live.sum())
        np.testing.assert_allclose(
            np.sort(data[name]["x"]), np.sort(np.asarray(p.x).ravel()[live])
        )

    # restart: rebuild buckets and check particle sets match exactly
    sp = particles_from_snapshot(2, folder, deck)
    for i in range(2):
        orig, new = sim.state.species[i], sp[i]
        for comp in ("x", "y", "px", "py", "pz", "w"):
            a = np.asarray(getattr(orig, comp)).ravel()
            b = np.asarray(getattr(new, comp)).ravel()
            wa = np.asarray(orig.w).ravel() > 0
            wb = np.asarray(new.w).ravel() > 0
            np.testing.assert_allclose(np.sort(a[wa]), np.sort(b[wb]))


def test_particle_snapshot_native_writer(tmp_path):
    """The C++ async writer produces the same particle schema."""
    import numpy as np
    import pytest

    from minipic_tpu.io.native import AsyncSnapshotWriter, available

    if not available():
        pytest.skip("native writer unavailable")

    from minipic_tpu.core.config import Deck, SpeciesSpec
    from minipic_tpu.io.hdf5 import load_particles
    from minipic_tpu.simulation import Simulation

    deck = Deck(
        box_x=4.0, box_y=4.0, nx=16, ny=16, tile_nx=8, tile_ny=8,
        species=(SpeciesSpec("e", -1.0, 1.0, ppc=2, uth=0.05),),
        precision="f64",
    )
    sim = Simulation(deck)
    w = AsyncSnapshotWriter(deck.tiling, deck.guard, str(tmp_path))
    w.submit_particles(sim.state.species, ["e"], 0)
    assert w.flush() == 0
    data = load_particles(0, str(tmp_path))
    p = sim.state.species[0]
    live = np.asarray(p.w).ravel() > 0
    assert len(data["e"]["px"]) == int(live.sum())
    np.testing.assert_allclose(
        np.sort(data["e"]["px"]), np.sort(np.asarray(p.px).ravel()[live])
    )
