"""IO: HDF5 snapshot schema parity, params.txt round trip, checkpoint/resume.

The strongest compatibility proof: the *reference's own* post-processor
(/root/reference/File_reader.py) must reassemble our snapshot files
unmodified (skipped gracefully if the reference tree is absent).
"""
import importlib.util
import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

from minipic_tpu.core.config import Deck, SpeciesSpec
from minipic_tpu.core.geometry import Domain
from minipic_tpu.fields import init as finit
from minipic_tpu.io.checkpoint import (
    fields_from_snapshot,
    load_checkpoint,
    save_checkpoint,
)
from minipic_tpu.io.hdf5 import available_steps, load_field, save_fields
from minipic_tpu.io.params import read_params, write_params
from minipic_tpu.simulation import Simulation

DECK = Deck(box_x=10.0, box_y=10.0, nx=48, ny=48, tile_nx=8, tile_ny=8, precision="f64")


def _snapshot(tmp_path, ranks=1):
    f = finit.pulse_x(DECK.domain, dtype=jnp.float64)
    folder = str(tmp_path / "Fields")
    save_fields(f, DECK.tiling, DECK.guard, step=0, folder=folder, ranks=ranks)
    return f, folder


@pytest.mark.parametrize("ranks", [1, 4])
def test_snapshot_roundtrip_own_reader(tmp_path, ranks):
    f, folder = _snapshot(tmp_path, ranks)
    kw = dict(nx_global=48, ny_global=48, guard=2, interior_nx=8, interior_ny=8)
    for name, q in (("ey", "Ey"), ("bz", "Bz"), ("ex", "Ex")):
        got = load_field(0, folder, q, **kw)
        np.testing.assert_array_equal(got, np.asarray(getattr(f, name)))
    assert available_steps(folder) == [0]


def test_snapshot_schema_details(tmp_path):
    import h5py

    _, folder = _snapshot(tmp_path)
    with h5py.File(os.path.join(folder, "fields_rank_0_step_0.h5")) as h:
        keys = list(h.keys())
        assert all(k.startswith("Tile_") for k in keys)
        assert len(keys) == DECK.tiling.num_tiles
        g = h["Tile_0"]
        d = g["fields"]
        # Reference schema: compound 6xf8 named Ex..Bz, guard cells included,
        # int attrs (HDF5_output.cpp:16-67; verified shape (interior+2g)^2).
        assert d.shape == (8 + 4, 8 + 4)
        assert set(d.dtype.names) == {"Ex", "Ey", "Ez", "Bx", "By", "Bz"}
        assert all(d.dtype[n] == np.float64 for n in d.dtype.names)
        for attr in ("tileRow", "tileCol", "currentRank"):
            assert attr in g.attrs


def test_reference_file_reader_loads_our_files(tmp_path):
    """Import the reference's File_reader.py and reassemble our snapshot."""
    ref = "/root/reference/File_reader.py"
    if not os.path.exists(ref):
        pytest.skip("reference tree not available")
    os.environ.setdefault("MPLBACKEND", "Agg")
    spec = importlib.util.spec_from_file_location("ref_file_reader", ref)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    f, folder = _snapshot(tmp_path, ranks=4)
    got = mod.load_field(
        step=0, folder=folder, quantity="Bz", box_x=10.0, box_y=10.0,
        nx_global=48, ny_global=48, guard=2, interior_nx=8, interior_ny=8,
    )
    np.testing.assert_array_equal(got, np.asarray(f.bz))

    # and our params.txt through its read_params
    write_params(DECK, folder)
    p = mod.read_params(os.path.join(folder, "params.txt"))
    assert p["nx_global"] == 48 and p["guard"] == 2
    np.testing.assert_allclose(p["dt"], DECK.dt)


def test_params_roundtrip(tmp_path):
    path = write_params(DECK, str(tmp_path))
    p = read_params(path)
    assert p["interior_nx"] == 8
    assert p["total_steps"] == DECK.total_steps
    np.testing.assert_allclose(p["dt"], DECK.dt)


def test_checkpoint_resume_is_exact(tmp_path):
    deck = Deck(
        box_x=4.0, box_y=4.0, nx=16, ny=16, tile_nx=8, tile_ny=8,
        species=(SpeciesSpec("e", -1.0, 1.0, ppc=2, ux=0.1),
                 SpeciesSpec("i", +1.0, 100.0, ppc=2)),
        precision="f64",
    )
    sim = Simulation(deck, fields=finit.pulse_x(deck.domain, dtype=jnp.float64))
    sim.step(3)
    ckpt = str(tmp_path / "state.npz")
    save_checkpoint(ckpt, sim.state)

    sim.step(4)
    want = sim.state

    sim2 = Simulation(deck)
    sim2.state = load_checkpoint(ckpt)
    assert int(sim2.state.step) == 3
    sim2.step(4)
    for a, b in zip(want.fields, sim2.state.fields):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for pa, pb in zip(want.species, sim2.state.species):
        for a, b in zip(pa, pb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_field_restart_from_hdf5_snapshot(tmp_path):
    f, folder = _snapshot(tmp_path)
    f2 = fields_from_snapshot(0, folder, DECK)
    for a, b in zip(f, f2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
