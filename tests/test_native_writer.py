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
