"""Post-processing figures (C14 visualization half): all four artifact
types render headless from a run folder, matching the reference's
File_reader.py deliverables (:125-204, :210-283, :290-381)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

pytest.importorskip("matplotlib")

from minipic_tpu.core.config import Deck
from minipic_tpu.fields import init as finit
from minipic_tpu.io.hdf5 import save_fields
from minipic_tpu.io.params import write_params

DECK = Deck(box_x=10.0, box_y=10.0, nx=48, ny=48, tile_nx=8, tile_ny=8, precision="f64")


@pytest.fixture(scope="module")
def run_folder(tmp_path_factory):
    """Tiny fake run: the pulse snapshot at three 'steps' + params.txt."""
    folder = str(tmp_path_factory.mktemp("run") / "Fields")
    f = finit.pulse_x(DECK.domain, dtype=jnp.float64)
    for step in (0, 25, 50):
        save_fields(f, DECK.tiling, DECK.guard, step=step, folder=folder)
    write_params(DECK, folder)
    return folder


def test_plot_field(run_folder):
    from minipic_tpu.diag.plots import plot_field

    out = plot_field(run_folder, step=0, quantity="Bz")
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_plot_lineouts(run_folder):
    from minipic_tpu.diag.plots import plot_lineouts

    out = plot_lineouts(run_folder, steps=[0, 25, 50], quantity="Bz")
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_plot_peak_amplitudes_and_csv(run_folder):
    from minipic_tpu.diag.plots import plot_peak_amplitudes

    out = plot_peak_amplitudes(run_folder, quantity="Bz")
    assert os.path.exists(out)
    csv = os.path.splitext(out)[0] + ".csv"
    data = np.loadtxt(csv)
    assert data.shape == (3, 4)  # 3 steps x (step, time, peak1, peak2)
    # the same pulse at every 'step' -> constant peak amplitude ~ A = 0.1
    np.testing.assert_allclose(data[:, 2], data[0, 2])
    assert 0.05 < data[0, 2] <= 0.11


def test_animation_fallback_writer(run_folder):
    from minipic_tpu.diag.plots import create_field_animation

    out = create_field_animation(run_folder, quantity="Bz", fps=5, max_frames=3)
    assert os.path.exists(out) and os.path.getsize(out) > 0
    assert out.endswith((".mp4", ".gif"))


def test_cli_plot_subcommand(run_folder, capsys):
    from minipic_tpu.cli import main

    rc = main(["plot", "field", "--folder", run_folder, "--quantity", "Ey"])
    assert rc == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert os.path.exists(line)
