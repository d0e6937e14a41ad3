"""Yee solver physics validation (the reference's acceptance tests, report §4).

The analytic EM waveforms are exact solutions of Maxwell's equations; after
one round trip of the periodic box a wave must return to its initial state
up to FDTD dispersion error.  These mirror the reference's Tests 1-3 and its
diagnostics (File_reader.py lineouts / peak tracking / velocity fit).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minipic_tpu.core.geometry import Domain
from minipic_tpu.core.state import FieldState, field_energy
from minipic_tpu.fields import init as finit
from minipic_tpu.fields.yee import (
    update_b_half_block,
    update_b_half_periodic,
    update_e_full_block,
    update_e_full_periodic,
)


def make_step(dt, dx, dy):
    @jax.jit
    def step(f):
        f = update_b_half_periodic(f, dt, dx, dy)
        f = update_e_full_periodic(f, dt, dx, dy)
        f = update_b_half_periodic(f, dt, dx, dy)
        return f

    return step


def run_steps(f, n, dt, dx, dy):
    step = make_step(dt, dx, dy)
    for _ in range(n):
        f = step(f)
    return f


def _setup(nx=128, ny=128, dtype=jnp.float64):
    d = Domain(10.0, 10.0, nx, ny)
    dt = 0.5 * d.dt_courant()
    return d, dt


@pytest.mark.parametrize(
    "initfn", [finit.plane_wave_x, finit.plane_wave_y, finit.oblique_wave]
)
def test_wave_energy_conserved(initfn):
    d, dt = _setup()
    f = initfn(d, dtype=jnp.float64)
    e0 = field_energy(f, d.dx, d.dy)
    f200 = run_steps(f, 200, dt, d.dx, d.dy)
    e200 = field_energy(f200, d.dx, d.dy)
    # The synchronized-fields energy 1/2(E^2+B^2) is not the exactly
    # conserved discrete invariant (that one pairs B at half steps), but it
    # is bounded with O((k dt)^2) oscillation and no secular drift.
    assert abs(e200 - e0) / e0 < 1e-5
    f400 = run_steps(f200, 200, dt, d.dx, d.dy)
    e400 = field_energy(f400, d.dx, d.dy)
    assert abs(e400 - e0) / e0 < 1e-5  # bounded, not growing


def test_plane_wave_x_propagates_at_c():
    """x-propagating sine wave: after time T the pattern has shifted by ~c*T
    (up to FDTD dispersion, <0.1% at this resolution)."""
    d, dt = _setup(nx=256, ny=16)
    f = finit.plane_wave_x(d, dtype=jnp.float64)
    n_steps = 400
    f2 = run_steps(f, n_steps, dt, d.dx, d.dy)
    t = n_steps * dt
    kx = 5 * 2 * math.pi / d.box_x
    # Analytic solution: Ey(x, t) = A sin(kx (x - t)) at Ey stagger points.
    x = (np.arange(d.nx) + 0.0) * d.dx
    expected = 0.1 * np.sin(kx * (x - t))
    got = np.asarray(f2.ey)[0, :]
    # Correlate phase: normalized L2 mismatch small
    err = np.linalg.norm(got - expected) / np.linalg.norm(expected)
    assert err < 0.02, err


def test_pulse_round_trip_and_dispersion_speed():
    """Test 3 (the reference's active init): pulse propagates at the FDTD
    dispersion velocity ~0.9998c (report p.9: fit 0.99977c vs theory
    0.99982c at nx=450).  We fit the peak position drift over time at a
    smaller grid and check the speed is within 1% of c and below c."""
    d = Domain(10.0, 10.0, 180, 180)
    dt = 0.5 * d.dt_courant()
    f = finit.pulse_x(d, dtype=jnp.float64)
    step = make_step(dt, d.dx, d.dy)

    # The pulse splits into two counter-propagating halves only if E and B
    # are not matched; with Ey = Bz it moves purely +x.  Track the envelope
    # centroid of Bz^2 along x (lineout at mid-y, like File_reader.py:210).
    ny_mid = d.ny // 2

    def centroid(field):
        line = np.asarray(field.bz)[ny_mid, :] ** 2
        x = (np.arange(d.nx) + 0.5) * d.dx
        return float((line * x).sum() / line.sum())

    times, cents = [], []
    n_chunk, n_rounds = 20, 8
    fcur = f
    for r in range(n_rounds):
        for _ in range(n_chunk):
            fcur = step(fcur)
        t = (r + 1) * n_chunk * dt
        c = centroid(fcur)
        if t < (d.box_x - 4.5 - 3.5):  # stop before periodic wrap of envelope
            times.append(t)
            cents.append(c)
    times, cents = np.array(times), np.array(cents)
    speed = np.polyfit(times, cents, 1)[0]
    assert 0.985 < speed <= 1.0001, speed


def test_amplitude_preserved_over_propagation():
    """Peak amplitude drift stays bounded (reference Fig. 8-9 diagnostic)."""
    d = Domain(10.0, 10.0, 180, 180)
    dt = 0.5 * d.dt_courant()
    f = finit.pulse_x(d, dtype=jnp.float64)
    a0 = float(jnp.max(jnp.abs(f.bz)))
    f = run_steps(f, 200, dt, d.dx, d.dy)
    a1 = float(jnp.max(jnp.abs(f.bz)))
    assert abs(a1 - a0) / a0 < 0.15  # reference sees ~10% drift at nx=450


def test_block_form_matches_periodic_form():
    """The halo-padded block stencil must agree exactly with the global
    periodic stencil when halos are filled by periodic wrap."""
    g = 2
    d, dt = _setup(nx=48, ny=32)
    f = finit.oblique_wave(d, dtype=jnp.float64)

    def pad(a):
        return jnp.pad(a, ((g, g), (g, g)), mode="wrap")

    fp = FieldState(*(pad(c) for c in f))
    # periodic path
    f1 = update_b_half_periodic(f, dt, d.dx, d.dy)
    f1 = update_e_full_periodic(f1, dt, d.dx, d.dy)
    # block path (re-wrap halos between the two updates)
    fb = update_b_half_block(fp, g, dt, d.dx, d.dy)
    fb = FieldState(*(pad(c[g:-g, g:-g]) for c in fb))
    fb = update_e_full_block(fb, g, dt, d.dx, d.dy)
    for a, b in zip(f1, fb):
        np.testing.assert_allclose(np.asarray(b[g:-g, g:-g]), np.asarray(a), rtol=0, atol=0)


def test_absorbing_boundary_damps_outgoing_pulse():
    from minipic_tpu.fields.boundary import apply_damping, damping_mask

    d = Domain(10.0, 10.0, 128, 128)
    dt = 0.5 * d.dt_courant()
    f = finit.pulse_x(d, dtype=jnp.float64)
    mask = damping_mask(d.ny, d.nx, width=16, strength=0.05, dtype=jnp.float64)
    e0 = field_energy(f, d.dx, d.dy)

    @jax.jit
    def step(fs):
        fs = update_b_half_periodic(fs, dt, d.dx, d.dy)
        fs = update_e_full_periodic(fs, dt, d.dx, d.dy)
        fs = update_b_half_periodic(fs, dt, d.dx, d.dy)
        return apply_damping(fs, mask)

    # Long enough for the pulse to cross the layer a few times.
    for _ in range(1500):
        f = step(f)
    e1 = field_energy(f, d.dx, d.dy)
    assert e1 / e0 < 0.05, float(e1 / e0)
