"""Diagnostics toolkit tests, anchored to the reference's published numbers."""
import math

import numpy as np

from minipic_tpu.diag.analysis import (
    energy_drift,
    fdtd_dispersion_velocity,
    field_spectrum_x,
    fit_pulse_speed,
    growth_rate,
    lineout,
    peak_amplitudes,
    two_stream_growth_theory,
)


def test_dispersion_velocity_matches_report():
    """Report p.9: theory 0.99982 c for the canonical nx=450 config with
    kx = 5 * 2pi / 10."""
    dx = 10.0 / 450
    dt = 0.00785674
    k = 5 * 2 * math.pi / 10.0
    v = fdtd_dispersion_velocity(k, dt, dx)
    np.testing.assert_allclose(v, 0.99982, atol=2e-5)


def test_growth_rate_recovers_synthetic_exponential():
    t = np.linspace(0, 10, 100)
    e = 1e-8 * np.exp(2 * 0.35 * t)
    np.testing.assert_allclose(growth_rate(t, e), 0.35, rtol=1e-6)


def test_peak_amplitudes_and_lineout():
    x = np.linspace(0, 10, 500)
    line = 0.08 * np.exp(-((x - 3) ** 2)) + 0.05 * np.exp(-((x - 7) ** 2))
    field = np.tile(line, (20, 1))
    lo = lineout(field)
    p1, p2 = peak_amplitudes(lo, distance=10)
    np.testing.assert_allclose([p1, p2], [0.08, 0.05], rtol=1e-3)


def test_fit_pulse_speed_synthetic():
    dx, nx = 0.02, 500
    x = np.arange(nx) * dx
    times = np.linspace(0, 3, 10)
    lines = [np.exp(-((x - (1.0 + 0.998 * t)) ** 2) / 0.01) for t in times]
    v = fit_pulse_speed(times, lines, dx, distance=5)
    np.testing.assert_allclose(v, 0.998, atol=0.01)


def test_two_stream_theory_peak():
    # gamma_max = wb/2 at (k v0)^2 = (3/4) wb^2
    wb = 1 / math.sqrt(2)
    k = math.sqrt(0.75) * wb / 0.2
    np.testing.assert_allclose(two_stream_growth_theory(k, 0.2, wb), wb / 2, rtol=1e-12)


def test_energy_drift_and_spectrum():
    hist = [(1.0, 9.0), (1.05, 8.96), (0.98, 9.015)]
    np.testing.assert_allclose(energy_drift(hist), 0.01 / 10.0, rtol=1e-9)
    f = np.sin(2 * math.pi * 3 * np.arange(64) / 64)[None, :] * np.ones((8, 1))
    spec = field_spectrum_x(f)
    assert spec.argmax() == 3


def test_track_peak_speed_periodic_wrap():
    """Continuity tracking must survive crests crossing the periodic box
    edge (where plain find_peaks loses them) — the bug that biased the
    reference-parity speed fit before find_peaks_periodic."""
    from minipic_tpu.diag.analysis import track_peak_speed

    dx, nx = 10 / 450, 450
    x = np.arange(nx) * dx
    kx = np.pi
    v = 0.9998
    times = np.arange(1, 120) * 0.3928  # several box transits

    def envelope(u):
        return np.where(np.abs(u) <= 1, np.cos(u * np.pi / 2) ** 2, 0)

    lines = [
        0.1
        * np.sin(kx * (x - v * t))
        * envelope(((x - 3.5 - v * t + 5) % 10 - 5) / 3.0)
        for t in times
    ]
    got = track_peak_speed(times, lines, dx, distance=10)
    np.testing.assert_allclose(got, v, atol=5e-4)


# ---------------------------------------------------------------- on-device


def test_phase_space_hist_counts_and_ranges():
    import jax
    import jax.numpy as jnp

    from minipic_tpu.core.state import ParticleState
    from minipic_tpu.diag.device import phase_space_hist

    z = jnp.zeros((2, 8))
    x = z.at[0, :3].set(jnp.asarray([1.0, 2.0, 3.0])).at[1, 0].set(9.0)
    px = z.at[0, :3].set(jnp.asarray([-0.1, 0.0, 0.1])).at[1, 0].set(0.2)
    w = z.at[0, :3].set(2.0).at[1, 0].set(1.0)
    p = ParticleState(x=x, y=z, px=px, py=z, pz=z, w=w)

    hist, e0, e1 = jax.jit(
        lambda pp: phase_space_hist(pp, "x", "px", bins=(4, 4),
                                    range0=(0.0, 10.0), range1=(-0.2, 0.25))
    )(p)
    assert float(hist.sum()) == 7.0  # total weight, dead slots excluded
    # particle at x=9, px=0.2 -> last x bin, last px bin
    assert float(hist[3, 3]) == 1.0


def test_energy_spectrum_total_weight():
    import jax.numpy as jnp

    from minipic_tpu.core.state import ParticleState
    from minipic_tpu.diag.device import energy_spectrum

    z = jnp.zeros((1, 16))
    px = z.at[0, :4].set(jnp.asarray([0.1, 0.2, 0.3, 0.4]))
    w = z.at[0, :4].set(1.0)
    p = ParticleState(x=z, y=z, px=px, py=z, pz=z, w=w)
    hist, edges = energy_spectrum(p, mass=1.0, bins=8)
    assert float(hist.sum()) == 4.0
    assert edges.shape == (9,)


def test_charge_density_matches_counts():
    import jax.numpy as jnp
    import numpy as np

    from minipic_tpu.core.state import ParticleState
    from minipic_tpu.diag.device import charge_density

    z = jnp.zeros((1, 8))
    x = z.at[0, :2].set(jnp.asarray([0.5, 3.7]))
    y = z.at[0, :2].set(jnp.asarray([1.2, 0.1]))
    w = z.at[0, :2].set(1.0)
    p = ParticleState(x=x, y=y, px=z, py=z, pz=z, w=w)
    rho = charge_density(p, q=-1.0, ny=4, nx=4)
    assert float(rho.sum()) == -2.0
    assert float(rho[1, 0]) == -1.0 and float(rho[0, 3]) == -1.0
