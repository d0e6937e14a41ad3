"""Numerical diagnostics — the validation toolkit of the reference's
post-processor (File_reader.py) as library functions, plus the
particle-era diagnostics (growth rates, spectra) the benchmarks need.

Reference parity:
* ``lineout``                  <- File_reader.plot_line_slices_along_x_steps (:210-283)
* ``peak_amplitudes``          <- File_reader.track_peak_amplitudes_over_time (:290-381)
* ``fit_pulse_speed``          <- the report's Fig. 10 linear fit of the
                                  first-peak position (p.9: 0.99977c vs
                                  theory 0.99982c)
* ``fdtd_dispersion_velocity`` <- the report's Eq. 4 theory value.

New (BASELINE.json configs):
* ``growth_rate``       — exponential-fit of an energy history (two-stream,
                          Weibel magnetic-energy growth).
* ``energy_drift``      — relative total-energy drift (<0.1% acceptance).
* ``field_spectrum_x``  — |FFT_x|^2 mode amplitudes (instability mode tracking).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np


def lineout(field: np.ndarray, y_index: Optional[int] = None) -> np.ndarray:
    """Horizontal slice at fixed y (defaults to the middle row)."""
    if y_index is None:
        y_index = field.shape[0] // 2
    return np.asarray(field)[y_index, :]


def find_peaks_1d(line: np.ndarray, distance: int = 10) -> np.ndarray:
    """Local-maxima indices with a minimum separation (scipy-compatible)."""
    from scipy.signal import find_peaks

    peaks, _ = find_peaks(line, distance=distance)
    return peaks


def find_peaks_periodic(line: np.ndarray, distance: int = 10) -> np.ndarray:
    """Peak indices on a periodic signal: maxima straddling the wrap are
    found by searching a circularly padded copy (a crest split across the
    box edge is invisible to a plain find_peaks)."""
    from scipy.signal import find_peaks

    n = len(line)
    pad = max(distance * 2, 16)
    ext = np.concatenate([line[-pad:], line, line[:pad]])
    peaks, _ = find_peaks(ext, distance=distance)
    peaks = (peaks - pad) % n
    return np.unique(peaks[(peaks >= 0) & (peaks < n)])


def peak_amplitudes(line: np.ndarray, distance: int = 10, top: int = 2) -> list:
    """Amplitudes of the `top` strongest local maxima (the reference's
    numerical-error diagnostic, File_reader.py:345-360)."""
    peaks = find_peaks_1d(line, distance)
    vals = sorted((float(line[p]) for p in peaks), reverse=True)[:top]
    while len(vals) < top:
        vals.append(0.0)
    return vals


def fit_pulse_speed(
    times: Sequence[float], lines: Sequence[np.ndarray], dx: float, distance: int = 10
) -> float:
    """Linear fit of the leading-peak position vs time -> propagation speed
    (report Fig. 10 methodology).  Uses the strongest peak per lineout and
    unwraps periodic jumps."""
    pos = []
    nx = len(lines[0])
    for line in lines:
        peaks = find_peaks_1d(np.asarray(line), distance)
        if len(peaks) == 0:
            pos.append(np.nan)
            continue
        best = peaks[np.argmax(np.asarray(line)[peaks])]
        pos.append(best * dx)
    pos = np.unwrap(np.asarray(pos), period=nx * dx)
    t = np.asarray(times)
    ok = np.isfinite(pos)
    return float(np.polyfit(t[ok], pos[ok], 1)[0])


def track_peak_speed(
    times: Sequence[float],
    lines: Sequence[np.ndarray],
    dx: float,
    distance: int = 10,
) -> float:
    """Carrier-crest speed by *continuity* tracking: follow the single peak
    nearest to its last (advected) position instead of re-picking the
    globally strongest one — the strongest crest hops +-lambda as the
    envelope slides over the carrier, which biases a naive fit.  This is
    the robust version of the report's first-peak fit (Fig. 10)."""
    nx = len(lines[0])
    box = nx * dx
    t = np.asarray(times, np.float64)

    line0 = np.asarray(lines[0])
    peaks0 = find_peaks_periodic(line0, distance)
    pos = float(peaks0[np.argmax(line0[peaks0])]) * dx
    positions = [pos]
    unwrapped = [pos]
    v_est = 1.0  # c, the obvious prior
    for i in range(1, len(lines)):
        line = np.asarray(lines[i])
        peaks = find_peaks_periodic(line, distance) * dx
        if len(peaks) == 0:
            positions.append(positions[-1])
            unwrapped.append(unwrapped[-1])
            continue
        pred = (positions[-1] + v_est * (t[i] - t[i - 1])) % box
        d = np.abs((peaks - pred + box / 2) % box - box / 2)
        new = float(peaks[np.argmin(d)])
        step = (new - positions[-1] + box / 2) % box - box / 2
        positions.append(new)
        unwrapped.append(unwrapped[-1] + step)
    return float(np.polyfit(t, np.asarray(unwrapped), 1)[0])


def fdtd_dispersion_velocity(k: float, dt: float, dx: float) -> float:
    """Phase velocity of the 1-D Yee scheme: sin(w dt/2) = (dt/dx) sin(k dx/2)
    (the report's Eq. 4 numerical-dispersion prediction)."""
    s = (dt / dx) * math.sin(k * dx / 2.0)
    omega = 2.0 / dt * math.asin(min(1.0, s))
    return omega / k


def growth_rate(times: Sequence[float], energies: Sequence[float], window: Optional[Tuple[int, int]] = None) -> float:
    """Exponential growth rate gamma of an energy history, fit over the
    linear-instability window (E ~ e^{2 gamma t} for field energy)."""
    t = np.asarray(times, np.float64)
    e = np.asarray(energies, np.float64)
    if window is not None:
        t, e = t[window[0] : window[1]], e[window[0] : window[1]]
    ok = e > 0
    slope = np.polyfit(t[ok], np.log(e[ok]), 1)[0]
    return float(slope / 2.0)


def energy_drift(history: Sequence[Tuple[float, float]]) -> float:
    """max |E_total(t) - E_total(0)| / E_total(0) over (field+kinetic) sums."""
    tot = np.asarray([f + k for f, k in history], np.float64)
    return float(np.abs(tot - tot[0]).max() / abs(tot[0]))


def field_spectrum_x(field: np.ndarray) -> np.ndarray:
    """Mode power |FFT_x|^2 averaged over y — instability mode tracking."""
    f = np.fft.rfft(np.asarray(field), axis=1)
    return (np.abs(f) ** 2).mean(axis=0)


def two_stream_growth_theory(k: float, v0: float, wp_beam: float) -> float:
    """Cold symmetric two-stream linear growth rate for mode k (solves the
    quartic dispersion relation exactly).

    1 = wb^2/(w-kv)^2 + wb^2/(w+kv)^2; unstable root exists iff
    (k v0)^2 < 2 wb^2... using the standard closed form:
    w^2 = wb^2 + k^2 v0^2 - wb sqrt(wb^2 + 4 k^2 v0^2)  (negative -> growth)
    """
    a = k * k * v0 * v0
    w2 = wp_beam**2 + a - wp_beam * math.sqrt(wp_beam**2 + 4 * a)
    return math.sqrt(-w2) if w2 < 0 else 0.0
