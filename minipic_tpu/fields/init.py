"""Analytic field initializations (the reference's validation waveforms).

The reference initializes fields per tile from global staggered coordinates
(``PIC_2D.cpp:111-142``); three waveforms appear there (two commented out),
which are the report's validation Tests 1-3 (report §4):

* Test 1 — plane sine wave along ŷ:   Ex =  A sin(ky y),  Bz = -A sin(ky y)
* Test 2 — oblique sine wave:         Ex =  (A/√2) sin(kx x + ky y),
                                      Ey = -(A/√2) sin(kx x + ky y),
                                      Bz = -A sin(kx x + ky y)
* Test 3 (active) — x-propagating cos²-envelope pulse:
      Ey = Bz = A sin(kx x) cos²(((x-xc)/τ)(π/2)) H(1 - |x-xc|/τ)
  with A=0.1, kx = 5·2π/box_x, xc=3.5, τ=3  (PIC_2D.cpp:104-110).

Each initializer evaluates the expression at the correct Yee-staggered
coordinates per component (geometry.STAGGER), globally — the reference's
per-tile offset bookkeeping (global_x_offset etc., PIC_2D.cpp:96-98) is
unnecessary when fields are whole arrays.
"""
from __future__ import annotations

import math
from typing import Callable, Dict

import jax.numpy as jnp

from ..core.geometry import STAGGER, Domain
from ..core.state import FieldState


def _coords(domain: Domain, name: str, dtype):
    """Broadcastable staggered (x[1,nx], y[ny,1]) physical coordinates."""
    ox, oy = STAGGER[name]
    x = (jnp.arange(domain.nx, dtype=dtype) + ox) * domain.dx
    y = (jnp.arange(domain.ny, dtype=dtype) + oy) * domain.dy
    return x[None, :], y[:, None]


def from_expressions(domain: Domain, exprs: Dict[str, Callable], dtype=jnp.float32) -> FieldState:
    """Build a FieldState from {component: f(x, y)} callables.

    Components not listed are zero.  ``f`` receives broadcastable physical
    coordinate arrays evaluated at that component's stagger.
    """
    out = {}
    for name in ("ex", "ey", "ez", "bx", "by", "bz"):
        fn = exprs.get(name)
        if fn is None:
            out[name] = jnp.zeros((domain.ny, domain.nx), dtype)
        else:
            x, y = _coords(domain, name, dtype)
            out[name] = jnp.broadcast_to(
                jnp.asarray(fn(x, y), dtype), (domain.ny, domain.nx)
            )
    return FieldState(**out)


def plane_wave_y(domain: Domain, amplitude: float = 0.1, modes: int = 5, dtype=jnp.float32):
    """Test 1 (PIC_2D.cpp:121,137): ŷ-propagating plane wave."""
    ky = modes * 2.0 * math.pi / domain.box_y
    return from_expressions(
        domain,
        {
            "ex": lambda x, y: amplitude * jnp.sin(ky * y),
            "bz": lambda x, y: -amplitude * jnp.sin(ky * y),
        },
        dtype,
    )


def plane_wave_x(domain: Domain, amplitude: float = 0.1, modes: int = 5, dtype=jnp.float32):
    """x̂-propagating plane wave (PIC_2D.cpp:128,138 variant)."""
    kx = modes * 2.0 * math.pi / domain.box_x
    return from_expressions(
        domain,
        {
            "ey": lambda x, y: amplitude * jnp.sin(kx * x),
            "bz": lambda x, y: amplitude * jnp.sin(kx * x),
        },
        dtype,
    )


def oblique_wave(domain: Domain, amplitude: float = 0.1, modes: int = 5, dtype=jnp.float32):
    """Test 2 (PIC_2D.cpp:123,129,139): oblique sine wave."""
    kx = modes * 2.0 * math.pi / domain.box_x
    ky = modes * 2.0 * math.pi / domain.box_y
    a = amplitude / math.sqrt(2.0)
    return from_expressions(
        domain,
        {
            "ex": lambda x, y: a * jnp.sin(kx * x + ky * y),
            "ey": lambda x, y: -a * jnp.sin(kx * x + ky * y),
            "bz": lambda x, y: -amplitude * jnp.sin(kx * x + ky * y),
        },
        dtype,
    )


def pulse_x(
    domain: Domain,
    amplitude: float = 0.1,
    modes: int = 5,
    center: float = 3.5,
    tau: float = 3.0,
    dtype=jnp.float32,
):
    """Test 3, the reference's active init (PIC_2D.cpp:130,140):
    x-propagating localized pulse with a cos² envelope."""
    kx = modes * 2.0 * math.pi / domain.box_x

    def envelope(x):
        u = (x - center) / tau
        # heaviside(1 - |u|): hard support cut (Auxiliar_functions.cpp:297).
        return jnp.where(jnp.abs(u) <= 1.0, jnp.cos(u * math.pi * 0.5) ** 2, 0.0)

    def ey(x, y):
        return amplitude * jnp.sin(kx * x) * envelope(x)

    return from_expressions(domain, {"ey": ey, "bz": ey}, dtype)


def gaussian_laser_x(
    domain: Domain,
    a0: float = 1.0,
    k0: float = 10.0,
    x_center: float = 2.0,
    length: float = 1.0,
    waist: float = 2.0,
    dtype=jnp.float32,
):
    """Linearly polarized (Ey, Bz) Gaussian laser pulse moving along +x̂,
    for the laser-into-plasma benchmark (BASELINE.json config 4)."""

    def prof(x, y):
        yc = domain.box_y / 2.0
        env = jnp.exp(-(((x - x_center) / length) ** 2) - (((y - yc) / waist) ** 2))
        return a0 * jnp.sin(k0 * x) * env

    return from_expressions(domain, {"ey": prof, "bz": prof}, dtype)
