"""2-D Yee FDTD field solver.

Behavioral contract from the reference (``Field_update.cpp:14-59``), in
normalized units (c = 1, fields in m_e c omega_p / e):

``update_b_half``  — B^{n} -> B^{n+1/2} using E^n, coefficient dt/2
(the reference calls this twice per step so E and B are synchronized at
integer steps; old_files/Field_update_v1.cpp's full-dt coefficient was the
bug fixed in the current version, SURVEY.md C17):

    Bx -= (dt/2dy) (Ez[j+1,i] - Ez[j,i])
    By += (dt/2dx) (Ez[j,i+1] - Ez[j,i])
    Bz += -(dt/2dx)(Ey[j,i+1] - Ey[j,i]) + (dt/2dy)(Ex[j+1,i] - Ex[j,i])

``update_e_full``  — E^n -> E^{n+1} using B^{n+1/2} and J^{n+1/2}:

    Ex += (dt/dy)(Bz[j,i] - Bz[j-1,i])                          - dt Jx
    Ey -= (dt/dx)(Bz[j,i] - Bz[j,i-1])                          - dt Jy
    Ez += (dt/dx)(By[j,i] - By[j,i-1]) - (dt/dy)(Bx - Bx[j-1,i]) - dt Jz

The J source term completes Ampère's law; the reference omitted it because
its particle stages were unimplemented (SURVEY.md §0, report §3.2).

Two formulations:

* ``*_periodic`` — global (ny, nx) arrays, periodic wrap via jnp.roll.
  Used single-device and inside shard_map when the local block has already
  been halo-padded... no: used for the fully global (unsharded) path.
* ``*_block``   — halo-padded blocks (ny + 2g, nx + 2g); updates the
  interior only, guards supply cross-shard neighbor values (the reference's
  guard-cell contract, Field_update.cpp:25).

Both are pure functions of pytrees; XLA fuses each update into a handful of
elementwise kernels (the reference's Grid<->GridE/GridB copy-in/copy-out
overhead, PIC_2D.cpp:181-195, has no equivalent here).
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..core.state import CurrentState, FieldState


def _xp(a):  # value at (i+1): roll index -1 along x (axis 1)
    return jnp.roll(a, -1, axis=1)


def _xm(a):  # value at (i-1)
    return jnp.roll(a, 1, axis=1)


def _yp(a):  # value at (j+1)
    return jnp.roll(a, -1, axis=0)


def _ym(a):  # value at (j-1)
    return jnp.roll(a, 1, axis=0)


def update_b_half_periodic(f: FieldState, dt: float, dx: float, dy: float) -> FieldState:
    cx = dt / (2.0 * dx)
    cy = dt / (2.0 * dy)
    bx = f.bx - cy * (_yp(f.ez) - f.ez)
    by = f.by + cx * (_xp(f.ez) - f.ez)
    bz = f.bz - cx * (_xp(f.ey) - f.ey) + cy * (_yp(f.ex) - f.ex)
    return FieldState(f.ex, f.ey, f.ez, bx, by, bz)


def update_e_full_periodic(
    f: FieldState, dt: float, dx: float, dy: float, j: Optional[CurrentState] = None
) -> FieldState:
    cx = dt / dx
    cy = dt / dy
    ex = f.ex + cy * (f.bz - _ym(f.bz))
    ey = f.ey - cx * (f.bz - _xm(f.bz))
    ez = f.ez + cx * (f.by - _xm(f.by)) - cy * (f.bx - _ym(f.bx))
    if j is not None:
        ex = ex - dt * j.jx
        ey = ey - dt * j.jy
        ez = ez - dt * j.jz
    return FieldState(ex, ey, ez, f.bx, f.by, f.bz)


# ----------------------------------------------------------------------
# Halo-padded block form (for sharded execution).  Arrays are
# (ny + 2g, nx + 2g); only the interior [g:-g, g:-g] is written, exactly the
# reference's interior-cells-only loop bounds (Field_update.cpp:26-27).
# ----------------------------------------------------------------------


def _int(a, g):  # interior view
    return a[g:-g, g:-g]


def _sh(a, g, dj, di):  # interior shifted by (dj, di), reads into the halo
    ny, nx = a.shape[0] - 2 * g, a.shape[1] - 2 * g
    return a[g + dj : g + dj + ny, g + di : g + di + nx]


def update_b_half_block(f: FieldState, g: int, dt: float, dx: float, dy: float) -> FieldState:
    """B half-step on a padded block; returns a padded FieldState whose B
    interior is updated (halos keep stale values — refresh via exchange)."""
    cx = dt / (2.0 * dx)
    cy = dt / (2.0 * dy)
    bx = _int(f.bx, g) - cy * (_sh(f.ez, g, 1, 0) - _int(f.ez, g))
    by = _int(f.by, g) + cx * (_sh(f.ez, g, 0, 1) - _int(f.ez, g))
    bz = (
        _int(f.bz, g)
        - cx * (_sh(f.ey, g, 0, 1) - _int(f.ey, g))
        + cy * (_sh(f.ex, g, 1, 0) - _int(f.ex, g))
    )
    return FieldState(
        f.ex,
        f.ey,
        f.ez,
        f.bx.at[g:-g, g:-g].set(bx),
        f.by.at[g:-g, g:-g].set(by),
        f.bz.at[g:-g, g:-g].set(bz),
    )


def update_e_full_block(
    f: FieldState,
    g: int,
    dt: float,
    dx: float,
    dy: float,
    j: Optional[CurrentState] = None,
) -> FieldState:
    cx = dt / dx
    cy = dt / dy
    ex = _int(f.ex, g) + cy * (_int(f.bz, g) - _sh(f.bz, g, -1, 0))
    ey = _int(f.ey, g) - cx * (_int(f.bz, g) - _sh(f.bz, g, 0, -1))
    ez = (
        _int(f.ez, g)
        + cx * (_int(f.by, g) - _sh(f.by, g, 0, -1))
        - cy * (_int(f.bx, g) - _sh(f.bx, g, -1, 0))
    )
    if j is not None:
        # J blocks are interior-shaped (ny, nx) — deposition guard folding
        # has already accumulated halo contributions.
        ex = ex - dt * j.jx
        ey = ey - dt * j.jy
        ez = ez - dt * j.jz
    return FieldState(
        f.ex.at[g:-g, g:-g].set(ex),
        f.ey.at[g:-g, g:-g].set(ey),
        f.ez.at[g:-g, g:-g].set(ez),
        f.bx,
        f.by,
        f.bz,
    )
