"""Esirkepov charge-conserving current deposition as batched matmuls.

Completes the "Current Deposition" stage of the reference's PIC loop
(Mini_PIC_2D_Report.pdf Fig. 1, unimplemented there; the J term is likewise
absent from its E update, Field_update.cpp:40-59 — see fields/yee.py).

Esirkepov's decomposition guarantees the *discrete* continuity equation

    (rho^{n+1} - rho^n)/dt + div_Yee J^{n+1/2} = 0        (exactly)

so Gauss's law, once true, stays true without divergence cleaning.  With
old/new 1-D shape vectors S0x, S1x (same index window) and DS = S1 - S0:

    Wx[i,j] = DSx[i] (S0y[j] + DSy[j]/2)
    Wy[i,j] = DSy[j] (S0x[i] + DSx[i]/2)
    Wz[i,j] = S0y[j](S0x + DSx/2)[i] + DSy[j](S0x/2 + DSx/3)[i]

    Jx[j,i] at (i+1/2, j):  Jx[i] = Jx[i-1] - (q w / (dt dy)) Wx[i,j]
    Jy[j,i] at (i, j+1/2):  analogous cumulative sum along y
    Jz[j,i] at (i, j):      (q w vz / (dx dy)) Wz[i,j]

TPU-native key move: every term above is an *outer product* of a
per-particle x-vector and y-vector, and the prefix sum commutes with the
outer product — cumsum(DSx) ⊗ (S0y + DSy/2) — so summing over a tile's
particles is a single [nyg, K] @ [K, nxg] matmul per component (MXU), with
the cumulative sums as cheap dense 1-D prefix ops (VPU).  No scatter, no
atomics, no sorting inside the kernel (SURVEY.md §7 hard part #1).

Validity window: each particle's full old+new support must lie inside its
padded tile axis.  CFL guarantees <1 cell of motion per step; binning
guarantees freshly-binned particles are in [0, tile_n); the guard width
check lives in Deck.validate.  The dense cumsum self-terminates: right of
the support, cumsum(DSx) = sum(S1x) - sum(S0x) = 0 (partition of unity), so
no spurious current leaks to the tile edge.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_PREC = jax.lax.Precision.HIGHEST  # TPU default matmul precision is bf16,
# which breaks exact charge conservation and force accuracy (measured:
# continuity residual 0.5% of scale at DEFAULT vs round-off at HIGHEST)

from .shapes import shape_matrix


def deposit_chunk(
    xi0,
    eta0,
    xi1,
    eta1,
    vz,
    qw,
    tile_ny: int,
    tile_nx: int,
    g: int,
    order: int,
    dt: float,
    dx: float,
    dy: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-tile current contribution of one slot chunk.

    xi0/eta0, xi1/eta1: [T, kc] tile-local positions before/after the move
    (cell units, *unwrapped* so xi1 - xi0 is the true displacement).
    vz: [T, kc] z velocity at n+1/2;  qw: [T, kc] charge * weight (0 = dead).
    Returns (jx, jy, jz) tiles, each [T, nyg, nxg].
    """
    s0x = shape_matrix(xi0, tile_nx, g, 0.0, order)  # [T, kc, nxg]
    s1x = shape_matrix(xi1, tile_nx, g, 0.0, order)
    s0y = shape_matrix(eta0, tile_ny, g, 0.0, order)  # [T, kc, nyg]
    s1y = shape_matrix(eta1, tile_ny, g, 0.0, order)
    dsx = s1x - s0x
    dsy = s1y - s0y

    # Jx: cumsum along x of Wx, folded into the x-vector.
    ax = jnp.cumsum(dsx, axis=-1)  # [T, kc, nxg]
    by1 = s0y + 0.5 * dsy  # [T, kc, nyg]
    coef_x = (-qw / (dt * dy))[..., None]
    jx = jnp.einsum("tkj,tki->tji", by1 * coef_x, ax, precision=_PREC)

    # Jy: cumsum along y.
    ay = jnp.cumsum(dsy, axis=-1)
    bx1 = s0x + 0.5 * dsx
    coef_y = (-qw / (dt * dx))[..., None]
    jy = jnp.einsum("tkj,tki->tji", ay * coef_y, bx1, precision=_PREC)

    # Jz: two outer-product terms.
    coef_z = (qw * vz / (dx * dy))[..., None]
    jz = jnp.einsum(
        "tkj,tki->tji", s0y * coef_z, s0x + 0.5 * dsx, precision=_PREC
    ) + jnp.einsum(
        "tkj,tki->tji", dsy * coef_z, 0.5 * s0x + (1.0 / 3.0) * dsx, precision=_PREC
    )
    return jx, jy, jz


def deposit_rho_chunk(xi, eta, qw, tile_ny: int, tile_nx: int, g: int, order: int, dx: float, dy: float, quantize: float = 0.0):
    """Charge density tiles [T, nyg, nxg] at integer (Ez/Gauss) points —
    the diagnostic side of the continuity/Gauss checks.

    quantize > 0: snap each shape weight to round(quantize * S) / quantize
    — the effective assignment function of the int8 matched-quantization
    deposit (ppd_kernel deposit_mode='int8', S = qshape_scale(order)).  The
    continuity identity div J = -d rho/dt holds exactly in the quantized
    ring, so the residual check against an int8-deposited J must build
    rho from the same quantized shapes."""
    sx = shape_matrix(xi, tile_nx, g, 0.0, order)
    sy = shape_matrix(eta, tile_ny, g, 0.0, order)
    if quantize > 0:
        # Match the kernel's qshape exactly: round, then fold the
        # partition-of-unity defect into the center (|u| < 0.5) column.
        def quant(s, pos, n):
            coords = jnp.arange(n + 2 * g, dtype=pos.dtype) - g
            u = pos[..., None] - coords
            q = jnp.round(s * quantize)
            defect = quantize - jnp.sum(q, axis=-1, keepdims=True)
            center = (u >= -0.5) & (u < 0.5)
            return (q + jnp.where(center, defect, 0.0)) * (1.0 / quantize)

        sx = quant(sx, xi, tile_nx)
        sy = quant(sy, eta, tile_ny)
    coef = (qw / (dx * dy))[..., None]
    return jnp.einsum("tkj,tki->tji", sy * coef, sx, precision=_PREC)
