"""Single-device halo padding / folding (periodic wrap).

These are the one-chip degenerate forms of the cross-chip exchange in
parallel/halo.py: `pad_block_periodic` materializes the guard ring the
reference fills by MPI guard exchange (PIC_2D.cpp:198-248), and
`fold_block_periodic` is its additive adjoint, used to reduce deposition
guard rings back into the interior (needed by the PIC loop; no reference
equivalent — it was fields-only).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.state import FieldState


def pad_block_periodic(a, g: int):
    """(ny, nx) -> (ny+2g, nx+2g) with periodic wrap."""
    return jnp.pad(a, g, mode="wrap")


def pad_fields_periodic(f: FieldState, g: int) -> FieldState:
    return FieldState(*(pad_block_periodic(c, g) for c in f))


def fold_block_periodic(p, g: int):
    """Additive adjoint of pad_block_periodic: (ny+2g, nx+2g) -> (ny, nx),
    guard-ring values wrap-added into the opposite interior edge."""
    # x axis
    mid = p[:, g:-g]
    mid = mid.at[:, -g:].add(p[:, :g])
    mid = mid.at[:, :g].add(p[:, -g:])
    # y axis
    out = mid[g:-g, :]
    out = out.at[-g:, :].add(mid[:g, :])
    out = out.at[:g, :].add(mid[-g:, :])
    return out
