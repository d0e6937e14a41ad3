"""HDF5 field snapshots, byte-compatible with the reference's schema.

Schema contract (reference ``HDF5_output.cpp:10-79``, verified on the
shipped run files):

* file ``fields_rank_{r}_step_{s}.h5`` per rank per saved step
* one group ``/Tile_{globalID}`` per tile
* dataset ``fields``: compound dtype {Ex,Ey,Ez,Bx,By,Bz} (6 x f8), shape
  (tile_ny + 2 guard, tile_nx + 2 guard) — guard cells included
* scalar int attributes ``tileRow``, ``tileCol``, ``currentRank``

The reference's Python post-processor (``File_reader.py:57-119``) reads
exactly this layout; our files must load through it unmodified.  A "rank"
here is a presentation concept: the engine state is one global sharded
array, and the writer re-tiles it on the host into any requested rank
grid (default 1), reproducing the reference's per-rank file fan-out when
desired.

Writing happens outside the jit boundary on host copies; the async writer
in io/writer.py overlaps serialization with device compute.
"""
from __future__ import annotations

import glob
import os
import re
from typing import Dict, Optional

import numpy as np

from ..core.geometry import Tiling
from ..core.state import FIELD_NAMES, FieldState

GRID_DTYPE = np.dtype(
    [("Ex", "<f8"), ("Ey", "<f8"), ("Ez", "<f8"), ("Bx", "<f8"), ("By", "<f8"), ("Bz", "<f8")]
)
_COMP = {"ex": "Ex", "ey": "Ey", "ez": "Ez", "bx": "Bx", "by": "By", "bz": "Bz"}


def _tile_window(arr: np.ndarray, row: int, col: int, tiling: Tiling, guard: int):
    """Tile interior + periodic guard ring from a global (ny, nx) array."""
    ap = np.pad(arr, guard, mode="wrap")
    y0 = row * tiling.tile_ny
    x0 = col * tiling.tile_nx
    return ap[y0 : y0 + tiling.tile_ny + 2 * guard, x0 : x0 + tiling.tile_nx + 2 * guard]


def save_fields(
    fields: FieldState,
    tiling: Tiling,
    guard: int,
    step: int,
    folder: str,
    ranks: int = 1,
    owner: Optional[np.ndarray] = None,
) -> list:
    """Write the reference-schema snapshot for one step.

    ranks: fan the tiles out over this many per-rank files (near-square
    rank grid, reference PIC_2D.cpp:29-52).  owner: optional [num_tiles]
    tile->rank map overriding the block layout (the post-migration case —
    File_reader handles it because placement metadata travels as attrs).
    """
    import h5py

    from ..core.geometry import find_best_grid

    os.makedirs(folder, exist_ok=True)
    comps = {name: np.asarray(getattr(fields, name), np.float64) for name in FIELD_NAMES}

    rr, rc = find_best_grid(ranks)
    if tiling.tile_rows % rr or tiling.tile_cols % rc:
        raise ValueError(f"rank grid {rr}x{rc} must divide tile grid")
    tpr_r = tiling.tile_rows // rr  # tile rows per rank
    tpr_c = tiling.tile_cols // rc

    if owner is None:
        gid = np.arange(tiling.num_tiles)
        row, col = gid // tiling.tile_cols, gid % tiling.tile_cols
        owner = (row // tpr_r) * rc + (col // tpr_c)

    paths = []
    for r in range(ranks):
        path = os.path.join(folder, f"fields_rank_{r}_step_{step}.h5")
        with h5py.File(path, "w") as f:
            for gid in np.nonzero(owner == r)[0]:
                trow, tcol = int(gid) // tiling.tile_cols, int(gid) % tiling.tile_cols
                shape = (tiling.tile_ny + 2 * guard, tiling.tile_nx + 2 * guard)
                data = np.empty(shape, GRID_DTYPE)
                for name in FIELD_NAMES:
                    data[_COMP[name]] = _tile_window(comps[name], trow, tcol, tiling, guard)
                grp = f.create_group(f"Tile_{int(gid)}")
                dset = grp.create_dataset("fields", data=data)
                grp.attrs.create("tileRow", trow, dtype="<i4")
                grp.attrs.create("tileCol", tcol, dtype="<i4")
                grp.attrs.create("currentRank", r, dtype="<i4")
        paths.append(path)
    return paths


def load_field(
    step: int,
    folder: str,
    quantity: str = "Ex",
    *,
    nx_global: int,
    ny_global: int,
    guard: int,
    interior_nx: int,
    interior_ny: int,
) -> np.ndarray:
    """Reassemble one global component from a step's per-rank files —
    functional equivalent of the reference reader (File_reader.py:57-119):
    strip guards, place each tile's interior at (tileRow*interior_ny,
    tileCol*interior_nx)."""
    import h5py

    out = np.zeros((ny_global, nx_global), np.float64)
    files = glob.glob(os.path.join(folder, f"fields_rank_*_step_{step}.h5"))
    if not files:
        raise FileNotFoundError(f"no snapshot files for step {step} in {folder}")
    for path in files:
        with h5py.File(path, "r") as f:
            for gname, grp in f.items():
                if not gname.startswith("Tile_"):
                    continue
                trow = int(grp.attrs["tileRow"])
                tcol = int(grp.attrs["tileCol"])
                data = grp["fields"][guard:-guard, guard:-guard][quantity]
                out[
                    trow * interior_ny : (trow + 1) * interior_ny,
                    tcol * interior_nx : (tcol + 1) * interior_nx,
                ] = data
    return out


def save_particles(species_states, species_names, step: int, folder: str) -> str:
    """Synchronous particle snapshot (schema shared with the native writer's
    submit_particles): file ``particles_rank_0_step_{s}.h5``, one group per
    species holding live-compacted 1-D f8 datasets x,y,px,py,pz,w and an
    int ``count`` attr.  The reference never wrote particles (fields-only,
    SURVEY.md §0); this extends its per-rank snapshot convention to the
    PIC-completed state."""
    import h5py

    os.makedirs(folder, exist_ok=True)
    path = os.path.join(folder, f"particles_rank_0_step_{step}.h5")
    with h5py.File(path, "w") as f:
        for name, p in zip(species_names, species_states):
            w = np.asarray(p.w, np.float64).ravel()
            live = w > 0
            grp = f.create_group(name)
            for comp_name, comp in zip(
                ("x", "y", "px", "py", "pz", "w"),
                (p.x, p.y, p.px, p.py, p.pz, p.w),
            ):
                grp.create_dataset(
                    comp_name, data=np.asarray(comp, np.float64).ravel()[live]
                )
            grp.attrs.create("count", int(live.sum()), dtype="<i4")
    return path


def load_particles(step: int, folder: str) -> Dict[str, Dict[str, np.ndarray]]:
    """Read one particle snapshot -> {species: {x, y, px, py, pz, w}}."""
    import h5py

    path = os.path.join(folder, f"particles_rank_0_step_{step}.h5")
    out: Dict[str, Dict[str, np.ndarray]] = {}
    with h5py.File(path, "r") as f:
        for name, grp in f.items():
            out[name] = {k: grp[k][:] for k in ("x", "y", "px", "py", "pz", "w")}
            assert len(out[name]["x"]) == int(grp.attrs["count"])
    return out


def available_steps(folder: str) -> list:
    steps = set()
    for p in glob.glob(os.path.join(folder, "fields_rank_*_step_*.h5")):
        m = re.search(r"_step_(\d+)\.h5$", p)
        if m:
            steps.add(int(m.group(1)))
    return sorted(steps)
