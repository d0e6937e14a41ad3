"""ctypes bindings for the native async snapshot writer.

Builds ``io/native/snapshot_writer.cpp`` on first use (g++, linked against
the system libhdf5 runtime) and exposes an ``AsyncSnapshotWriter`` whose
``save_fields``-equivalent returns as soon as the host buffers are handed
to the C++ thread pool.  Falls back cleanly when the toolchain or library
is unavailable (``available()`` -> False); callers then use the
synchronous h5py writer (io/hdf5.py), which produces identical files.
"""
from __future__ import annotations

import atexit
import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from ...core.geometry import Tiling, find_best_grid
from ...core.state import FIELD_NAMES, FieldState

_SRC = os.path.join(os.path.dirname(__file__), "snapshot_writer.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _find_hdf5() -> Optional[str]:
    for cand in (
        "/lib/x86_64-linux-gnu/libhdf5_serial.so.103",
        "/usr/lib/x86_64-linux-gnu/libhdf5_serial.so.103",
        "/usr/lib/x86_64-linux-gnu/libhdf5_serial.so",
    ):
        if os.path.exists(cand):
            return cand
    return None


def _build() -> Optional[ctypes.CDLL]:
    hdf5 = _find_hdf5()
    if hdf5 is None:
        return None
    out = os.path.join(os.path.dirname(_SRC), "libmpw.so")
    if not os.path.exists(out) or os.path.getmtime(out) < os.path.getmtime(_SRC):
        cmd = [
            "g++", "-O2", "-shared", "-fPIC", "-std=c++17", "-pthread",
            _SRC, hdf5, "-o", out,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(out)
    except OSError:
        return None
    lib.mpw_init.argtypes = [ctypes.c_int]
    lib.mpw_submit.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.int32), ctypes.c_int,
        np.ctypeslib.ndpointer(np.float64), ctypes.c_longlong, ctypes.c_longlong,
    ]
    lib.mpw_submit_particles.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_char_p),
        np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.float64),
    ]
    lib.mpw_flush.restype = ctypes.c_int
    lib.mpw_written.restype = ctypes.c_long
    return lib


def _get() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build()
        if _LIB is not None and _LIB.mpw_init(2) != 0:
            _LIB = None
        if _LIB is not None:
            # joinable std::threads at static destruction call terminate();
            # drain and join on interpreter exit instead.
            atexit.register(_LIB.mpw_shutdown)
    return _LIB


def available() -> bool:
    return _get() is not None


class AsyncSnapshotWriter:
    """Reference-schema snapshot writer with background serialization."""

    def __init__(self, tiling: Tiling, guard: int, folder: str, ranks: int = 1):
        self.tiling = tiling
        self.guard = guard
        self.folder = folder
        self.ranks = ranks
        self.lib = _get()
        if self.lib is None:
            raise RuntimeError("native writer unavailable (no g++/libhdf5)")
        os.makedirs(folder, exist_ok=True)
        rr, rc = find_best_grid(ranks)
        if tiling.tile_rows % rr or tiling.tile_cols % rc:
            raise ValueError("rank grid must divide tile grid")
        self._rr, self._rc = rr, rc

    def submit(self, fields: FieldState, step: int) -> None:
        """Copy + enqueue; returns immediately."""
        t, g = self.tiling, self.guard
        comps = [np.asarray(getattr(fields, n), np.float64) for n in FIELD_NAMES]
        padded = [np.pad(c, g, mode="wrap") for c in comps]
        nyg, nxg = t.tile_ny + 2 * g, t.tile_nx + 2 * g
        tpr_r = t.tile_rows // self._rr
        tpr_c = t.tile_cols // self._rc
        for r in range(self.ranks):
            rrow, rcol = r // self._rc, r % self._rc
            gids, rows, cols = [], [], []
            bufs = []
            for lr in range(tpr_r):
                for lc in range(tpr_c):
                    trow = rrow * tpr_r + lr
                    tcol = rcol * tpr_c + lc
                    gids.append(t.tile_id(trow, tcol))
                    rows.append(trow)
                    cols.append(tcol)
                    y0, x0 = trow * t.tile_ny, tcol * t.tile_nx
                    win = np.stack(
                        [p[y0 : y0 + nyg, x0 : x0 + nxg] for p in padded], axis=-1
                    )
                    bufs.append(win)
            data = np.ascontiguousarray(np.stack(bufs), np.float64)
            path = os.path.join(self.folder, f"fields_rank_{r}_step_{step}.h5")
            rc_ = self.lib.mpw_submit(
                path.encode(), len(gids),
                np.asarray(gids, np.int32), np.asarray(rows, np.int32),
                np.asarray(cols, np.int32), r, data,
                nyg, nxg,
            )
            if rc_ != 0:
                raise RuntimeError("native writer submit failed")

    def submit_particles(self, species_states, species_names, step: int) -> None:
        """Enqueue a particle snapshot (`particles_rank_0_step_{s}.h5`, one
        group per species with live-compacted 1-D x/y/px/py/pz/w datasets —
        schema shared with io.hdf5.save_particles).  Copy + enqueue; returns
        immediately."""
        bufs, counts = [], []
        for p in species_states:
            w = np.asarray(p.w, np.float64).ravel()
            live = w > 0
            counts.append(int(live.sum()))
            for comp in (p.x, p.y, p.px, p.py, p.pz, p.w):
                bufs.append(np.asarray(comp, np.float64).ravel()[live])
        data = np.ascontiguousarray(np.concatenate(bufs) if bufs else np.zeros(0))
        names = (ctypes.c_char_p * len(species_names))(
            *(n.encode() for n in species_names)
        )
        path = os.path.join(self.folder, f"particles_rank_0_step_{step}.h5")
        rc_ = self.lib.mpw_submit_particles(
            path.encode(), len(species_names), names,
            np.asarray(counts, np.int64), data,
        )
        if rc_ != 0:
            raise RuntimeError("native writer particle submit failed")

    def flush(self) -> int:
        """Wait for the queue to drain; returns the number of failed files."""
        return self.lib.mpw_flush()

    def written(self) -> int:
        return self.lib.mpw_written()
