"""Decomposition / topology contract tests (reference Auxiliar_functions.cpp:16-70)."""
import numpy as np
import pytest

from minipic_tpu.core.geometry import D_COL, D_ROW, OPPOSITE, Domain, Tiling, find_best_grid


def test_find_best_grid_matches_reference_cases():
    # findBestGrid (Auxiliar_functions.cpp:16-22): 9 -> 3x3, 4 -> 2x2, 5 -> 1x5, 6 -> 2x3
    assert find_best_grid(9) == (3, 3)
    assert find_best_grid(4) == (2, 2)
    assert find_best_grid(5) == (1, 5)
    assert find_best_grid(6) == (2, 3)
    assert find_best_grid(8) == (2, 4)
    assert find_best_grid(1) == (1, 1)


def test_tile_id_roundtrip():
    t = Tiling(tile_rows=18, tile_cols=18, tile_nx=25, tile_ny=25)
    for row in (0, 5, 17):
        for col in (0, 9, 17):
            gid = t.tile_id(row, col)
            assert t.tile_row_col(gid) == (row, col)


def test_neighbor_wraps_periodically():
    # getNeighborGID with periodic wrap (Auxiliar_functions.cpp:55-65)
    t = Tiling(tile_rows=6, tile_cols=6, tile_nx=10, tile_ny=10)
    corner = t.tile_id(0, 0)
    # Up-left of the (0,0) tile wraps to (5,5)
    assert t.neighbor_id(corner, -1, -1) == t.tile_id(5, 5)
    assert t.neighbor_id(corner, 0, -1) == t.tile_id(0, 5)
    assert t.neighbor_id(t.tile_id(5, 5), 1, 1) == corner


def test_opposite_table_is_involution():
    # opposite[] (Auxiliar_functions.h:13) pairs each direction with its reverse
    for d in range(8):
        assert OPPOSITE[OPPOSITE[d]] == d
        assert D_ROW[OPPOSITE[d]] == -D_ROW[d]
        assert D_COL[OPPOSITE[d]] == -D_COL[d]


def test_tile_of_position():
    t = Tiling(tile_rows=4, tile_cols=6, tile_nx=10, tile_ny=8)
    assert t.tile_of_position(np.float64(0.5), np.float64(0.5)) == 0
    assert t.tile_of_position(np.float64(15.0), np.float64(9.0)) == t.tile_id(1, 1)
    # wraps out-of-box coordinates periodically
    assert t.tile_of_position(np.float64(60.0), np.float64(0.0)) == 0


def test_domain_dt_courant_matches_reference_value():
    # Canonical config (PIC_2D.cpp:57-74): box 10x10, 450x450 -> dt=0.00785674
    d = Domain(10.0, 10.0, 450, 450)
    assert 0.5 * d.dt_courant() == pytest.approx(0.00785674, abs=1e-8)


def test_tiling_divisibility_enforced():
    with pytest.raises(ValueError):
        Tiling.for_domain(Domain(10.0, 10.0, 450, 450), 26, 25)
