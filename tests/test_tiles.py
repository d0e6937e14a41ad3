"""Tile window extraction / guard folding correctness.

These replace the reference's sentinel-value communication test
(Important_tests/PIC_2D_Communication_test.cpp:361-618) for the intra-device
tile level: guard regions must hold exactly the neighbor's interior values,
and folding must be the additive adjoint of extraction.
"""
import jax.numpy as jnp
import numpy as np

from minipic_tpu.fields.tiles import extract_tiles, fold_tiles


def _pad_wrap(a, g):
    return jnp.pad(a, g, mode="wrap")


def test_extract_windows_match_naive():
    tr, tc, nyt, nxt, g = 3, 4, 8, 6, 2
    ny, nx = tr * nyt, tc * nxt
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((ny, nx)))
    t = extract_tiles(_pad_wrap(a, g), tr, tc, nyt, nxt, g)
    assert t.shape == (tr, tc, nyt + 2 * g, nxt + 2 * g)
    ap = np.pad(np.asarray(a), g, mode="wrap")
    for r in (0, 1, tr - 1):
        for c in (0, 2, tc - 1):
            want = ap[r * nyt : r * nyt + nyt + 2 * g, c * nxt : c * nxt + nxt + 2 * g]
            np.testing.assert_array_equal(np.asarray(t[r, c]), want)


def test_extract_guards_hold_neighbor_sentinels():
    # Sentinel pattern from the reference's comm test (:361-364):
    # value = tile_id everywhere in the tile interior; after extraction each
    # guard region must hold the (periodic) neighbor's id.
    tr, tc, nyt, nxt, g = 3, 3, 6, 6, 2
    ids = jnp.arange(tr * tc, dtype=jnp.float64).reshape(tr, tc)
    a = jnp.kron(ids, jnp.ones((nyt, nxt)))
    t = np.asarray(extract_tiles(_pad_wrap(a, g), tr, tc, nyt, nxt, g))
    for r in range(tr):
        for c in range(tc):
            w = t[r, c]
            # 8 directions (reference dRow/dCol tables)
            assert (w[g:-g, :g] == ids[r, (c - 1) % tc]).all()  # L
            assert (w[g:-g, -g:] == ids[r, (c + 1) % tc]).all()  # R
            assert (w[:g, g:-g] == ids[(r - 1) % tr, c]).all()  # U
            assert (w[-g:, g:-g] == ids[(r + 1) % tr, c]).all()  # D
            assert (w[:g, :g] == ids[(r - 1) % tr, (c - 1) % tc]).all()  # UL
            assert (w[:g, -g:] == ids[(r - 1) % tr, (c + 1) % tc]).all()  # UR
            assert (w[-g:, :g] == ids[(r + 1) % tr, (c - 1) % tc]).all()  # DL
            assert (w[-g:, -g:] == ids[(r + 1) % tr, (c + 1) % tc]).all()  # DR


def test_fold_is_adjoint_of_extract():
    """<extract(P), T> == <P, fold(T)> for random P, T — the defining
    property of a correct additive fold (guarantees every deposited guard
    value lands exactly once in the right place)."""
    tr, tc, nyt, nxt, g = 2, 3, 8, 6, 2
    ny, nx = tr * nyt, tc * nxt
    rng = np.random.default_rng(1)
    p = jnp.asarray(rng.standard_normal((ny + 2 * g, nx + 2 * g)))
    t = jnp.asarray(rng.standard_normal((tr, tc, nyt + 2 * g, nxt + 2 * g)))
    lhs = float(jnp.vdot(extract_tiles(p, tr, tc, nyt, nxt, g), t))
    rhs = float(jnp.vdot(p, fold_tiles(t, nyt, nxt, g)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-12)


def test_fold_constant_tiles_counts_overlaps():
    tr, tc, nyt, nxt, g = 2, 2, 6, 6, 1
    t = jnp.ones((tr, tc, nyt + 2 * g, nxt + 2 * g))
    p = np.asarray(fold_tiles(t, nyt, nxt, g))
    assert p.shape == (tr * nyt + 2 * g, tc * nxt + 2 * g)
    # Deep interior cells covered by exactly one window = 1; cells in the
    # 2g-wide seam between windows = 2; seam crossings = 4.
    assert p[g + 2, g + 2] == 1
    assert p[g + 2, nxt] == 2  # x seam between tile cols 0 and 1
    assert p[nyt, nxt] == 4  # corner seam
