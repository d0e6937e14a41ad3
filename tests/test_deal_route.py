"""Deal-route re-binning (segment + static rolls + run-append) vs the
filler-key sort route: both must produce identical buckets.

The deal route (rebin_kernels.segment_movers/_roll_segments/append_runs)
replaces the route sort with per-direction mover segments fetched by
static grid rolls — no sort in the loop (reference analogue: the per-rank
neighbor exchange in /root/reference/PIC_2D.cpp:281-334, redesigned as
dense direction segments instead of per-particle MPI messages).

Also pins the interpret-mode exactness contract: the word-split permute
is a hardware (MXU f32-accumulation) trick; under interpret the kernels
must fall back to f32-HIGHEST so CPU tests are bit-exact (boundary
positions like nextafter(box_edge) round to the edge in bf16 — a w0-only
value would land off-grid and be dropped).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minipic_tpu.core.config import Deck, SpeciesSpec
from minipic_tpu.particles.binning import rebin_auto, wrap_positions
from minipic_tpu.simulation import Simulation


def _blasted_state(grid=32, ppc=12, sigma=0.9, seed=0, headroom=2.5):
    deck = Deck(
        box_x=grid / 10.0, box_y=grid / 10.0, nx=grid, ny=grid,
        tile_nx=8, tile_ny=8, guard=4,
        species=(SpeciesSpec("ele", charge=-1.0, mass=1.0, ppc=ppc,
                             uth=0.05, shape_order=2),),
        precision="f32", capacity_headroom=headroom, kchunk=0,
        mover_capacity=1024,
    )
    sim = Simulation(deck)
    p = sim.state.species[0]
    key = jax.random.PRNGKey(seed)
    dx_ = jax.random.normal(key, p.x.shape, dtype=p.x.dtype) * sigma
    dy_ = jax.random.normal(jax.random.fold_in(key, 1), p.y.shape,
                            dtype=p.y.dtype) * sigma
    p = p._replace(x=jnp.where(p.w > 0, p.x + dx_, p.x),
                   y=jnp.where(p.w > 0, p.y + dy_, p.y))
    p = wrap_positions(p, deck.nx, deck.ny, True)
    return deck, p


def _canon(q):
    """Per-bucket live rows sorted by (x, y, px): order-insensitive."""
    out = []
    for arrs in zip(*(np.asarray(g) for g in q)):
        rows = np.stack(arrs, -1)
        live = rows[rows[:, 5] > 0]
        idx = np.lexsort((live[:, 2], live[:, 1], live[:, 0]))
        out.append(live[idx])
    return out


@pytest.mark.parametrize("seg_cap,seg_kc", [
    (256, "512"),  # fc = gcd(512, 256) = 256 != kc: the decoupled flush
    (384, "512"),  # fc = 128 = kc/4: multi-flush unroll per chunk
    (256, "256"),  # fc == kc: the round-4 single-flush geometry
])
def test_deal_route_matches_sort_route_exactly(seg_cap, seg_kc, monkeypatch):
    monkeypatch.setenv("MINIPIC_SEG_KC", seg_kc)
    deck, p = _blasted_state()
    t = deck.tiling
    mc = deck.mover_cap(p.capacity)
    a, da, _ = rebin_auto(p, t, mc, interpret=True, seg_cap=0)
    b, db, _ = rebin_auto(p, t, mc, interpret=True, seg_cap=seg_cap)
    assert int(da) == 0 and int(db) == 0
    for i, (ra, rb) in enumerate(zip(_canon(a), _canon(b))):
        assert ra.shape == rb.shape, f"bucket {i} count differs"
        np.testing.assert_array_equal(ra, rb, err_msg=f"bucket {i}")


def test_fused_append_segments_bitexact_vs_unfused(monkeypatch):
    """append_segments (fused rolls+append, slab-only bucket DMA) must be
    BIT-equal to _roll_segments + append_runs — same arrival order, same
    watermark slab math, per-slot equality (not just canonical sets)."""
    deck, p = _blasted_state(seed=7)
    t = deck.tiling
    mc = deck.mover_cap(p.capacity)
    monkeypatch.setenv("MINIPIC_APPEND_FUSED", "0")
    a, da, pa = rebin_auto(p, t, mc, interpret=True, seg_cap=256)
    monkeypatch.setenv("MINIPIC_APPEND_FUSED", "1")
    b, db, pb = rebin_auto(p, t, mc, interpret=True, seg_cap=256)
    assert int(da) == int(db) == 0
    assert int(pa) == int(pb)
    for name, ra, rb in zip(a._fields, tuple(a), tuple(b)):
        np.testing.assert_array_equal(
            np.asarray(ra), np.asarray(rb), err_msg=f"channel {name}"
        )


def test_deal_route_boundary_positions_survive():
    """Positions one float below the periodic box edge (which round UP in
    bf16) must come through the deal route bit-exact — regression for the
    interpret-mode word-split fallback."""
    deck, p = _blasted_state(seed=3)
    t = deck.tiling
    edge = np.float32(31.9981689453125)  # bf16(edge) == 32.0, off-grid
    x = np.asarray(p.x).copy()
    y = np.asarray(p.y).copy()
    w = np.asarray(p.w)
    # put a boundary-y mover in tile 0 (tile row 0, so y ~ 32 means the
    # wrap neighbor above)
    slot = int(np.argmax(w[0] > 0))
    x[0, slot] = 3.25
    y[0, slot] = edge
    p = p._replace(x=jnp.asarray(x), y=jnp.asarray(y))
    mc = deck.mover_cap(p.capacity)
    b, db, _ = rebin_auto(p, t, mc, interpret=True, seg_cap=256)
    assert int(db) == 0
    ys = np.concatenate([np.asarray(c) for c in [b.y]], axis=None)
    ws = np.asarray(b.w).ravel()
    live_y = ys[ws > 0]
    assert (live_y < 32.0).all()
    assert np.any(live_y == edge), "boundary particle lost or rounded"


def test_segment_overflow_drops_and_counts():
    """A direction segment smaller than the directional flow drops the
    excess and counts it (segment overflow cannot defer — the movers are
    already out of their buckets).  A 1.5-cell eastward bulk drift makes
    every tile send ~ppc*tile_ny*1.5 particles east — far beyond a
    128-slot segment."""
    deck, p = _blasted_state(ppc=24, sigma=0.0)
    p = p._replace(x=jnp.where(p.w > 0, p.x + 1.5, p.x))
    p = wrap_positions(p, deck.nx, deck.ny, True)
    t = deck.tiling
    mc = deck.mover_cap(p.capacity)
    n0 = int(jnp.sum((p.w > 0).astype(jnp.int32)))
    b, db, _ = rebin_auto(p, t, mc, interpret=True, seg_cap=128)
    n1 = int(jnp.sum((b.w > 0).astype(jnp.int32)))
    assert int(db) > 0
    assert n1 + int(db) == n0  # every missing particle is counted
