"""Fused Pallas kernel vs the XLA chunk-scan path — must agree on the same
data (interpret mode on CPU; the real-TPU run is exercised by bench.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minipic_tpu.core.config import Deck, SpeciesSpec
from minipic_tpu.core.state import FieldState
from minipic_tpu.particles.species import load_species
from minipic_tpu.simulation import Simulation, _tile_origins, advance_species_tiles


def _fixture(order=1, ppc=4, kchunk=32, guard=2):
    deck = Deck(
        box_x=4.0, box_y=4.0, nx=32, ny=32, tile_nx=8, tile_ny=8, guard=guard,
        species=(SpeciesSpec("e", -1.0, 1.0, ppc=ppc, ux=0.2, uth=0.1,
                             shape_order=order),),
        precision="f32", kchunk=kchunk,
    )
    tiling = deck.tiling
    cap = deck.capacity()
    q = kchunk if kchunk > 0 else 128
    if cap % q:
        cap = -(-cap // q) * q
    key = jax.random.PRNGKey(3)
    p = load_species(deck.species[0], deck.domain, tiling, cap, key, jnp.float32)
    # Nontrivial fields
    ky_ = 2 * np.pi / deck.box_y
    ftiles_src = Simulation(deck)  # reuse its field padding machinery
    from minipic_tpu.fields import init as finit
    from minipic_tpu.fields.halo import pad_fields_periodic
    from minipic_tpu.fields.tiles import extract_field_tiles

    f = finit.oblique_wave(deck.domain, amplitude=0.3, dtype=jnp.float32)
    fpad = pad_fields_periodic(f, deck.guard)
    ftiles = extract_field_tiles(
        fpad, tiling.tile_rows, tiling.tile_cols, tiling.tile_ny, tiling.tile_nx, deck.guard
    )
    return deck, tiling, p, ftiles


@pytest.mark.parametrize("order,guard,kchunk",
                         [(1, 2, 32), (2, 2, 32), (1, 4, 32), (2, 4, 32),
                          (1, 4, 0)])
def test_pallas_matches_xla_path(order, guard, kchunk):
    # guard=4 -> nyg=16: exercises the fused single-dot (word-split)
    # gather; guard=2 -> nyg=12: the split path; kchunk=0: whole-bucket
    # chunks (one kernel invocation per tile).
    deck, tiling, p, ftiles = _fixture(order=order, guard=guard, kchunk=kchunk)
    kw = dict(
        qm=-1.0, q=-1.0, order=order,
        tile_ny=tiling.tile_ny, tile_nx=tiling.tile_nx,
        origins=_tile_origins(tiling, jnp.float32),
        g=deck.guard, dt=deck.dt, dx=deck.dx, dy=deck.dy, kchunk=deck.kchunk,
    )
    p_x, (jx_x, jy_x, jz_x) = advance_species_tiles(p, ftiles, backend="xla", **kw)
    p_p, (jx_p, jy_p, jz_p) = advance_species_tiles(
        p, ftiles, backend="pallas", interpret=True, **kw
    )

    alive = np.asarray(p.w) > 0
    for name in ("x", "y", "px", "py", "pz"):
        a = np.where(alive, np.asarray(getattr(p_x, name)), 0)
        b = np.where(alive, np.asarray(getattr(p_p, name)), 0)
        np.testing.assert_allclose(b, a, rtol=2e-6, atol=2e-6, err_msg=name)
    for name, a, b in (("jx", jx_x, jx_p), ("jy", jy_x, jy_p), ("jz", jz_x, jz_p)):
        scale = max(1e-12, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0, atol=3e-6 * scale, err_msg=name
        )


@pytest.mark.slow
def test_pallas_full_step_two_stream():
    """Full Simulation step with use_pallas='on' (interpreted) conserves
    energy and matches the XLA step's observables."""
    import dataclasses

    deck, *_ = _fixture()[0:1] + ((),) * 0
    deck_p = dataclasses.replace(deck, use_pallas="on")
    deck_x = dataclasses.replace(deck, use_pallas="off")
    sp = Simulation(deck_p, seed=5)
    sx = Simulation(deck_x, seed=5)
    dp = sp.step(3)
    dxg = sx.step(3)
    np.testing.assert_allclose(
        float(dp.field_energy), float(dxg.field_energy), rtol=1e-4, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(dp.kinetic_energy), np.asarray(dxg.kinetic_energy), rtol=1e-5
    )
    assert int(dp.overflow) == 0


def test_body_sub_split_matches_single():
    """body_sub=2 (sub-chunked whole-bucket body, MXU/VPU overlap) is
    numerically identical to the unsplit body."""
    from minipic_tpu.ops.pallas.ppd_kernel import fused_push_deposit

    deck, tiling, p, ftiles = _fixture(order=1, guard=4, kchunk=0)
    cap = p.capacity
    if cap % 256:  # pad bucket to a 256 multiple for the split
        import jax.numpy as jnp
        pad = 256 - cap % 256
        p = type(p)(*(jnp.pad(a, ((0, 0), (0, pad))) for a in p))
        cap = p.capacity
    counts = jnp.max(
        (jnp.arange(cap, dtype=jnp.int32)[None, :] + 1)
        * (p.w > 0).astype(jnp.int32), axis=1)
    kw = dict(
        qm=-1.0, q=-1.0, order=1, tile_ny=tiling.tile_ny,
        tile_nx=tiling.tile_nx, g=deck.guard, dt=deck.dt, dx=deck.dx,
        dy=deck.dy, kc=cap, wrap=(deck.nx, deck.ny),
        grid=(deck.nx, deck.ny), interpret=True,
    )
    p1, (jx1, jy1, jz1) = fused_push_deposit(
        p, ftiles, counts, _tile_origins(tiling, jnp.float32),
        body_sub=1, **kw)
    p2, (jx2, jy2, jz2) = fused_push_deposit(
        p, ftiles, counts, _tile_origins(tiling, jnp.float32),
        body_sub=2, **kw)
    for a, b in zip(tuple(p1), tuple(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in ((jx1, jx2), (jy1, jy2), (jz1, jz2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6)


def test_kernel_disp_matches_momentum_bound():
    """The kernel's in-VMEM displacement watermark equals the momentum-
    derived max displacement (simulation.max_step_displacement)."""
    from minipic_tpu.ops.pallas.ppd_kernel import fused_push_deposit
    from minipic_tpu.simulation import max_step_displacement

    deck, tiling, p, ftiles = _fixture(order=1, guard=4, kchunk=128)
    counts = jnp.max(
        (jnp.arange(p.capacity, dtype=jnp.int32)[None, :] + 1)
        * (p.w > 0).astype(jnp.int32), axis=1)
    p2, _j, disp = fused_push_deposit(
        p, ftiles, counts, _tile_origins(tiling, jnp.float32),
        qm=-1.0, q=-1.0, order=1, tile_ny=tiling.tile_ny,
        tile_nx=tiling.tile_nx, g=deck.guard, dt=deck.dt, dx=deck.dx,
        dy=deck.dy, kc=128, wrap=(deck.nx, deck.ny),
        grid=(deck.nx, deck.ny), return_disp=True, interpret=True,
    )
    ref = max_step_displacement([p2], deck.dt, deck.dx, deck.dy)
    np.testing.assert_allclose(float(disp), float(ref), rtol=1e-5)


def test_qshape_sparse_matches_dense():
    """The sparse 3-row quantized-shape evaluator is bit-identical to the
    dense eval + round/tree/fold it replaces (both stagger classes),
    including half-integer positions and window-interior extremes."""
    from minipic_tpu.ops.pallas.ppd_kernel import (
        _qshape, _qshape_sparse, _shape_vals, qshape_scale,
    )

    nxg, g, order = 16, 4, 2
    S = qshape_scale(order)
    key = jax.random.PRNGKey(7)
    # positions across the valid window interior (support fully inside),
    # plus exact half-integers and near-ulp neighbors of them, plus
    # window-edge positions whose support is truncated by the window
    # (center row at 0 or nxg-1 with a NONZERO off-window outer value —
    # the _edge_fold case; dense folds the off-window share into the
    # center, sparse must reproduce it)
    base = jax.random.uniform(key, (1, 4096), minval=-2.5, maxval=10.5)
    halves = jnp.arange(-2.0, 10.5, 0.5, dtype=jnp.float32)
    adv = jnp.concatenate([halves, jnp.nextafter(halves, 100.0),
                           jnp.nextafter(halves, -100.0)])
    edges = jnp.array([-4.2, -3.9, -3.6, 10.6, 10.8, 11.2, 11.4],
                      jnp.float32)
    x0 = jnp.concatenate([base, adv.reshape(1, -1),
                          edges.reshape(1, -1)], axis=1)
    cx = jnp.arange(nxg, dtype=jnp.float32).reshape(nxg, 1) - g
    for off in (0.0, 0.5):
        u = (x0 - cx) - off if off else x0 - cx
        dense = _qshape(_shape_vals(u, order), u, S)
        sparse = _qshape_sparse(x0, off, nxg, g, S, order)
        np.testing.assert_array_equal(
            np.asarray(sparse), np.asarray(dense), err_msg=f"off={off}")
        # partition of unity in the quantized ring — holds whenever the
        # CENTER row is inside the window (the _edge_fold contract);
        # a center row off the window (x0 below the first cell at
        # off=0.5) keeps only the placed outer value, same as dense.
        c = jnp.floor(x0 + 0.5) if off == 0.0 else jnp.floor(x0)
        cin = ((c + g >= 0) & (c + g <= nxg - 1)).reshape(-1)
        np.testing.assert_array_equal(
            np.asarray(jnp.sum(sparse, axis=0))[np.asarray(cin)],
            np.full(int(cin.sum()), S, np.float32))


@pytest.mark.parametrize("order", [1, 2])
def test_ytree_quant_matches_tree(order):
    """red_mode='ytree' with the quantized gather must produce the same
    forces as the per-component tree.  Regression for the round-4 advisor
    high finding: the dense interleaved quant branch (order-1 + int8)
    applied _qshape's partition fold over all 8*nyg interleaved rows
    (row sum ~8S), silently corrupting every center row by -7S — forces
    were off by hundreds.  The branch now builds the interleaved rows
    from the per-class closed-form fold (_qsparse_vals), which is the
    dense per-class fold for BOTH orders."""
    deck, tiling, p, ftiles = _fixture(order=order, guard=4, kchunk=0)
    kw = dict(
        qm=-1.0, q=-1.0, order=order,
        tile_ny=tiling.tile_ny, tile_nx=tiling.tile_nx,
        origins=_tile_origins(tiling, jnp.float32),
        g=deck.guard, dt=deck.dt, dx=deck.dx, dy=deck.dy,
        kchunk=deck.kchunk, backend="pallas", interpret=True,
        deposit_mode="int8",
        qw0=-deck.dx * deck.dy / deck.species[0].ppc,
    )
    p_t, (jx_t, jy_t, jz_t) = advance_species_tiles(
        p, ftiles, red_mode="tree", **kw)
    p_y, (jx_y, jy_y, jz_y) = advance_species_tiles(
        p, ftiles, red_mode="ytree", **kw)
    alive = np.asarray(p.w) > 0
    for name in ("x", "y", "px", "py", "pz"):
        a = np.where(alive, np.asarray(getattr(p_t, name)), 0)
        b = np.where(alive, np.asarray(getattr(p_y, name)), 0)
        np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-6, err_msg=name)
    for name, a, b in (("jx", jx_t, jx_y), ("jy", jy_t, jy_y),
                       ("jz", jz_t, jz_y)):
        scale = max(1e-12, float(jnp.abs(a).max()))
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=0, atol=3e-6 * scale,
            err_msg=name)


@pytest.mark.parametrize("order", [1, 2])
def test_int8_deposit_continuity_and_amplitude(order):
    """int8 matched-quantization deposit (with its quantized-consistent
    gather): (a) div J == -d rho/dt EXACTLY against rho built from the same
    quantized shapes, (b) the NET current amplitude matches the HIGHEST
    deposit even after a uniform weight rescale (regression: a deck-static
    qw0 deposited 2x beam currents after two_stream's seed halved w — the
    energy 'drift' tracked (beta-1)/beta of the field energy)."""
    from minipic_tpu.particles.deposit import deposit_rho_chunk
    from minipic_tpu.simulation import tile_local_coords

    deck, tiling, p, ftiles = _fixture(order=order, guard=4, kchunk=0)
    # uniform weight rescale, as a seed_state would do
    p = p._replace(w=p.w * 0.5)
    from minipic_tpu.ops.pallas.ppd_kernel import qshape_scale
    S = qshape_scale(order)
    origins = _tile_origins(tiling, jnp.float32)
    kw = dict(
        qm=-1.0, q=-1.0, order=order,
        tile_ny=tiling.tile_ny, tile_nx=tiling.tile_nx, origins=origins,
        g=deck.guard, dt=deck.dt, dx=deck.dx, dy=deck.dy, kchunk=deck.kchunk,
        backend="pallas", interpret=True,
        wrap=(deck.nx, deck.ny), grid=(deck.nx, deck.ny),
        qw0=-deck.dx * deck.dy / deck.species[0].ppc,
    )

    def rho_of(pp):
        xi, eta = tile_local_coords(pp.x, pp.y, origins, tiling.tile_nx,
                                    tiling.tile_ny, (deck.nx, deck.ny))
        return deposit_rho_chunk(xi, eta, pp.w * -1.0, tiling.tile_ny,
                                 tiling.tile_nx, deck.guard, order,
                                 deck.dx, deck.dy, quantize=S)

    rho0 = rho_of(p)
    p8, (jx8, jy8, jz8) = advance_species_tiles(p, ftiles,
                                                deposit_mode="int8", **kw)
    rho1 = rho_of(p8)
    # (a) continuity on the tile windows (no fold needed: every particle
    # stays >1 cell from its window edge in one step, so div J telescopes
    # within the window)
    divx = (jx8 - jnp.concatenate(
        [jnp.zeros_like(jx8[:, :, :1]), jx8[:, :, :-1]], axis=2)) / deck.dx
    divy = (jy8 - jnp.concatenate(
        [jnp.zeros_like(jy8[:, :1, :]), jy8[:, :-1, :]], axis=1)) / deck.dy
    res = (rho1 - rho0) / deck.dt + divx + divy
    scale = float(jnp.max(jnp.abs(rho0))) / deck.dt
    assert float(jnp.max(jnp.abs(res))) < 3e-6 * scale

    # (b) net in-plane flux matches HIGHEST (weights halved!)
    ph, (jxh, jyh, jzh) = advance_species_tiles(p, ftiles,
                                                deposit_mode="highest", **kw)
    sx8, sxh = float(jnp.sum(jx8)), float(jnp.sum(jxh))
    assert abs(sx8 - sxh) < 0.02 * abs(sxh), (sx8, sxh)
    szd = float(jnp.max(jnp.abs(jz8 - jzh)))
    assert szd < 0.05 * max(1e-12, float(jnp.max(jnp.abs(jzh))))


@pytest.mark.parametrize("order", [1, 2])
def test_w_synth_matches_streamed_w(order):
    """int8 w-stream elision (w synthesized in-kernel from the counts
    watermark + the uniform w0 prefetch scalar) must be bit-identical to
    streaming w, on live-compacted buckets — the exact contract the
    periodic drivers gate on."""
    deck, tiling, p, ftiles = _fixture(order=order, guard=4, kchunk=0)
    p = p._replace(w=p.w * 0.5)  # runtime uniform rescale, as a seed would
    kw = dict(
        qm=-1.0, q=-1.0, order=order,
        tile_ny=tiling.tile_ny, tile_nx=tiling.tile_nx,
        origins=_tile_origins(tiling, jnp.float32),
        g=deck.guard, dt=deck.dt, dx=deck.dx, dy=deck.dy,
        kchunk=deck.kchunk, backend="pallas", interpret=True,
        deposit_mode="int8", wrap=(deck.nx, deck.ny),
        grid=(deck.nx, deck.ny),
        qw0=-deck.dx * deck.dy / deck.species[0].ppc,
    )
    p_a, (jx_a, jy_a, jz_a) = advance_species_tiles(
        p, ftiles, w_synth=False, **kw)
    p_b, (jx_b, jy_b, jz_b) = advance_species_tiles(
        p, ftiles, w_synth=True, **kw)
    for name in ("x", "y", "px", "py", "pz", "w"):
        np.testing.assert_array_equal(
            np.asarray(getattr(p_b, name)), np.asarray(getattr(p_a, name)),
            err_msg=name)
    for name, a, b in (("jx", jx_a, jx_b), ("jy", jy_a, jy_b),
                       ("jz", jz_a, jz_b)):
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a),
                                      err_msg=name)
