"""ON-CHIP bit-equality check for the fused deal-route append.

append_segments' slab DMA semantics (ANY-space aliasing, lane-sliced
[T, 1, cap] view) only exist on real hardware — interpret mode neither
models the (8,128) tiling legality nor the in-place aliasing, which is
how the round-5 batch-C Mosaic rejection shipped (docs/R5_BATCH.log).
This is the small/fast hardware gate: a blasted 32x32 state re-binned
through the sort route, the unfused deal route, and the fused deal
route, all on the TPU, compared per-slot (fused vs unfused must be
BIT-equal; sort route equal as canonical sets).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from tests.test_deal_route import _blasted_state, _canon
from minipic_tpu.particles.binning import rebin_auto


def main():
    print("backend:", jax.default_backend(), flush=True)
    deck, p = _blasted_state(seed=7)
    t = deck.tiling
    mc = deck.mover_cap(p.capacity)

    os.environ["MINIPIC_APPEND_FUSED"] = "0"
    a, da, pa = rebin_auto(p, t, mc, interpret=False, seg_cap=256)
    a = jax.tree.map(np.asarray, a)
    os.environ["MINIPIC_APPEND_FUSED"] = "1"
    b, db, pb = rebin_auto(p, t, mc, interpret=False, seg_cap=256)
    b = jax.tree.map(np.asarray, b)
    s, ds, _ = rebin_auto(p, t, mc, interpret=False, seg_cap=0)
    s = jax.tree.map(np.asarray, s)

    assert int(da) == int(db) == int(ds) == 0, (int(da), int(db), int(ds))
    assert int(pa) == int(pb)
    for name, ra, rb in zip(a._fields, tuple(a), tuple(b)):
        np.testing.assert_array_equal(ra, rb, err_msg=f"channel {name}")
    print("fused == unfused: BIT-EQUAL (on chip)", flush=True)
    for i, (rs, rb) in enumerate(zip(_canon(s), _canon(b))):
        assert rs.shape == rb.shape, f"bucket {i} count differs"
        np.testing.assert_array_equal(rs, rb, err_msg=f"bucket {i}")
    print("fused == sort route: canonical sets equal (on chip)", flush=True)


if __name__ == "__main__":
    main()
