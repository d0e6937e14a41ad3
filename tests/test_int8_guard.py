"""Runtime guard for the int8 deposit's uniform-weight contract.

The int8 matched-quantization deposit factors q*max(w) out of the
integer-ring contraction — correct ONLY for uniform live weights.  The
deck-time gate (spec.density is None) cannot see a seed_state that edits
weights per particle; without a runtime census such a run deposits wrong
currents silently while forces stay right (docs/ROADMAP.md round-3
lesson 1 is the motivating incident).  These tests pin the loud path.
"""
import jax.numpy as jnp
import pytest

from minipic_tpu.core.config import Deck, SpeciesSpec
from minipic_tpu.diag.history import RunHistory
from minipic_tpu.simulation import Simulation


def _deck(**kw):
    return Deck(
        box_x=4.0, box_y=4.0, nx=32, ny=32, tile_nx=8, tile_ny=8, guard=4,
        species=(
            SpeciesSpec("ele", charge=-1.0, mass=1.0, ppc=2, uth=0.05,
                        shape_order=2),
        ),
        deposit="int8",
        **kw,
    )


def _corrupt_one_weight(sim):
    """Double the weight of the first live slot of species 0 (a
    seed_state-style per-particle edit the deck gate cannot see)."""
    p = sim.state.species[0]
    i = int(jnp.argmax(p.w[0] > 0))
    w2 = p.w.at[0, i].mul(2.0)
    sim.state = sim.state._replace(
        species=(p._replace(w=w2),) + sim.state.species[1:]
    )


def test_uniform_weights_pass():
    sim = Simulation(_deck())
    diag = sim.step()
    assert int(diag.weight_nonuniform) == 0
    RunHistory().record(1, sim.deck.dt, diag)  # must not raise


def test_nonuniform_weights_flagged_and_record_raises():
    sim = Simulation(_deck())
    _corrupt_one_weight(sim)
    diag = sim.step()
    assert int(diag.weight_nonuniform) == 1
    with pytest.raises(RuntimeError, match="NON-UNIFORM"):
        RunHistory().record(1, sim.deck.dt, diag)


def test_highest_deposit_ignores_weight_spread():
    """Per-particle weights are legal (and correct) on the f32 path."""
    deck = Deck(
        box_x=4.0, box_y=4.0, nx=32, ny=32, tile_nx=8, tile_ny=8, guard=4,
        species=(
            SpeciesSpec("ele", charge=-1.0, mass=1.0, ppc=2, uth=0.05,
                        shape_order=2),
        ),
        deposit="highest",
    )
    sim = Simulation(deck)
    _corrupt_one_weight(sim)
    diag = sim.step()
    assert int(diag.weight_nonuniform) == 0
    RunHistory().record(1, deck.dt, diag)


def test_sharded_guard_catches_cross_shard_spread():
    """Each shard uniform but DIFFERENT across shards: the shard-local
    q*max(w) scale would be wrong on every shard — the guard's reduction
    must be global (pmax/pmin over the mesh axes), not per-shard."""
    from minipic_tpu.parallel.step import ShardedSimulation

    sim = ShardedSimulation(_deck())
    p = sim.state.species[0]
    # Scale ALL weights on the upper half of the tile axis (a contiguous
    # shard block under the mesh layout) — each shard stays uniform.
    t = p.w.shape[0]
    mask = (jnp.arange(t) >= t // 2)[:, None]
    w2 = jnp.where(mask & (p.w > 0), p.w * 2.0, p.w)
    sim.state = sim.state._replace(species=(p._replace(w=w2),))
    diag = sim.step()
    assert int(diag.weight_nonuniform) == 1
