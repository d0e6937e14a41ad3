#!/bin/bash
# Round-5 batch B — acceptance + product tables at the round-5 defaults:
# 10k energy acceptance (shipped kernel, w_synth on), the words=2 A/B
# acceptance, the per-deck throughput table (VERDICT item 4), and the
# wakefield shift-overhead re-measure (item 2's wakefield leg).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}
LOG=docs/R5_BATCH.log
echo "=== r5 batch B $(date -u +%H:%M:%S) commit $(git rev-parse --short HEAD)" >> $LOG

probe() {
  timeout 240 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))" > /dev/null 2>&1
}

run() {
  echo "--- $1 $(date -u +%H:%M:%S)" >> $LOG
  if ! probe; then
    echo "--- SKIPPED: backend probe failed (240s)" >> $LOG
    return 1
  fi
  shift
  timeout 3000 "$@" >> $LOG 2>&1
  echo "--- exit $?" >> $LOG
  sleep 20
}

# 1. 10k energy acceptance at the SHIPPED round-5 kernel (int8 TSC,
#    w_synth on) — re-certifies docs/energy_tpu_10k_int8q.json.
run "energy 10k int8 TSC (shipped)" python scripts/energy_probe.py \
  --order 2 --uth 0.05 --json-out docs/energy_tpu_10k_int8q.json

# 2. Same at the 2-word quant gather (candidate knob).
run "energy 10k int8 TSC words=2" env MINIPIC_GATHER_WORDS=2 \
  python scripts/energy_probe.py --order 2 --uth 0.05 \
  --json-out docs/energy_tpu_10k_int8q_w2.json

# 3. Per-deck throughput table at the new deck defaults.
run "bench_decks" python scripts/bench_decks.py --steps 30

# 4. Wakefield moving-window cost (base vs shift steps).
run "wakefield window" python scripts/wakefield_artifact.py

echo "=== r5 batch B done $(date -u +%H:%M:%S)" >> $LOG
