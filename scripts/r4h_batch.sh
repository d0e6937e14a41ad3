#!/bin/bash
# Round-4 batch, part H — split chunk-size re-sweep under the combined
# partition + int8 transport (the kc=256 choice predates both), and the
# headline at HEAD (dead-chunk gate + best kc).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}
LOG=docs/R4_BATCH.log
echo "=== r4 batch H $(date -u +%H:%M:%S) commit $(git rev-parse --short HEAD)" >> $LOG

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
  timeout 2400 "$@" >> $LOG 2>&1
  echo "--- exit $?" >> $LOG
  sleep 20
}

run "deal kc=256 (dead-chunk gate)" python scripts/exp_deal.py
run "deal kc=128" env MINIPIC_SPLIT_KC=128 python scripts/exp_deal.py
run "deal kc=512" env MINIPIC_SPLIT_KC=512 python scripts/exp_deal.py
run "bench int8 HEAD kc=256" python bench.py
run "bench int8 HEAD kc=128" env MINIPIC_SPLIT_KC=128 python bench.py

echo "=== r4 batch H done $(date -u +%H:%M:%S)" >> $LOG
