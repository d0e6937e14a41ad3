#!/bin/bash
# Round-5 batch E — fused-default close-out:
# * exp_deal with the leak fixes (fused append timing finally lands)
# * per-deck table regen after the laser_plasma geometry revert
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}
LOG=docs/R5_BATCH.log
echo "=== r5 batch E $(date -u +%H:%M:%S) commit $(git rev-parse --short HEAD)" >> $LOG

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

run "exp_deal (leak-fixed, fused timing)" python scripts/exp_deal.py
run "per-deck table (laser_plasma revert)" python scripts/bench_decks.py

echo "=== r5 batch E done $(date -u +%H:%M:%S)" >> $LOG
