#!/bin/bash
# Round-4 batch, part I — split kc=512 headline (deal total 292 vs 348 ms
# at kc=256) and the quant-ytree reduction A/B (1ce34ca).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}
LOG=docs/R4_BATCH.log
echo "=== r4 batch I $(date -u +%H:%M:%S) commit $(git rev-parse --short HEAD)" >> $LOG

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

run "kernel timing ytree" env MINIPIC_RED_MODE=ytree python -c "
import sys, os; sys.path.insert(0, os.getcwd())
import scripts.exp_int8c as m; m.bench_timing()"
run "bench int8 kc=512" env MINIPIC_SPLIT_KC=512 python bench.py
run "bench int8 kc=512 + ytree" env MINIPIC_SPLIT_KC=512 MINIPIC_RED_MODE=ytree python bench.py

echo "=== r4 batch I done $(date -u +%H:%M:%S)" >> $LOG
