#!/bin/bash
# Round-4 batch, part K — kc=1024 probe (capacity 1024-aligned via env;
# VMEM-tight: tri+out_row+p_mat ~12 of 16 MB) and the headline at the
# 100-step window (re-bin quantization noise halved).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}
LOG=docs/R4_BATCH.log
echo "=== r4 batch K $(date -u +%H:%M:%S) commit $(git rev-parse --short HEAD)" >> $LOG

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

run "deal kc=1024" env MINIPIC_SPLIT_KC=1024 python scripts/exp_deal.py
run "bench int8 100-step window" python bench.py
run "bench int8 kc=1024" env MINIPIC_SPLIT_KC=1024 python bench.py

echo "=== r4 batch K done $(date -u +%H:%M:%S)" >> $LOG
