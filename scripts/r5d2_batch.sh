#!/bin/bash
# Round-5 batch D2 — rerun of the batch-D legs that raced the
# transposed-nbr SMEM fix (the D legs loaded the pre-fix module).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}
LOG=docs/R5_BATCH.log
echo "=== r5 batch D2 $(date -u +%H:%M:%S) commit $(git rev-parse --short HEAD)" >> $LOG

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

run "fused on-chip gate (transposed nbr)" python scripts/exp_fused_onchip.py
run "exp_deal (fused timing, SMEM fix)" python scripts/exp_deal.py
run "perf_probe fused=1" env MINIPIC_APPEND_FUSED=1 python scripts/perf_probe.py
run "bench fused=1" env MINIPIC_APPEND_FUSED=1 python bench.py
run "bench fused=0 (control)" python bench.py

echo "=== r5 batch D2 done $(date -u +%H:%M:%S)" >> $LOG
