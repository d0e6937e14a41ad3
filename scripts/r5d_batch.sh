#!/bin/bash
# Round-5 batch D — fused-append fix validation on the chip:
# * exp_fused_onchip: small/fast Mosaic-legality + bit-equality gate for
#   the [T, 1, cap]-view slab DMA (the batch-C rejection, now fixed)
# * exp_deal: fused vs unfused timing at the bench geometry
# * perf_probe + bench at MINIPIC_APPEND_FUSED=1 (flip decision data)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}
LOG=docs/R5_BATCH.log
echo "=== r5 batch D $(date -u +%H:%M:%S) commit $(git rev-parse --short HEAD)" >> $LOG

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

run "fused on-chip gate (bit-equality)" python scripts/exp_fused_onchip.py
run "exp_deal (fused timing)" python scripts/exp_deal.py
run "perf_probe fused=1" env MINIPIC_APPEND_FUSED=1 python scripts/perf_probe.py
run "bench fused=1" env MINIPIC_APPEND_FUSED=1 python bench.py
run "bench fused=0 (control)" python bench.py

echo "=== r5 batch D done $(date -u +%H:%M:%S)" >> $LOG
