#!/bin/bash
# Round-5 batch A2b — resume of A2 after the 03:44 VM restart.
# Remaining legs: int8 fold sweep + int8-era kchunk re-sweep.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}
LOG=docs/R5_BATCH.log
echo "=== r5 batch A2b $(date -u +%H:%M:%S) commit $(git rev-parse --short HEAD)" >> $LOG

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

AB="python scripts/ablate_advance.py --order 2 --quick --wsynth"

run "int8 fold=1" env MINIPIC_DEPOSIT_MODE=int8 MINIPIC_INT8_FOLD=1 $AB --kchunk 0
run "int8 fold=2" env MINIPIC_DEPOSIT_MODE=int8 MINIPIC_INT8_FOLD=2 $AB --kchunk 0
run "kchunk 14336" env MINIPIC_DEPOSIT_MODE=int8 $AB --kchunk 14336
run "kchunk 7168"  env MINIPIC_DEPOSIT_MODE=int8 $AB --kchunk 7168
run "kchunk 4096"  env MINIPIC_DEPOSIT_MODE=int8 $AB --kchunk 4096

echo "=== r5 batch A2b done $(date -u +%H:%M:%S)" >> $LOG
