#!/bin/bash
# Round-5 batch A2 — follow-ups the A results inform:
# * int8 deposit K-fold sweep (operand-build vs MXU-pass trade)
# * kchunk re-sweep at the INT8 kernel: whole-bucket won in round 2 on
#   the f32 kernel, but its ~11 MB VMEM intermediates squeeze out input
#   double-buffering — chunked pipelining may now win (the 40 ms
#   ablate-everything floor vs the 12.9 ms 11-stream copy bound).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}
LOG=docs/R5_BATCH.log
echo "=== r5 batch A2 $(date -u +%H:%M:%S) commit $(git rev-parse --short HEAD)" >> $LOG

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

run "wsynth words=2 (batch-A retry)" env MINIPIC_DEPOSIT_MODE=int8 MINIPIC_GATHER_WORDS=2 $AB --kchunk 0
run "int8 fold=1" env MINIPIC_DEPOSIT_MODE=int8 MINIPIC_INT8_FOLD=1 $AB --kchunk 0
run "int8 fold=2" env MINIPIC_DEPOSIT_MODE=int8 MINIPIC_INT8_FOLD=2 $AB --kchunk 0
run "kchunk 14336" env MINIPIC_DEPOSIT_MODE=int8 $AB --kchunk 14336
run "kchunk 7168"  env MINIPIC_DEPOSIT_MODE=int8 $AB --kchunk 7168
run "kchunk 4096"  env MINIPIC_DEPOSIT_MODE=int8 $AB --kchunk 4096

echo "=== r5 batch A2 done $(date -u +%H:%M:%S)" >> $LOG
