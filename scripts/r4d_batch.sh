#!/bin/bash
# Round-4 batch, part D — step-budget attribution at the HEADLINE config
# (perf_probe defaults now mirror bench.py: 8x8/guard4/kchunk0/TSC/int8).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}
LOG=docs/R4_BATCH.log
echo "=== r4 batch D $(date -u +%H:%M:%S) commit $(git rev-parse --short HEAD)" >> $LOG

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

run "perf probe headline int8" python scripts/perf_probe.py
run "perf probe highest" python scripts/perf_probe.py --deposit highest

echo "=== r4 batch D done $(date -u +%H:%M:%S)" >> $LOG
