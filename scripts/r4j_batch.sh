#!/bin/bash
# Round-4 batch, part J — acceptance artifacts at the FINAL defaults
# (kc=512 combined split): headline bench as committed (no env), the 10k
# energy acceptance at the same defaults, the step-budget probe, and the
# per-deck table refresh.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}
LOG=docs/R4_BATCH.log
echo "=== r4 batch J $(date -u +%H:%M:%S) commit $(git rev-parse --short HEAD)" >> $LOG

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

run "bench int8 FINAL defaults" python bench.py
run "energy int8 10k FINAL defaults" env MINIPIC_DEPOSIT_MODE=int8 python scripts/energy_probe.py --order 2 --uth 0.05 --guard 4 --json-out docs/energy_tpu_10k_int8q.json
run "perf probe FINAL defaults" python scripts/perf_probe.py
run "bench decks FINAL" python scripts/bench_decks.py

echo "=== r4 batch J done $(date -u +%H:%M:%S)" >> $LOG
