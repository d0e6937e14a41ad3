#!/bin/bash
# Round-5 batch C — fused rolls+append validation + headline:
# * exp_deal: append_segments timing + ON-CHIP bit-equality vs the
#   unfused route (ANY-space aliasing semantics only show on hardware)
# * perf_probe at the new defaults (rebin_auto standalone + scan step)
# * bench 100-step headline with the fused append default
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}
LOG=docs/R5_BATCH.log
echo "=== r5 batch C $(date -u +%H:%M:%S) commit $(git rev-parse --short HEAD)" >> $LOG

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

run "rowshape microbench" python scripts/exp_rowshape.py
run "int8 fold=2 (A2b retry)" env MINIPIC_DEPOSIT_MODE=int8 MINIPIC_INT8_FOLD=2 $AB --kchunk 0
run "kchunk 14336 (A2b retry)" env MINIPIC_DEPOSIT_MODE=int8 $AB --kchunk 14336
run "kchunk 7168 (A2b retry)"  env MINIPIC_DEPOSIT_MODE=int8 $AB --kchunk 7168
run "kchunk 4096 (A2b retry)"  env MINIPIC_DEPOSIT_MODE=int8 $AB --kchunk 4096
run "exp_deal fused append" python scripts/exp_deal.py
run "perf_probe fused defaults" python scripts/perf_probe.py
run "bench 100-step fused" python bench.py
run "per-deck table (fast deck defaults)" python scripts/bench_decks.py

echo "=== r5 batch C done $(date -u +%H:%M:%S)" >> $LOG
