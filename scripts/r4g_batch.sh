#!/bin/bash
# Round-4 batch, part G — the combined-partition split A/B (a27c006),
# the headline at the new HEAD, an ablation at the EXACT headline kernel
# config (kchunk=0, TSC, int8 — prior ablations ran kchunk=4096), and
# the wakefield artifact rerun with the retrace-aware timing fit
# (52a4096; part F ran the pre-fix script).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}
LOG=docs/R4_BATCH.log
echo "=== r4 batch G $(date -u +%H:%M:%S) commit $(git rev-parse --short HEAD)" >> $LOG

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

run "deal timings combined split" python scripts/exp_deal.py
run "deal timings two-compact split (control)" env MINIPIC_SPLIT_COMBINED=0 python scripts/exp_deal.py
run "bench int8 HEAD (combined split)" python bench.py
run "ablate int8 kchunk=0 order 2 (headline kernel)" env MINIPIC_DEPOSIT_MODE=int8 python scripts/ablate_advance.py --kchunk 0 --order 2
run "wakefield window artifact (retrace-aware fit)" python scripts/wakefield_artifact.py --steps 1500 --fig

echo "=== r4 batch G done $(date -u +%H:%M:%S)" >> $LOG
