#!/bin/bash
# Round-4 batch, part C — (a) the part-B stages spuriously skipped by the
# 90 s probe (a healthy tunnel takes ~37 s to init the backend when idle,
# more under load: docs/R4_BATCH.log), (b) fresh headline + kernel
# measurements at the sparse-qshape + int8-K-fold commit.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}
LOG=docs/R4_BATCH.log
echo "=== r4 batch C $(date -u +%H:%M:%S) commit $(git rev-parse --short HEAD)" >> $LOG

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

# 1. Headline at the new kernel (sparse qshape + int8 K-fold).
run "bench int8 sparse+kfold (headline)" python bench.py
run "kernel timing int8 sparse+kfold" python -c "
import sys, os; sys.path.insert(0, os.getcwd())
import scripts.exp_int8c as m; m.bench_timing()"

# 2. Energy re-cert at the new kernel (bit-identical by construction +
#    test, but the acceptance artifact should match the shipped code).
run "energy int8 sparse+kfold" env MINIPIC_DEPOSIT_MODE=int8 python scripts/energy_probe.py --order 2 --uth 0.05 --guard 4 --json-out docs/energy_tpu_10k_int8q.json

# 3. Ablation at the HEADLINE config (order 2; part A/B ran the script's
#    old default order=1).
run "ablate int8 order2" env MINIPIC_DEPOSIT_MODE=int8 python scripts/ablate_advance.py --order 2

# 4. Part-B skipped stages.
run "bench decks" python scripts/bench_decks.py
run "wakefield window artifact" python scripts/wakefield_artifact.py --steps 1500 --fig
run "deal-route timings wsplit=int8" env MINIPIC_REBIN_WSPLIT=int8 python scripts/exp_deal.py
run "deal-route timings wsplit=1" env MINIPIC_REBIN_WSPLIT=1 python scripts/exp_deal.py
run "tile sweep 8/4" env BENCH_TILE=8 BENCH_GUARD=4 BENCH_PARTICLES=2e7 python bench.py
run "tile sweep 32/4" env BENCH_TILE=32 BENCH_GUARD=4 BENCH_PARTICLES=2e7 python bench.py
run "tile sweep 16/8" env BENCH_TILE=16 BENCH_GUARD=8 BENCH_PARTICLES=2e7 python bench.py

echo "=== r4 batch C done $(date -u +%H:%M:%S)" >> $LOG
