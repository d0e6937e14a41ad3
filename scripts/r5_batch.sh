#!/bin/bash
# Round-5 batch A — advance-kernel levers (VERDICT round-5 item 1),
# deal-route segment kc=512 (item 3), and the post-change baselines.
# Run from a worktree; every stage gated by a 240s probe (memory:
# tpu-minipic-workflow).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=$PWD:${PYTHONPATH:-}
LOG=docs/R5_BATCH.log
echo "=== r5 batch A $(date -u +%H:%M:%S) commit $(git rev-parse --short HEAD)" >> $LOG

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

AB="python scripts/ablate_advance.py --kchunk 0 --order 2 --quick"

# 1. Kernel standalone A/Bs at the headline config (int8+quant).
run "kernel base (w stream, words=3)" env MINIPIC_DEPOSIT_MODE=int8 $AB
run "kernel wsynth" env MINIPIC_DEPOSIT_MODE=int8 $AB --wsynth
run "kernel wsynth words=2" env MINIPIC_DEPOSIT_MODE=int8 MINIPIC_GATHER_WORDS=2 $AB --wsynth
run "kernel wsynth tpb=2" env MINIPIC_DEPOSIT_MODE=int8 $AB --wsynth --tpb 2
run "kernel wsynth tpb=4" env MINIPIC_DEPOSIT_MODE=int8 $AB --wsynth --tpb 4

# 2. Deal-route segment chunk A/B (fc-decoupled kc=512 vs round-4 kc=256).
run "deal seg kc=512 (new default)" python scripts/exp_deal.py
run "deal seg kc=256 (r4 geometry)" env MINIPIC_SEG_KC=256 python scripts/exp_deal.py

# 3. Integrated step budget at committed defaults (w_synth on).
run "perf_probe defaults" python scripts/perf_probe.py
run "perf_probe w_synth OFF" env MINIPIC_W_SYNTH=0 python scripts/perf_probe.py

# 4. Headline.
run "bench 100-step window" python bench.py

echo "=== r5 batch A done $(date -u +%H:%M:%S)" >> $LOG
