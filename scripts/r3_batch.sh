#!/bin/bash
# Round-3 TPU measurement batch — run sequentially (never interleave two
# device-heavy processes over the axon tunnel).  Each stage appends to
# docs/R3_BATCH.log; safe to re-run (stages are independent).
set -u
cd /root/repo
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=docs/R3_BATCH.log
echo "=== r3 batch $(date -u +%H:%M:%S) commit $(git rev-parse --short HEAD)" >> $LOG

run() {
  echo "--- $1" >> $LOG
  shift
  timeout 2400 "$@" >> $LOG 2>&1
  echo "--- exit $?" >> $LOG
  sleep 20
}

# 0. Re-certify the int8 energy acceptance at the corrected S = 83
#    (the S = 84 run in docs/energy_tpu_10k_int8q.json predates the
#    int8-range fix; physically equivalent, but the artifact must match
#    the shipped code).
run "energy int8 S=83" env MINIPIC_DEPOSIT_MODE=int8 python scripts/energy_probe.py --order 2 --uth 0.05 --guard 4 --json-out docs/energy_tpu_10k_int8q.json

# 1. Headline bench: int8 (the new default) and the f32 comparison.
run "bench int8 (headline)" python bench.py
run "bench highest (comparison)" env BENCH_DEPOSIT=highest python bench.py

# 2. Kernel-only timing int8 vs highest + J diff (exp_int8c).
run "kernel timing int8 vs highest" python -c "
import sys; sys.path.insert(0, '/root/repo')
import scripts.exp_int8c as m; m.bench_timing()"

# 3. Re-bin kernels: wsplit bf16-words vs int8 byte transport, kc 256/128.
run "deal-route timings wsplit=1" env MINIPIC_REBIN_WSPLIT=1 python scripts/exp_deal.py
run "deal-route timings wsplit=int8" env MINIPIC_REBIN_WSPLIT=int8 python scripts/exp_deal.py

# 4. Tile-size sweep for the ROADMAP cliff table (perf only, 2e7
#    particles to keep compiles fast; guard fixed where possible).
run "tile sweep 8/4" env BENCH_TILE=8 BENCH_GUARD=4 BENCH_PARTICLES=2e7 python bench.py
run "tile sweep 16/4" env BENCH_TILE=16 BENCH_GUARD=4 BENCH_PARTICLES=2e7 python bench.py
run "tile sweep 32/4" env BENCH_TILE=32 BENCH_GUARD=4 BENCH_PARTICLES=2e7 python bench.py
run "tile sweep 16/8" env BENCH_TILE=16 BENCH_GUARD=8 BENCH_PARTICLES=2e7 python bench.py

# 4b. Stage ablation under the int8 deposit (new budget table).
run "ablate int8" env MINIPIC_DEPOSIT_MODE=int8 python scripts/ablate_advance.py

# 5. VPU microbenchmark: bf16 vs f32 elementwise throughput, then the
#    in-kernel bf16-eval knob (pays only if the probe shows ~2x).
run "vpu bf16 probe" python scripts/exp_vpu.py
run "kernel timing int8 + bf16 evals" env MINIPIC_QEVAL=bf16 python -c "
import sys; sys.path.insert(0, '/root/repo')
import scripts.exp_int8c as m; m.bench_timing()"
run "energy int8 + bf16 evals" env MINIPIC_DEPOSIT_MODE=int8 MINIPIC_QEVAL=bf16 python scripts/energy_probe.py --order 2 --uth 0.05 --guard 4

echo "=== r3 batch done $(date -u +%H:%M:%S)" >> $LOG
