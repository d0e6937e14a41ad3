#!/bin/bash
# Watch the axon TPU tunnel and fire a measurement batch the moment it
# answers (round-3 lesson: the tunnel died 5h into the round and the
# queued batch never ran because the watcher lived only in /tmp).
#
# Usage: bash scripts/tpu_watch.sh [batch-script] [max-probes]
# Probes a tiny matmul in a child process every 3 min; on success, runs
# the batch (default scripts/r3_batch.sh) and exits 0.
set -u
cd /root/repo
BATCH=${1:-scripts/r3_batch.sh}
MAX=${2:-200}
for i in $(seq 1 "$MAX"); do
  if timeout 90 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))" >/dev/null 2>&1; then
    echo "tunnel up at $(date -u +%H:%M:%S) (probe $i)"
    bash "$BATCH"
    echo "batch done at $(date -u +%H:%M:%S)"
    exit 0
  fi
  sleep 180
done
echo "tunnel never came back after $MAX probes"
exit 1
