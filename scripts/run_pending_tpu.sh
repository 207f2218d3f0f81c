#!/bin/bash
# Pending TPU measurement batch (CLAUDE.md "Pending TPU measurements").
# Run sequentially — the remote-compile relay serializes across processes,
# so parallel runs only queue behind each other. No per-step timeouts: a
# cold relay cache can make the FIRST compile take 5-25 min (known gotcha).
# Usage: scripts/run_pending_tpu.sh [outdir]   (default /tmp/tpu_batch)
set -u
out=${1:-/tmp/tpu_batch}
mkdir -p "$out"
cd "$(dirname "$0")/.."

run() {
  name=$1; shift
  echo "[$(date +%H:%M:%S)] START $name: $*" | tee -a "$out/batch.log"
  "$@" > "$out/$name.log" 2>&1
  echo "[$(date +%H:%M:%S)] DONE  $name (exit $?)" | tee -a "$out/batch.log"
}

# 1. stacked kernel earn-or-retire: stacked vs scan vs d-loop + TPU maxerr
run stacked python scripts/bench_pallas_stacked.py
# 2. eval decomposition at the bench shape (bounds what the kernel can buy)
run profile_eval python scripts/profile_eval_flagship.py
# 3. headline + regression gate + new train-surface baseline (decide the
#    ONLYSP_STACKED flip manually from 1+2 before re-running bench.py)
run bench python bench.py
run zoo_check python bench_zoo.py --check baselines/zoo_r03.json
run zoo_train python bench_zoo.py --train --save baselines/zoo_train_r03.json
echo "[$(date +%H:%M:%S)] BATCH COMPLETE" | tee -a "$out/batch.log"
touch "$out/done"
