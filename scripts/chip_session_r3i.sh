#!/bin/bash
# Round-3 chip session, phase 9: the sparse train-step retry after the NA
# permutation became a pure layout transform (HLO 11.3 MB -> 2.3 MB at
# 42k: the O(S) perm/inv index constants were what killed the remote
# compile helper). Also re-times the sparse forward to confirm the
# reshape/pad/transpose path did not regress vs the gather path.
set -u
mkdir -p /tmp/chip_r3i
cd /root/repo

waited=0
while [ ! -f /tmp/chip_r3h/session.log ] || ! grep -q "phase 8 complete" /tmp/chip_r3h/session.log; do
  if [ "$waited" -ge 120 ]; then
    echo "=== phase-8 wait timed out after 2h; proceeding ($(date))" >> /tmp/chip_r3i/session.log
    break
  fi
  sleep 60
  waited=$((waited + 1))
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a /tmp/chip_r3i/session.log
  timeout "$CHIP_STEP_TIMEOUT" "$@" > "/tmp/chip_r3i/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date))" | tee -a /tmp/chip_r3i/session.log
  tail -8 "/tmp/chip_r3i/$name.log" | tee -a /tmp/chip_r3i/session.log
}

CHIP_STEP_TIMEOUT=${CHIP_STEP_TIMEOUT:-4000}

# perf sanity: sparse single forward through the new layout transform
run single_sparse_relayout python scripts/full_scale_probe.py single 7
# the VERDICT #3 target: full-scale sparse training step
run train_sparse_42k_scan python scripts/train_step_bench.py seq42240 block --sparse --scan
run train_sparse_84k_scan python scripts/train_step_bench.py seq84480 block --sparse --scan
run train_84k_lora_sparse_scan python scripts/train_step_bench.py seq84480 block --sparse --scan --lora
run train_42k_lora_sparse_scan python scripts/train_step_bench.py seq42240 block --sparse --scan --lora

echo "=== chip session phase 9 complete ($(date))" | tee -a /tmp/chip_r3i/session.log
