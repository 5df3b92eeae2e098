#!/bin/bash
# Round-3 chip session, phase 4: the phase-3 tail that died with its driver
# session. Only the still-missing measurements:
#  - sparse full-scale training step (block remat only; selective is a known
#    remote-compile-helper HTTP 500 at seq >= 42k)
#  - dense + sparse full-scale e2e p50 at 4 steady laps with per-lap times
set -u
mkdir -p /tmp/chip_r3d
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a /tmp/chip_r3d/session.log
  timeout "$CHIP_STEP_TIMEOUT" "$@" > "/tmp/chip_r3d/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date))" | tee -a /tmp/chip_r3d/session.log
  tail -8 "/tmp/chip_r3d/$name.log" | tee -a /tmp/chip_r3d/session.log
}

CHIP_STEP_TIMEOUT=${CHIP_STEP_TIMEOUT:-9000}

run train_sparse_42k_block python scripts/train_step_bench.py seq42240 block --sparse
run train_sparse_84k_block python scripts/train_step_bench.py seq84480 block --sparse
run e2e_sparse_r4 python scripts/e2e_clip_latency.py full --sparse --repeat 4
run e2e_dense_r4 python scripts/e2e_clip_latency.py full --repeat 4

echo "=== chip session phase 4 complete ($(date))" | tee -a /tmp/chip_r3d/session.log
