#!/bin/bash
# Round-3 chip session, phase 3: the phase-2 measurement list re-run after
# the VM restart wiped /tmp (the phase-2 scripts landed but only bench.py +
# the DMD2 e2e completed before the session died).
#  - taps conv backend vs XLA per-chunk AND whole-clip overlapped decode
#  - tap-GEMM micro experiments (vae_conv_micro3)
#  - sparse full-scale (84k/42k token) training step retry
#  - dense + sparse full-scale e2e p50 at >=4 steady laps with per-lap times
set -u
mkdir -p /tmp/chip_r3c
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a /tmp/chip_r3c/session.log
  timeout "$CHIP_STEP_TIMEOUT" "$@" > "/tmp/chip_r3c/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date))" | tee -a /tmp/chip_r3c/session.log
  tail -8 "/tmp/chip_r3c/$name.log" | tee -a /tmp/chip_r3c/session.log
}

CHIP_STEP_TIMEOUT=${CHIP_STEP_TIMEOUT:-9000}

run convcmp_taps python scripts/vae_bench.py convcmp 1 --taps
run conv_micro3 python scripts/vae_conv_micro3.py
run train_sparse_42k python scripts/train_step_bench.py seq42240 --sparse
run train_sparse_84k python scripts/train_step_bench.py seq84480 --sparse
run e2e_sparse_r4 python scripts/e2e_clip_latency.py full --sparse --repeat 4
run e2e_dense_r4 python scripts/e2e_clip_latency.py full --repeat 4

echo "=== chip session phase 3 complete ($(date))" | tee -a /tmp/chip_r3c/session.log
