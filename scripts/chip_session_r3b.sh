#!/bin/bash
# Round-3 chip session, phase 2 (after chip_session_r3.sh):
#  - tap-decomposed conv GEMM experiments (pure-XLA; overlap-friendly)
#  - measured (not component-sum) dense + sparse full-scale e2e p50 at
#    >=4 steady laps with per-lap times (VERDICT r2 #9)
#  - retry the sparse full-scale 84k-token training step (the remote
#    compile helper 500'd on fwd+bwd at seq>=42k in an earlier session)
set -u
mkdir -p /tmp/chip_r3
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a /tmp/chip_r3/session.log
  timeout "$CHIP_STEP_TIMEOUT" "$@" > "/tmp/chip_r3/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date))" | tee -a /tmp/chip_r3/session.log
  tail -5 "/tmp/chip_r3/$name.log" | tee -a /tmp/chip_r3/session.log
}

CHIP_STEP_TIMEOUT=${CHIP_STEP_TIMEOUT:-7200}

run conv_micro3 python scripts/vae_conv_micro3.py
run convcmp_taps python scripts/vae_bench.py convcmp 1 --taps
run train_sparse_42k python scripts/train_step_bench.py seq42240 --sparse
run train_sparse_84k python scripts/train_step_bench.py seq84480 --sparse
run e2e_sparse_r4 python scripts/e2e_clip_latency.py full --sparse --repeat 4
run e2e_dense_r4 python scripts/e2e_clip_latency.py full --repeat 4

echo "=== chip session phase 2 complete ($(date))" | tee -a /tmp/chip_r3/session.log
