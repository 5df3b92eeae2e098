#!/bin/bash
# Round-3 chip session, phase 14: the largest-FITTING trainable geometry
# through the uniform scan (phase 13 proved the helper now compiles
# sparse >= 42k; full fine-tune OOMs HBM there, so LoRA rows are the
# frontier). Chains on phase 13.
set -u
mkdir -p /tmp/chip_r3n
cd /root/repo

waited=0
while [ ! -f /tmp/chip_r3m/session.log ] || ! grep -q "phase 13 complete" /tmp/chip_r3m/session.log; do
  if [ "$waited" -ge 120 ]; then
    echo "=== phase-13 wait timed out after 2h; proceeding ($(date))" >> /tmp/chip_r3n/session.log
    break
  fi
  sleep 60
  waited=$((waited + 1))
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a /tmp/chip_r3n/session.log
  timeout "$CHIP_STEP_TIMEOUT" "$@" > "/tmp/chip_r3n/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date))" | tee -a /tmp/chip_r3n/session.log
  tail -8 "/tmp/chip_r3n/$name.log" | tee -a /tmp/chip_r3n/session.log
}

CHIP_STEP_TIMEOUT=${CHIP_STEP_TIMEOUT:-4000}

run train_sparse_42k_uniform_lora python scripts/train_step_bench.py seq42240 block --sparse --uniform --lora
run train_dense_42k_lora_scan_uniform python scripts/train_step_bench.py seq42240 block --uniform --lora

echo "=== chip session phase 14 complete ($(date))" | tee -a /tmp/chip_r3n/session.log
