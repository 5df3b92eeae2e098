#!/bin/bash
# Round-3 chip session, phase 11: largest-trainable-geometry rows that the
# helper CAN compile. Dense scan train compiles at 42k (OOMs only for the
# full-fine-tune grad tree), so LoRA (no 3.9 GiB grads) may fit at 42k and
# maybe 84k — that would be a measured full-scale single-chip training
# step via the dense path. Plus sparse LoRA at 8320 (sparse full FT OOMs).
set -u
mkdir -p /tmp/chip_r3k
cd /root/repo

waited=0
while [ ! -f /tmp/chip_r3j/session.log ] || ! grep -q "phase 10 complete" /tmp/chip_r3j/session.log; do
  if [ "$waited" -ge 120 ]; then
    echo "=== phase-10 wait timed out after 2h; proceeding ($(date))" >> /tmp/chip_r3k/session.log
    break
  fi
  sleep 60
  waited=$((waited + 1))
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a /tmp/chip_r3k/session.log
  timeout "$CHIP_STEP_TIMEOUT" "$@" > "/tmp/chip_r3k/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date))" | tee -a /tmp/chip_r3k/session.log
  tail -8 "/tmp/chip_r3k/$name.log" | tee -a /tmp/chip_r3k/session.log
}

CHIP_STEP_TIMEOUT=${CHIP_STEP_TIMEOUT:-4000}

run train_dense_42k_lora_scan python scripts/train_step_bench.py seq42240 block --lora --scan
run train_dense_84k_lora_scan python scripts/train_step_bench.py seq84480 block --lora --scan
run train_sparse_8320_lora_scan python scripts/train_step_bench.py seq8320 block --sparse --lora --scan

echo "=== chip session phase 11 complete ($(date))" | tee -a /tmp/chip_r3k/session.log
