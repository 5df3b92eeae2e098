#!/bin/bash
# Round-3 chip session, phase 12: bracket the helper's fwd+bwd compile
# limit and measure the PRODUCTION training geometry — the per-chip
# share of the full-scale 84k-token clip under context parallelism
# (84480/cp: 21120 at cp=4, 16640 ~ cp=5). Nothing >= 42k has ever
# compiled through the helper (dense full-FT fails its compile-time
# memory check; everything else dies in backend compile), so the
# single-chip 84k row is environment-blocked; the cp-share rows are the
# numbers a real multi-chip run would see per chip.
set -u
mkdir -p /tmp/chip_r3l
cd /root/repo

waited=0
while [ ! -f /tmp/chip_r3k/session.log ] || ! grep -q "phase 11 complete" /tmp/chip_r3k/session.log; do
  if [ "$waited" -ge 120 ]; then
    echo "=== phase-11 wait timed out after 2h; proceeding ($(date))" >> /tmp/chip_r3l/session.log
    break
  fi
  sleep 60
  waited=$((waited + 1))
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a /tmp/chip_r3l/session.log
  timeout "$CHIP_STEP_TIMEOUT" "$@" > "/tmp/chip_r3l/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date))" | tee -a /tmp/chip_r3l/session.log
  tail -8 "/tmp/chip_r3l/$name.log" | tee -a /tmp/chip_r3l/session.log
}

CHIP_STEP_TIMEOUT=${CHIP_STEP_TIMEOUT:-4000}

# cp=4 per-chip share of the full-scale clip (45f 512x832-equivalent seq)
run train_sparse_21k_lora_scan python scripts/train_step_bench.py seq21120 block --sparse --lora --scan
run train_sparse_21k_full_scan python scripts/train_step_bench.py seq21120 block --sparse --scan
run train_dense_21k_lora_scan python scripts/train_step_bench.py seq21120 block --lora --scan
# bracket between 21k (expected ok) and 42k (fails)
run train_sparse_16k_lora_scan python scripts/train_step_bench.py seq16640 block --sparse --lora --scan

echo "=== chip session phase 12 complete ($(date))" | tee -a /tmp/chip_r3l/session.log
