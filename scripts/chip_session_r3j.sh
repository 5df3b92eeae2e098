#!/bin/bash
# Round-3 chip session, phase 10: compile-helper failure diagnosis matrix.
# Known good: NA fwd 84k unrolled; flash bwd 84k standalone; dense scan
# train 8320. Failing: sparse scan train >= 42k (2.3 MB HLO — not size).
# Isolate: (a) dense scan train at 42k (seq scale without NA bwd),
# (b) sparse scan train at 8320 (NA bwd in scan at small seq).
set -u
mkdir -p /tmp/chip_r3j
cd /root/repo

waited=0
while [ ! -f /tmp/chip_r3i/session.log ] || ! grep -q "phase 9 complete" /tmp/chip_r3i/session.log; do
  if [ "$waited" -ge 120 ]; then
    echo "=== phase-9 wait timed out after 2h; proceeding ($(date))" >> /tmp/chip_r3j/session.log
    break
  fi
  sleep 60
  waited=$((waited + 1))
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a /tmp/chip_r3j/session.log
  timeout "$CHIP_STEP_TIMEOUT" "$@" > "/tmp/chip_r3j/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date))" | tee -a /tmp/chip_r3j/session.log
  tail -8 "/tmp/chip_r3j/$name.log" | tee -a /tmp/chip_r3j/session.log
}

CHIP_STEP_TIMEOUT=${CHIP_STEP_TIMEOUT:-4000}

run train_dense_42k_scan python scripts/train_step_bench.py seq42240 block --scan
run train_sparse_8320_scan python scripts/train_step_bench.py seq8320 block --sparse --scan
run train_sparse_13k_scan python scripts/train_step_bench.py seq13312 block --sparse --scan --lora

echo "=== chip session phase 10 complete ($(date))" | tee -a /tmp/chip_r3j/session.log
