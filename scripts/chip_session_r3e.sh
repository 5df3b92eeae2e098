#!/bin/bash
# Round-3 chip session, phase 5: scan-over-blocks measurements.
#  - dense full-scale CFG step with scan_blocks (compile time + t_step vs
#    unrolled: same kernels, 28x smaller HLO)
#  - sparse full-scale (42k/84k) fwd+bwd retry with scan (the unrolled
#    programs crash the environment's remote-compile helper; the scanned
#    body is one block, well under any helper limit)
#  - seq8320 fwd+bwd with scan (step-time parity check vs 1.675 s unrolled)
# Waits for phase 4 (e2e laps) to finish so the chip is uncontended.
set -u
mkdir -p /tmp/chip_r3e
cd /root/repo

# bounded wait: proceed when phase 4 marks complete, when its runner is no
# longer alive (crash — don't spin forever on a marker that will never
# appear), or after 6 h regardless (worst case: brief chip contention)
waited=0
while [ ! -f /tmp/chip_r3d/session.log ] || ! grep -q "phase 4 complete" /tmp/chip_r3d/session.log; do
  if ! pgrep -x -f "bash scripts/chip_session_r3d.sh" > /dev/null 2>&1; then
    echo "=== phase-4 runner gone without completion marker; proceeding ($(date))" >> /tmp/chip_r3e/session.log
    break
  fi
  if [ "$waited" -ge 360 ]; then
    echo "=== phase-4 wait timed out after 6h; proceeding ($(date))" >> /tmp/chip_r3e/session.log
    break
  fi
  sleep 60
  waited=$((waited + 1))
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a /tmp/chip_r3e/session.log
  timeout "$CHIP_STEP_TIMEOUT" "$@" > "/tmp/chip_r3e/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date))" | tee -a /tmp/chip_r3e/session.log
  tail -8 "/tmp/chip_r3e/$name.log" | tee -a /tmp/chip_r3e/session.log
}

CHIP_STEP_TIMEOUT=${CHIP_STEP_TIMEOUT:-9000}

run train_8320_scan python scripts/train_step_bench.py seq8320 block --scan
run train_sparse_42k_scan python scripts/train_step_bench.py seq42240 block --sparse --scan
run train_sparse_84k_scan python scripts/train_step_bench.py seq84480 block --sparse --scan
run cfg_dense_scan python scripts/full_scale_probe.py cfg -1 --scan
run train_84k_lora_sparse_scan python scripts/train_step_bench.py seq84480 block --sparse --scan --lora

echo "=== chip session phase 5 complete ($(date))" | tee -a /tmp/chip_r3e/session.log
