#!/bin/bash
# Round-3 chip session, phase 6:
#  - DMD2 distilled e2e rerun on the production uint8 decode route with
#    per-stage splits (attributes the component-sum vs measured gap)
#  - Qwen2.5-VL-7B text-encoder forward+pool latency (the last unmeasured
#    pipeline stage; 14.2 GiB of bf16 weights on the 16 GB chip)
# Chains on phase 5 (scan measurements) with the same bounded wait.
set -u
mkdir -p /tmp/chip_r3f
cd /root/repo

waited=0
while [ ! -f /tmp/chip_r3e/session.log ] || ! grep -q "phase 5 complete" /tmp/chip_r3e/session.log; do
  if ! pgrep -x -f "bash scripts/chip_session_r3e.sh" > /dev/null 2>&1; then
    echo "=== phase-5 runner gone without completion marker; proceeding ($(date))" >> /tmp/chip_r3f/session.log
    break
  fi
  if [ "$waited" -ge 480 ]; then
    echo "=== phase-5 wait timed out after 8h; proceeding ($(date))" >> /tmp/chip_r3f/session.log
    break
  fi
  sleep 60
  waited=$((waited + 1))
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a /tmp/chip_r3f/session.log
  timeout "$CHIP_STEP_TIMEOUT" "$@" > "/tmp/chip_r3f/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date))" | tee -a /tmp/chip_r3f/session.log
  tail -10 "/tmp/chip_r3f/$name.log" | tee -a /tmp/chip_r3f/session.log
}

CHIP_STEP_TIMEOUT=${CHIP_STEP_TIMEOUT:-9000}

run e2e_dmd2_u8 python scripts/e2e_clip_latency.py full --dmd2 --repeat 4
run text_encoder python scripts/text_encoder_bench.py 1 2

echo "=== chip session phase 6 complete ($(date))" | tee -a /tmp/chip_r3f/session.log
