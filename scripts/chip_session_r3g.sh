#!/bin/bash
# Round-3 chip session, phase 7 (small): sparse single forward — the
# building block of a sparse DMD2 4-step student (sparse recipe composed
# with distillation: a supported config the reference doesn't ship, as a
# beyond-parity throughput option). Chains on phase 6.
set -u
mkdir -p /tmp/chip_r3g
cd /root/repo

waited=0
while [ ! -f /tmp/chip_r3f/session.log ] || ! grep -q "phase 6 complete" /tmp/chip_r3f/session.log; do
  if ! pgrep -x -f "bash scripts/chip_session_r3f.sh" > /dev/null 2>&1; then
    echo "=== phase-6 runner gone without completion marker; proceeding ($(date))" >> /tmp/chip_r3g/session.log
    break
  fi
  if [ "$waited" -ge 600 ]; then
    echo "=== phase-6 wait timed out after 10h; proceeding ($(date))" >> /tmp/chip_r3g/session.log
    break
  fi
  sleep 60
  waited=$((waited + 1))
done

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a /tmp/chip_r3g/session.log
  timeout "$CHIP_STEP_TIMEOUT" "$@" > "/tmp/chip_r3g/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date))" | tee -a /tmp/chip_r3g/session.log
  tail -8 "/tmp/chip_r3g/$name.log" | tee -a /tmp/chip_r3g/session.log
}

CHIP_STEP_TIMEOUT=${CHIP_STEP_TIMEOUT:-4000}

run single_sparse python scripts/full_scale_probe.py single 7
run single_sparse0 python scripts/full_scale_probe.py single 0

echo "=== chip session phase 7 complete ($(date))" | tee -a /tmp/chip_r3g/session.log
