#!/bin/bash
# Round-3 chip session, phase 8: (a) the sparse DMD2 distilled e2e clip —
# composing the two fastest paths (phase-7 probe projects ~73 s/clip,
# ~1.27 frames/s); (b) text-encoder bench rerun with the eager per-leaf
# init (the jitted tree-init crashed the tunnel at 338 leaves in phase 6).
set -u
mkdir -p /tmp/chip_r3h
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a /tmp/chip_r3h/session.log
  timeout "$CHIP_STEP_TIMEOUT" "$@" > "/tmp/chip_r3h/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date))" | tee -a /tmp/chip_r3h/session.log
  tail -8 "/tmp/chip_r3h/$name.log" | tee -a /tmp/chip_r3h/session.log
}

CHIP_STEP_TIMEOUT=${CHIP_STEP_TIMEOUT:-4000}

run e2e_dmd2_sparse python scripts/e2e_clip_latency.py full --dmd2 --sparse --repeat 4
run text_encoder python scripts/text_encoder_bench.py 1 2

echo "=== chip session phase 8 complete ($(date))" | tee -a /tmp/chip_r3h/session.log
