#!/bin/bash
# Round-3 chip measurement session (fire when the axon tunnel is up).
# Runs the measurements VERDICT r2 asked for that need the real chip,
# in priority order, logging each to /tmp/chip_r3/*.log.
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

CHIP_STEP_TIMEOUT=${CHIP_STEP_TIMEOUT:-5400}

# 1. the driver artifact preview: all-config bench (dense+sparse+dmd2+vae+e2e)
run bench python bench.py

# 2. measured (not component-sum) distilled e2e clip p50
run e2e_dmd2 python scripts/e2e_clip_latency.py full --dmd2 --repeat 4

# 3. decode re-check after the conv-backend refactor (overlap + u8 route)
run vae_e2e python scripts/vae_bench.py e2e

# 4. interactive throughput mode: frames-per-block sweep at 352x640 and 720p
run ia_44x80_nb2 python scripts/interactive_latency.py --hw 44 80 --frames-per-block 2
run ia_44x80_nb4 python scripts/interactive_latency.py --hw 44 80 --frames-per-block 4
run ia_720p_nb4 python scripts/interactive_latency.py --hw 88 160 --cache-frames 8 --frames-per-block 4 --blocks 4

echo "=== chip session complete ($(date))" | tee -a /tmp/chip_r3/session.log
