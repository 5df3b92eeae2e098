#!/bin/bash
# Round-5 follow-up chip measurements:
#  - dense DMD2 e2e rerun (the first attempt hit leaked-HBM OOM after a
#    SIGKILL'd predecessor; the sparse run in the same session was clean)
#  - 720p interactive block latency with the sparse cache window
#  - encode chunk sweep with the per-config HBM reset fix
# Run detached:
#   setsid nohup bash scripts/chip_session_r5b.sh </dev/null > /tmp/chip_r5/driver_b.log 2>&1 &
set -u
mkdir -p /tmp/chip_r5
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout 7200 python -u "$@" > "/tmp/chip_r5/$name.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S)) ==="
}

run dmd2_dense  scripts/e2e_clip_latency.py full --dmd2 --repeat 4
run int720_win  scripts/interactive_latency.py --hw 88 160 --cache-frames 8 --cache-window 12 --blocks 4
run enc_sweep   scripts/vae_bench.py enc 8
echo "ALL DONE $(date +%H:%M:%S)"
