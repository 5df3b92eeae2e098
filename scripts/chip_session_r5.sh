#!/bin/bash
# Round-5 e2e clip ladder re-measurement (VERDICT r4 #8): the shipped
# pipeline now has the ring-kernel chunk-2 decode (13.2 s) and the uint8
# encode feed — refresh the dense/sparse/DMD2 p50 table in docs/PERF.md
# so it reflects what users actually get. Run detached:
#   setsid nohup bash scripts/chip_session_r5.sh </dev/null > /tmp/chip_r5/driver.log 2>&1 &
set -u
mkdir -p /tmp/chip_r5
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ==="
  timeout 7200 python -u "$@" > "/tmp/chip_r5/$name.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S)) ==="
}

run dmd2        scripts/e2e_clip_latency.py full --dmd2 --repeat 4
run dmd2_sparse scripts/e2e_clip_latency.py full --dmd2 --sparse --repeat 4
run sparse35    scripts/e2e_clip_latency.py full --sparse --repeat 2
run bench       bench.py
echo "ALL DONE $(date +%H:%M:%S)"
