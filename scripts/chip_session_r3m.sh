#!/bin/bash
# Round-3 chip session, phase 13: scan_uniform — ONE scan over the whole
# dense/sparse interleave with a runtime lax.cond attention switch, so the
# three NA Mosaic kernels compile once per program instead of once per
# interleave segment (6x at sparse_2B). Hypothesis from phases 9-12: the
# helper dies on per-program Mosaic kernel count x grid size, not HLO
# bytes (sparse trains at 13312/nblk=32 with 18 NA kernel sites; the
# standalone NA grad at nblk=165 compiles with 3).
set -u
mkdir -p /tmp/chip_r3m
cd /root/repo

run() {
  name=$1; shift
  echo "=== $name: $* ($(date))" | tee -a /tmp/chip_r3m/session.log
  timeout "$CHIP_STEP_TIMEOUT" "$@" > "/tmp/chip_r3m/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date))" | tee -a /tmp/chip_r3m/session.log
  tail -8 "/tmp/chip_r3m/$name.log" | tee -a /tmp/chip_r3m/session.log
}

CHIP_STEP_TIMEOUT=${CHIP_STEP_TIMEOUT:-4000}

# honest program sizes for PERF.md (lower-only, axon target, safe)
run hlo_sizes python scripts/hlo_size_probe.py seq42240 seq84480
# the blocked VERDICT#3 rows, now through the uniform scan
run train_sparse_42k_uniform python scripts/train_step_bench.py seq42240 block --sparse --uniform
run train_sparse_84k_uniform_lora python scripts/train_step_bench.py seq84480 block --sparse --uniform --lora
run train_sparse_84k_uniform python scripts/train_step_bench.py seq84480 block --sparse --uniform
run train_sparse_19k_uniform_lora python scripts/train_step_bench.py seq21120 block --sparse --uniform --lora
# forward-perf sanity: cond overhead on the single sparse forward
run single_sparse_uniform python scripts/full_scale_probe.py single 7 --uniform

echo "=== chip session phase 13 complete ($(date))" | tee -a /tmp/chip_r3m/session.log
