#!/bin/bash
# Round-4b chip session: encode sweep (chunk_frames x backend x uint8 feed)
# -> decode chunk sweep on the production host/u8 route -> interactive
# CP-proxy ladder. Run SOLO (single host core). Logs to /tmp/chip_r4b/.
set -u
mkdir -p /tmp/chip_r4b
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

log() { echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a /tmp/chip_r4b/session.log; }

log "encode sweep: chunk 4/8 x {auto,xla,taps} + u8 feed"
timeout 3000 python scripts/vae_bench.py enc 4 8 >> /tmp/chip_r4b/session.log 2>&1

log "decode e2e host/u8: chunk 1 vs 2 vs 3"
timeout 2400 python scripts/vae_bench.py e2e 1 2 3 >> /tmp/chip_r4b/session.log 2>&1

log "interactive cp-proxy ladder 720p cache-8"
timeout 3000 python scripts/interactive_latency.py --cp-proxy --hw 88 160 --cache-frames 8 --blocks 4 >> /tmp/chip_r4b/session.log 2>&1

log "interactive cp-proxy ladder 352x640 cache-16"
timeout 2400 python scripts/interactive_latency.py --cp-proxy --hw 44 80 --cache-frames 16 --blocks 4 >> /tmp/chip_r4b/session.log 2>&1

log "done"
