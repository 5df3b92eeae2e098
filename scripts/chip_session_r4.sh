#!/bin/bash
# Round-4 chip session: K-folded conv kernel measurement -> VAE routes ->
# interactive CP ladder -> bench. Run SOLO (single host core: any
# concurrent CPU job corrupts the timings). Logs to /tmp/chip_r4/.
set -u
mkdir -p /tmp/chip_r4
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/.jax_cache

log() { echo "=== $1 ($(date +%H:%M:%S)) ===" | tee -a /tmp/chip_r4/session.log; }

log "conv micro: kfold vs pallas vs taps vs xla"
timeout 2400 python scripts/vae_conv_micro4.py >> /tmp/chip_r4/session.log 2>&1

log "vae convcmp auto vs kfold, chunk 1+2, whole-clip u8"
timeout 3000 python scripts/vae_bench.py convcmp 1 2 --kfold >> /tmp/chip_r4/session.log 2>&1

log "vae encode timing (auto + kfold)"
timeout 2400 python - >> /tmp/chip_r4/session.log 2>&1 <<'EOF'
import os, time
import jax, jax.numpy as jnp, numpy as np
import sys; sys.path.insert(0, "/root/repo/scripts")
from vae_bench import make_vae, N_FRAMES, PIX_H, PIX_W
from cosmos_predict2_tpu.tokenizers import wan_vae_streaming as wvs
cfg, params = make_vae()
x = jax.random.normal(jax.random.PRNGKey(0), (1, N_FRAMES, PIX_H, PIX_W, 3), dtype=jnp.bfloat16) * 0.5
for be in ("xla", "auto", "kfold"):
    try:
        f = lambda: float(np.sum(np.asarray(wvs.encode_streaming(cfg, params, x, conv_backend=be)[:, :1], np.float32)))
        f()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); f(); ts.append(time.perf_counter() - t0)
        print(f"[encode {be}] {min(ts):.1f} s", flush=True)
    except Exception as e:
        print(f"[encode {be}] FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)
EOF

log "interactive cp-proxy ladder 720p cache-8"
timeout 3000 python scripts/interactive_latency.py --cp-proxy --hw 88 160 --cache-frames 8 --blocks 4 >> /tmp/chip_r4/session.log 2>&1

log "interactive cp-proxy ladder 352x640 cache-16"
timeout 2400 python scripts/interactive_latency.py --cp-proxy --hw 44 80 --cache-frames 16 --blocks 4 >> /tmp/chip_r4/session.log 2>&1

log "done"
