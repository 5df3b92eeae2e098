"""Standalone NA-kernel check on the chip: correctness at medium size,
then timing at full scale. Usage: python scripts/na_debug.py [small|mid|full]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cosmos_predict2_tpu.ops.neighborhood_attention import (
    VideoSize,
    neighborhood_attention,
    neighborhood_attention_reference,
)

WINDOW = (-1, 12, 24)


def run(size: VideoSize, check: bool, iters: int = 2, stride=(1, 1, 1)):
    S = size.T * size.H * size.W
    B, H, D = 1, 16, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D), dtype=jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D), dtype=jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D), dtype=jnp.bfloat16)
    fn = jax.jit(lambda q, k, v: neighborhood_attention(q, k, v, size, WINDOW, stride=stride))
    print(f"[na] size={size} S={S} stride={stride} compiling ...", flush=True)
    out = fn(q, k, v)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    print("[na] first run OK", flush=True)
    times = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn(q, k, v)
        _ = float(jnp.sum(out.astype(jnp.float32)))
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    # effective (dense-equivalent) throughput for context
    fl = 4 * S * S * H * D * B
    print(f"[na] t={t * 1e3:.1f} ms  dense-equiv {fl / t / 1e12:.1f} TF/s", flush=True)
    if check:
        ref = neighborhood_attention_reference(
            q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32), size, WINDOW, stride
        )
        diff = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        print(f"[na] max |diff| vs reference: {diff:.4f} (bf16 ~1e-2 ok)", flush=True)
        assert diff < 5e-2


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "small"
    if mode == "small":
        run(VideoSize(2, 44, 80), check=True)
        run(VideoSize(2, 44, 80), check=True, stride=(1, 4, 8))
    elif mode == "mid":
        run(VideoSize(8, 44, 80), check=False)
    elif mode == "full":
        run(VideoSize(24, 44, 80), check=False)
        run(VideoSize(24, 44, 80), check=False, stride=(1, 4, 8))
    elif mode == "dil":
        # dilated layer from the 14B comb configs (window == sub-grid):
        # class-major reorder -> blocked attention, 1.8% block density
        size = VideoSize(24, 44, 80)
        S = size.T * size.H * size.W
        B, H, D = 1, 16, 128
        q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D), dtype=jnp.bfloat16)
        fn = jax.jit(lambda q: neighborhood_attention(
            q, q, q, size, (-1, 4, 16), stride=(1, 1, 1), dilation=(1, 11, 5)))
        print("[na] dilated (-1,4,16) d(1,11,5) compiling ...", flush=True)
        out = fn(q); _ = float(jnp.sum(out.astype(jnp.float32)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(jnp.sum(fn(q).astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        fl = 4 * S * S * H * D * B
        print(f"[na] dilated t={t * 1e3:.1f} ms  dense-equiv {fl / t / 1e12:.1f} TF/s", flush=True)
    elif mode == "grad":
        # fwd+bwd of the kernel at full scale (training path)
        size = VideoSize(24, 44, 80)
        S = size.T * size.H * size.W
        B, H, D = 1, 16, 128
        q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D), dtype=jnp.bfloat16)
        g = jax.jit(jax.grad(lambda q: jnp.sum(
            neighborhood_attention(q, q, q, size, WINDOW, stride=(1, 4, 8)).astype(jnp.float32))))
        print("[na] grad compiling ...", flush=True)
        out = g(q); jax.block_until_ready(out)
        ts = []
        for _ in range(2):
            t0 = time.perf_counter(); jax.block_until_ready(g(q)); ts.append(time.perf_counter() - t0)
        print(f"[na] grad t={min(ts) * 1e3:.1f} ms", flush=True)
