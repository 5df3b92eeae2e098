"""Benchmark harness: 2B video DiT denoising throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: frames/sec/chip for Video2World DiT denoising — the sampling hot
loop (35 UniPC steps x 2 CFG forwards of the 2B DiT), which dominates clip
latency in the reference (SURVEY.md §3.1 hot loop). We time the steady-state
CFG denoise step at a 17-frame clip geometry and derive
  frames_per_sec = num_frames / (num_steps * t_step).

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is an analytic H100 estimate for the same workload: identical
FLOPs at 989 TFLOP/s bf16 and 40% assumed MFU. >1.0 means faster per chip
than that H100 model.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Clip geometry: 17 pixel frames @ 512x832 -> latent (16, 5, 64, 104)
# -> DiT tokens 5 * 32 * 52 = 8320. (720p = 24 x 44 x 80 tokens is the
# full-scale config; this bench fits comfortably on one v5e chip.)
FRAMES = 17
LATENT = (1, 16, 5, 64, 104)
NUM_STEPS = 35
TIMING_ITERS = 4


def dit_flops_per_forward(seq: int, d_model: int, n_blocks: int, d_ff: int, ctx_len: int = 512) -> float:
    attn = 4 * seq * seq * d_model  # qk^T + pv
    qkvo = 8 * seq * d_model * d_model
    cross = 4 * seq * ctx_len * d_model + 6 * seq * d_model * d_model  # q + out + kv on ctx
    mlp = 4 * seq * d_model * d_ff
    return n_blocks * (attn + qkvo + cross + mlp)


def main() -> None:
    from cosmos_predict2_tpu.networks.dit import DiTConfig, MiniTrainDIT

    cfg = DiTConfig(
        model_channels=2048,
        num_heads=16,
        num_blocks=28,
        use_adaln_lora=True,
        rope_h_extrapolation_ratio=3.0,
        rope_w_extrapolation_ratio=3.0,
        rope_enable_fps_modulation=False,
        dtype=jnp.bfloat16,
        remat="none",
    )
    net = MiniTrainDIT(cfg)
    B, C, T, H, W = LATENT
    x = jax.random.normal(jax.random.PRNGKey(0), LATENT, dtype=jnp.bfloat16)
    ts = jnp.full((B,), 500.0, dtype=jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 512, 1024), dtype=jnp.bfloat16) * 0.02

    shapes = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x, ts, ctx))
    keys = iter(jax.random.split(jax.random.PRNGKey(42), len(jax.tree.leaves(shapes))))
    params = jax.tree.map(
        lambda s: (jax.random.normal(next(keys), s.shape, jnp.float32) * 0.02).astype(s.dtype), shapes
    )
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16), params)

    @jax.jit
    def cfg_denoise_step(params, x, ts, ctx):
        # batched CFG: cond + uncond in one batch-2 forward
        x2 = jnp.concatenate([x, x], axis=0)
        ts2 = jnp.concatenate([ts, ts], axis=0)
        ctx2 = jnp.concatenate([ctx, jnp.zeros_like(ctx)], axis=0)
        v = net.apply(params, x2, ts2, ctx2)
        cond_v, uncond_v = v[:1], v[1:]
        return cond_v + 7.0 * (cond_v - uncond_v)

    # compile + warmup
    out = cfg_denoise_step(params, x, ts, ctx)
    out.block_until_ready()

    times = []
    for _ in range(TIMING_ITERS):
        t0 = time.perf_counter()
        out = cfg_denoise_step(params, x, ts, ctx)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    t_step = float(np.median(times))

    frames_per_sec = FRAMES / (NUM_STEPS * t_step)

    seq = T * (H // 2) * (W // 2)
    flops = 2 * dit_flops_per_forward(seq, cfg.model_channels, cfg.num_blocks, int(cfg.model_channels * 4))
    h100_t_step = flops / (989e12 * 0.40)
    baseline_fps = FRAMES / (NUM_STEPS * h100_t_step)

    # per-chip MFU against the chip's own bf16 peak (informational)
    peaks = {"TPU v5 lite": 197e12, "TPU v5": 459e12, "TPU v4": 275e12, "TPU v6": 918e12}
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in peaks.items() if kind.startswith(k)), 197e12)
    mfu = flops / t_step / peak

    print(
        json.dumps(
            {
                "metric": "video2world_2b_dit_denoise_frames_per_sec_per_chip",
                "value": round(frames_per_sec, 4),
                "unit": f"frames/s/chip (17f clip, 35-step CFG sampling, seq 8320; {mfu * 100:.1f}% MFU on {kind})",
                "vs_baseline": round(frames_per_sec / baseline_fps, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
