"""Interactive (self-forcing) streaming latency on the real chip.

Measures the per-frame-block latency of the causal KV-cache streaming
generator (models/interactive.py StreamingInference) with the DMD2 4-step
student at the 2B scale — the real-time story: one latent frame = 4 pixel
frames at 16 fps, so real-time means >= 4 latent frames/s.

Reference being proxied: interactive/inference/
action_video2world_streaming.py:90-297 (cache_frame_size rolling window).

Run: python scripts/interactive_latency.py [--hw 44 80] [--blocks 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax.numpy as jnp
import numpy as np


def measure(
    hw: tuple[int, int] = (44, 80),
    blocks: int = 8,
    cache_frames: int = 16,
    net_cfg=None,
    num_steps: int = 4,
    frames_per_block: int = 1,
    cp: int = 1,
    cache_window_rows: int = -1,
) -> dict:
    """Run the KV-cache streaming probe; returns {"p50_s", "latent_fps", "pixel_fps", "laps"}.

    net_cfg defaults to the 2B causal DiT; tests pass a tiny preset so the
    same probe path runs on the CPU mesh (level-2 test).
    ``frames_per_block`` = the reference's num_frame_per_block: denoising
    nb frames per block amortizes the cache read and feeds the MXU a
    nb-times-larger q — higher throughput (latent f/s) at nb-times the
    latency-to-first-frame."""
    from cosmos_predict2_tpu.conditioning.conditioner import make_condition
    from cosmos_predict2_tpu.models.interactive import (
        CausalVideo2WorldModel,
        StreamingConfig,
        StreamingInference,
        causal_model_config,
    )
    from cosmos_predict2_tpu.networks.dit import DiTConfig

    import contextlib
    import dataclasses

    net = net_cfg or DiTConfig(
        model_channels=2048,
        num_heads=16,
        num_blocks=28,
        use_adaln_lora=True,
        rope_h_extrapolation_ratio=3.0,
        rope_w_extrapolation_ratio=3.0,
        rope_enable_fps_modulation=False,
        dtype=jnp.bfloat16,
        remat="none",
        temporal_causal=True,
    )
    if cache_window_rows > 0:
        import dataclasses as _dc

        net = _dc.replace(net, cache_na_window_rows=cache_window_rows)
    mesh_ctx = contextlib.nullcontext()
    if cp > 1:
        # CP-sharded streaming decode (block tokens over cp, ring buffers
        # head-sharded — parallel/cp.py ulysses_kv_cache_attention). On the
        # virtual CPU mesh this validates the program + comm pattern; the
        # timing is only meaningful on real multi-chip hardware.
        from cosmos_predict2_tpu.parallel.mesh import make_mesh

        assert len(jax.devices()) >= cp, f"need {cp} devices, have {len(jax.devices())}"
        net = dataclasses.replace(net, cp_axis="cp")
        mesh_ctx = jax.set_mesh(make_mesh(1, 1, cp, 1, devices=jax.devices()[:cp]))
    h, w = hw
    nb = frames_per_block
    model = CausalVideo2WorldModel(causal_model_config(net, num_frame_per_block=nb))
    scfg = StreamingConfig(num_frame_per_block=nb, cache_frame_size=cache_frames, num_steps=num_steps)
    stream = StreamingInference(scfg, model)
    mesh_ctx.__enter__()
    try:
        return _measure_body(model, stream, net, hw, nb, blocks, cache_frames, cp)
    finally:
        mesh_ctx.__exit__(None, None, None)


def _measure_body(model, stream, net, hw, nb, blocks, cache_frames, cp) -> dict:
    from cosmos_predict2_tpu.conditioning.conditioner import make_condition

    h, w = hw

    latent = (1, 16, nb, h, w)
    print(f"[stream] init causal params ({net.model_channels}ch), latent frame {h}x{w} ...", flush=True)
    params = model.init_params(jax.random.PRNGKey(0), (1, 16, 4, h, w), text_len=512)
    params = jax.tree.map(lambda p: p.astype(net.dtype) if p.ndim >= 2 else p, params)
    emb = jnp.ones((1, 512, 1024), net.dtype) * 0.01
    cond = make_condition(emb)

    caches = model.init_kv_caches(1, cache_frames + nb, h, w)

    # the production jitted block step (donated caches): measuring the
    # exact code path StreamingInference.generate runs
    jit_block = stream._jitted_block(latent)
    step_fn = lambda params, rng, caches, t_pos: jit_block(params, rng, cond, caches, t_pos)

    from cosmos_predict2_tpu.utils.benchmarking import sync

    print("[stream] compiling block step ...", flush=True)
    t0 = time.perf_counter()
    x, caches = step_fn(params, jax.random.PRNGKey(1), caches, 0)
    sync(x)
    print(f"[stream] first block (incl compile): {time.perf_counter() - t0:.1f}s", flush=True)

    laps = []
    for i in range(blocks):
        t0 = time.perf_counter()
        x, caches = step_fn(params, jax.random.PRNGKey(2 + i), caches, (i + 1) * nb)
        sync(x)
        laps.append(time.perf_counter() - t0)
    p50 = float(np.median(laps))
    lfps = nb / p50
    tag = f" cp={cp} ({jax.default_backend()})" if cp > 1 else ""
    print(
        f"[stream] RESULT latent {h}x{w} nb={nb}{tag}: p50 block latency {p50 * 1e3:.0f} ms "
        f"-> {lfps:.2f} latent frames/s = {4 * lfps:.1f} pixel fps "
        f"(real-time 16 fps needs 4 latent f/s: {'YES' if 4 * lfps >= 16 else 'no'})",
        flush=True,
    )
    return {"p50_s": p50, "latent_fps": lfps, "pixel_fps": 4 * lfps, "laps": laps}


def _attn_block_probe(s_q: int, heads: int, s_max: int, fill: int, d: int = 128, reps: int = 5) -> float:
    """One flash-decode call at the given shard shape (seconds, min-of-reps).

    This is the EXACT per-chip attention program of the ulysses KV-cache
    path (parallel/cp.py:118-133): q (1, s_q, heads, d) against a ring
    buffer (1, s_max, heads, d) filled to ``fill``.
    """
    from cosmos_predict2_tpu.ops.flash_attention import flash_attention_kv_cache

    q = jax.random.normal(jax.random.PRNGKey(0), (1, s_q, heads, d), dtype=jnp.bfloat16)
    kb = jax.random.normal(jax.random.PRNGKey(1), (1, heads, s_max, d), dtype=jnp.bfloat16)
    vb = jax.random.normal(jax.random.PRNGKey(2), (1, heads, s_max, d), dtype=jnp.bfloat16)
    f = jax.jit(lambda q, kb, vb: flash_attention_kv_cache(q, kb, vb, fill))
    np.asarray(f(q, kb, vb))  # compile
    laps = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(f(q, kb, vb))
        laps.append(time.perf_counter() - t0)
    return float(np.min(laps))


def cp_proxy_ladder(
    hw: tuple[int, int] = (88, 160),
    cache_frames: int = 8,
    blocks: int = 4,
    num_steps: int = 4,
    ks: tuple[int, ...] = (2, 4, 8),
    ici_gbps: float = 100.0,
) -> list[dict]:
    """MEASURED single-chip pieces of the cp=k interactive block step.

    Under ``ulysses_kv_cache_attention`` the per-chip program is exactly:
      (a) all non-attention DiT work on S_blk/k tokens,
      (b) flash decode with H/k heads over the FULL block + cache,
      (c) two all-to-alls per attention layer on the new block only.
    (a) is measured by running the production jitted block step at
    (h, w/k) — same program, token count scaled; its internal attention
    (16 heads, q/k tokens, cache/k) is measured separately and swapped for
    the true head-sharded attention (b), also measured. Only (c) is
    analytic (bytes / ICI bandwidth) — every compute piece is a chip
    measurement, per VERDICT r3 #5.
    """
    h, w = hw
    heads, d, layers = 16, 128, 28
    s_blk = (h // 2) * (w // 2)
    n_attn = layers * num_steps  # attention calls per block step
    s_max_tok = (cache_frames + 1) * s_blk
    fill = s_max_tok  # steady state: ring buffer full

    print(f"[cp-proxy] measuring cp=1 full block at {h}x{w} cache={cache_frames} ...", flush=True)
    base = measure(hw, blocks=blocks, cache_frames=cache_frames, num_steps=num_steps)
    t_attn_1 = _attn_block_probe(s_blk, heads, s_max_tok, fill) * n_attn
    rows = [{
        "cp": 1, "block_s": base["p50_s"], "attn_s": t_attn_1,
        "nonattn_s": base["p50_s"] - t_attn_1, "a2a_s": 0.0,
        "pixel_fps": base["pixel_fps"], "measured": "all",
    }]
    print(f"[cp-proxy] cp=1: block {base['p50_s']*1e3:.0f} ms (attn {t_attn_1*1e3:.0f} ms)", flush=True)

    for k in ks:
        assert w % (2 * k) == 0 and heads % k == 0, (hw, k)
        scaled = measure((h, w // k), blocks=blocks, cache_frames=cache_frames, num_steps=num_steps)
        t_attn_in_scaled = _attn_block_probe(s_blk // k, heads, s_max_tok // k, fill // k) * n_attn
        t_attn_shard = _attn_block_probe(s_blk, heads // k, s_max_tok, fill) * n_attn
        # (c): per layer per step, 3 scatter + 1 gather all_to_alls on the
        # new block; each chip moves ~local_bytes*(k-1)/k per tensor
        a2a_bytes = 4 * (s_blk // k) * heads * d * 2 * (k - 1) / k * n_attn
        t_a2a = a2a_bytes / (ici_gbps * 1e9)
        t_k = scaled["p50_s"] - t_attn_in_scaled + t_attn_shard + t_a2a
        rows.append({
            "cp": k, "block_s": t_k, "attn_s": t_attn_shard,
            "nonattn_s": scaled["p50_s"] - t_attn_in_scaled, "a2a_s": t_a2a,
            "pixel_fps": 4.0 / t_k,
            "measured": "compute (a2a analytic)",
        })
        print(
            f"[cp-proxy] cp={k}: block {t_k*1e3:.0f} ms = nonattn {rows[-1]['nonattn_s']*1e3:.0f} "
            f"+ attn {t_attn_shard*1e3:.0f} + a2a {t_a2a*1e3:.1f} ms -> {4.0/t_k:.1f} pixel fps "
            f"({'REAL-TIME' if 4.0 / t_k >= 16 else 'below 16 fps'})",
            flush=True,
        )
    return rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--hw", type=int, nargs=2, default=(44, 80),
        help="latent h w: 88 160 = 720p (1280x704; use --cache-frames <= 8 — "
        "a 16-frame 720p cache is 13.7 GB), 32 32 = the reference's 256-res "
        "interactive geometry, 44 80 = 352x640",
    )
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--cache-frames", type=int, default=16)
    ap.add_argument("--frames-per-block", type=int, default=1)
    ap.add_argument(
        "--cache-window", type=int, default=-1,
        help="sparse cache-window: visible kv ROWS per query on the token "
        "grid (NATTEN-clamped; e.g. 7 at 352x640 = the production-scaled "
        "GNA window); -1 = dense cache attention",
    )
    ap.add_argument(
        "--cp", type=int, default=1,
        help="context-parallel degree; needs >= cp devices (virtual CPU mesh: "
        "JAX_PLATFORMS=cpu + jax_num_cpu_devices — program/comm validation, "
        "not a perf number)",
    )
    ap.add_argument("--tiny", action="store_true", help="tiny net (CPU-mesh runs)")
    ap.add_argument(
        "--cp-proxy", action="store_true",
        help="measure the cp=1/2/4/8 ladder pieces on ONE chip (see cp_proxy_ladder)",
    )
    args = ap.parse_args()
    if args.cp_proxy:
        import json as _json

        rows = cp_proxy_ladder(tuple(args.hw), cache_frames=args.cache_frames, blocks=args.blocks)
        print(_json.dumps(rows))
        return
    net_cfg = None
    if args.tiny:
        import dataclasses as _dc

        from cosmos_predict2_tpu.networks.dit import DiTConfig, PRESETS

        net_cfg = _dc.replace(
            PRESETS["test"], temporal_causal=True, dtype=jnp.float32, remat="none"
        )
    measure(
        tuple(args.hw), args.blocks, args.cache_frames,
        net_cfg=net_cfg, frames_per_block=args.frames_per_block, cp=args.cp,
        cache_window_rows=args.cache_window,
    )


if __name__ == "__main__":
    main()
