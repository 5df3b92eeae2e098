"""Probe the FULL-SCALE 720p workload on the real chip (VERDICT r1 #3/#4).

Geometry: 93 frames @ 704x1280 -> latent (16, 24, 88, 160) -> DiT seq
24*44*80 = 84,480 tokens (reference default: config.py:418-421 (93 frames),
datasets/utils.py:53 ("720" bucket 1280x704), 2B state_t=24).

Subcommands:
  cfg     — batched-CFG denoise step t_step + MFU (dense)
  single  — single forward (DMD2 4-step building block)
  na      — sparse NA interleave variants
  blocks  — flash block-size sweep at seq 84480
  vae     — streaming VAE decode at 704x1280x93
Run: python scripts/full_scale_probe.py cfg  (from /root/repo)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

LATENT = (1, 16, 24, 88, 160)
SEQ = 24 * 44 * 80


def make_net(n_dense_blocks: int = -1, natten_window=(-1, 12, 24), natten_stride=(1, 4, 8), scan: bool = False, uniform: bool = False):
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
        n_dense_blocks=n_dense_blocks,
        natten_window=natten_window,
        natten_stride=natten_stride if n_dense_blocks >= 0 else (1, 1, 1),
        natten_base_size=(-1, 44, 80) if n_dense_blocks >= 0 else None,
        scan_blocks=scan or uniform,
        scan_uniform=uniform,
    )
    return MiniTrainDIT(cfg), cfg


def make_params(net, x, ts, ctx):
    shapes = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x, ts, ctx))
    keys = iter(jax.random.split(jax.random.PRNGKey(42), len(jax.tree.leaves(shapes))))
    return jax.tree.map(
        lambda s: (jax.random.normal(next(keys), s.shape, jnp.float32) * 0.02).astype(jnp.bfloat16),
        shapes,
    )


def flops_forward(seq, d=2048, blocks=28, ff=8192, ctx_len=512, lora=256, patch_dim=72, out_dim=64):
    attn = 4 * seq * seq * d
    qkvo = 8 * seq * d * d
    cross = 4 * seq * ctx_len * d + 6 * seq * d * d
    mlp = 4 * seq * d * ff
    adaln = 3 * 2 * seq // (44 * 80) * (d * lora + lora * 3 * d)  # per-frame modulation
    per_block = attn + qkvo + cross + mlp + adaln
    embed = 2 * seq * patch_dim * d  # patch embed
    final = 2 * seq * d * out_dim + 2 * seq // (44 * 80) * (d * lora + lora * 2 * d)
    return blocks * per_block + embed + final


def timed(fn, *args, iters=3):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # full consume
    times = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        times.append(time.perf_counter() - t0)
    # min, not median: a single tunnel hiccup must not poison the sample
    return float(np.min(times))


def peak_flops():
    kind = jax.devices()[0].device_kind
    peaks = {"TPU v5 lite": 197e12, "TPU v5": 459e12, "TPU v4": 275e12, "TPU v6": 918e12}
    return next((v for k, v in peaks.items() if kind.startswith(k)), 197e12), kind


def run_cfg(n_dense_blocks=-1, scan=False, uniform=False):
    net, cfg = make_net(n_dense_blocks, scan=scan, uniform=uniform)
    x = jax.random.normal(jax.random.PRNGKey(0), LATENT, dtype=jnp.bfloat16)
    ts = jnp.full((1,), 500.0, dtype=jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 1024), dtype=jnp.bfloat16) * 0.02
    params = make_params(net, x, ts, ctx)

    @jax.jit
    def step(params, x, ts, ctx):
        x2 = jnp.concatenate([x, x], axis=0)
        ts2 = jnp.concatenate([ts, ts], axis=0)
        ctx2 = jnp.concatenate([ctx, jnp.zeros_like(ctx)], axis=0)
        v = net.apply(params, x2, ts2, ctx2)
        return v[:1] + 7.0 * (v[:1] - v[1:])

    print(f"[cfg] compiling seq={SEQ} dense_blocks={n_dense_blocks} scan={cfg.scan_blocks} ...", flush=True)
    t0 = time.perf_counter()
    out = step(params, x, ts, ctx)
    _ = float(jnp.sum(out))
    print(f"[cfg] first call (incl compile): {time.perf_counter() - t0:.1f}s", flush=True)
    t = timed(step, params, x, ts, ctx)
    fl = 2 * flops_forward(SEQ)
    peak, kind = peak_flops()
    print(
        f"[cfg] t_step={t:.3f}s  MFU={fl / t / peak * 100:.1f}% ({kind})  "
        f"frames/s/chip={93 / (35 * t):.4f}  clip_denoise={35 * t:.1f}s",
        flush=True,
    )


def run_single(n_dense_blocks=-1, scan=False, uniform=False):
    net, cfg = make_net(n_dense_blocks, scan=scan, uniform=uniform)
    x = jax.random.normal(jax.random.PRNGKey(0), LATENT, dtype=jnp.bfloat16)
    ts = jnp.full((1,), 500.0, dtype=jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 512, 1024), dtype=jnp.bfloat16) * 0.02
    params = make_params(net, x, ts, ctx)
    step = jax.jit(lambda p, x, ts, c: net.apply(p, x, ts, c))
    print(f"[single] compiling dense_blocks={n_dense_blocks} scan={scan} ...", flush=True)
    t = timed(step, params, x, ts, ctx)
    fl = flops_forward(SEQ)
    peak, kind = peak_flops()
    print(
        f"[single] dense_blocks={n_dense_blocks} t_fwd={t:.3f}s  MFU={fl / t / peak * 100:.1f}%  "
        f"4step_latency={4 * t:.1f}s  frames/s/chip(4step)={93 / (4 * t):.3f}",
        flush=True,
    )


def run_blocks():
    from cosmos_predict2_tpu.ops.flash_attention import flash_attention

    B, H, Dh = 1, 16, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (B, SEQ, H, Dh), dtype=jnp.bfloat16)
    peak, kind = peak_flops()
    fl = 4 * SEQ * SEQ * H * Dh * B
    for bq, bkv in [(None, None), (512, 1536), (640, 1536), (640, 1920), (768, 1536), (512, 2048), (1024, 1280)]:
        try:
            fn = jax.jit(lambda q, bq=bq, bkv=bkv: flash_attention(q, q, q, block_q=bq, block_kv=bkv))
            t = timed(fn, q)
            print(f"[blocks] bq={bq} bkv={bkv}: {t * 1e3:.1f} ms  {fl / t / 1e12:.1f} TF/s ({fl / t / peak * 100:.1f}%)", flush=True)
        except Exception as e:
            print(f"[blocks] bq={bq} bkv={bkv}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)


def run_vae():
    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig
    from cosmos_predict2_tpu.tokenizers import wan_vae_streaming as wvs

    cfg = WanVAEConfig(dtype=jnp.bfloat16)
    net = WanVAE(cfg)
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 24, 88, 160, 16), dtype=jnp.bfloat16)
    shapes = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 64, 64, 3), jnp.bfloat16)))
    keys = iter(jax.random.split(jax.random.PRNGKey(7), len(jax.tree.leaves(shapes))))
    params = jax.tree.map(
        lambda s: (jax.random.normal(next(keys), s.shape, jnp.float32) * 0.05).astype(s.dtype), shapes
    )
    print("[vae] streaming decode 24 latent frames -> 93 frames 704x1280 ...", flush=True)
    t0 = time.perf_counter()
    out = wvs.decode_streaming(cfg, params, z, out="host")
    _ = float(np.sum(np.asarray(out, np.float32)))
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = wvs.decode_streaming(cfg, params, z, out="host")
    _ = float(np.sum(np.asarray(out, np.float32)))
    t = time.perf_counter() - t0
    print(f"[vae] decode shape={out.shape}  first(incl compile)={t_first:.1f}s  steady={t:.1f}s", flush=True)


def run_vae_encode():
    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig
    from cosmos_predict2_tpu.tokenizers import wan_vae_streaming as wvs

    cfg = WanVAEConfig(dtype=jnp.bfloat16)
    net = WanVAE(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 93, 704, 1280, 3), dtype=jnp.bfloat16) * 0.5
    shapes = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 64, 64, 3), jnp.bfloat16)))
    keys = iter(jax.random.split(jax.random.PRNGKey(7), len(jax.tree.leaves(shapes))))
    params = jax.tree.map(
        lambda s: (jax.random.normal(next(keys), s.shape, jnp.float32) * 0.05).astype(s.dtype), shapes
    )
    print("[vae] streaming encode 93 frames 704x1280 -> 24 latent ...", flush=True)
    t0 = time.perf_counter()
    z = wvs.encode_streaming(cfg, params, x)
    _ = float(np.sum(np.asarray(z, np.float32)))
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    z = wvs.encode_streaming(cfg, params, x)
    _ = float(np.sum(np.asarray(z, np.float32)))
    t = time.perf_counter() - t0
    print(f"[vae] encode shape={z.shape}  first(incl compile)={t_first:.1f}s  steady={t:.1f}s", flush=True)


if __name__ == "__main__":
    _scan = "--scan" in sys.argv[1:]  # scan-over-blocks (28x smaller HLO)
    _uni = "--uniform" in sys.argv[1:]  # one scan + runtime dense/sparse cond
    _pos = [a for a in sys.argv[1:] if a not in ("--scan", "--uniform")]
    cmd = _pos[0] if _pos else "cfg"
    if cmd == "cfg":
        run_cfg(int(_pos[1]) if len(_pos) > 1 else -1, scan=_scan, uniform=_uni)
    elif cmd == "single":
        run_single(int(_pos[1]) if len(_pos) > 1 else -1, scan=_scan, uniform=_uni)
    elif cmd == "na":
        run_cfg(n_dense_blocks=int(_pos[1]) if len(_pos) > 1 else 7, scan=_scan, uniform=_uni)
    elif cmd == "blocks":
        run_blocks()
    elif cmd == "vae":
        run_vae()
    elif cmd == "vae_encode":
        run_vae_encode()
    else:
        raise SystemExit(f"unknown subcommand {cmd}")
