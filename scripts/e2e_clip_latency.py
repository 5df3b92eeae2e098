"""End-to-end clip latency: the WHOLE generate_vid2world on the real chip.

Times what BASELINE.md's north star asks for — p50 seconds per clip through
the actual inference pipeline: VAE encode of the conditioning frames, the
35-step CFG UniPC sampling loop, and VAE decode to pixels (text embeddings
precomputed, as the reference's offline-t5 path does:
predict2/inference/video2world.py:385-599 runs the same three stages).

Geometries:
  small — 17 frames 512x832 (fits one-shot VAE, seq 8320)
  full  — 93 frames 704x1280 "720" bucket (seq 84480, streaming VAE)

Run:  python scripts/e2e_clip_latency.py [small|full] [--steps N] [--repeat K]
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


def build_pipe(geom: str, num_steps: int, sparse: bool = False):
    from cosmos_predict2_tpu.inference.pipeline import InferenceSetup, Video2WorldInference
    from cosmos_predict2_tpu.models.video2world import RFModelConfig, Video2WorldModel
    from cosmos_predict2_tpu.networks.dit import DiTConfig
    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig

    if geom == "tiny":  # CPU smoke of the pipeline wiring (tests/dev)
        H, W, state_t = 64, 64, 2
    elif geom == "small":
        H, W, state_t = 512, 832, 5
    else:
        H, W, state_t = 704, 1280, 24
    # streaming VAE for both: the one-shot whole-pipeline jit (encode +
    # 35-step scan + decode) exceeds 16 GB HBM even at 17f 512x832 (2B bf16
    # params 4G + decode activations); streaming keeps the VAE O(chunk).
    streaming = True

    tiny = geom == "tiny"
    net = DiTConfig(
        model_channels=64 if tiny else 2048,
        num_heads=2 if tiny else 16,
        num_blocks=2 if tiny else 28,
        use_adaln_lora=True,
        rope_h_extrapolation_ratio=3.0,
        rope_w_extrapolation_ratio=3.0,
        rope_enable_fps_modulation=False,
        dtype=jnp.bfloat16,
        remat="none",
        # production sparse interleave (reference sparse_2B.py:326-327)
        n_dense_blocks=(1 if tiny else 7) if sparse else -1,
        natten_window=(-1, 12, 24),
        natten_stride=(1, 4, 8) if sparse else (1, 1, 1),
        natten_base_size=(-1, 44, 80) if sparse else None,
    )
    setup = InferenceSetup(
        model_config=RFModelConfig(net=net, state_t=state_t, sampling_num_steps=num_steps),
        vae_config=WanVAEConfig(dtype=jnp.bfloat16),
        size_override=(H, W),
        streaming_vae=streaming,
    )
    model = Video2WorldModel(setup.model_config)
    latent = (1, 16, state_t, H // 8, W // 8)
    print(f"[e2e] init params for latent {latent} ...", flush=True)
    params = model.init_params(jax.random.PRNGKey(0), latent, text_len=512)
    params = jax.tree.map(lambda p: p.astype(jnp.bfloat16) if p.ndim >= 2 else p, params)
    vae = WanVAE(setup.vae_config)
    vae_params = jax.jit(lambda k: vae.init(k, jnp.zeros((1, 1, 64, 64, 3), jnp.bfloat16)))(
        jax.random.PRNGKey(1)
    )
    fake_te = lambda prompts: jnp.ones((len(prompts), 512, 1024), jnp.bfloat16) * 0.01
    return Video2WorldInference(setup, params, vae_params, text_encoder=fake_te), (H, W, state_t)


def run_dmd2(pipe, H: int, W: int, state_t: int, repeat: int, geom: str = "full", sparse: bool = False) -> None:
    """MEASURED distilled e2e clip: streaming VAE encode -> jitted DMD2
    4-step TrigFlow sampler (no CFG) -> streaming VAE decode (VERDICT r2 #1:
    the distilled path as a tracked, measured number, not a component sum)."""
    import jax.numpy as jnp

    from cosmos_predict2_tpu.conditioning.conditioner import DataType, make_condition
    from cosmos_predict2_tpu.models.distillation import DistillationConfig, DistillationModel
    from cosmos_predict2_tpu.tokenizers.wan_vae_streaming import decode_streaming, encode_streaming
    from cosmos_predict2_tpu.utils.misc import arch_invariant_rand

    dm = DistillationModel(DistillationConfig(model=pipe.setup.model_config))
    T = (state_t - 1) * 4 + 1
    video = np.random.RandomState(0).randint(0, 255, (1, 3, T, H, W), dtype=np.uint8)
    video[:, :, 1:] = 0
    emb = pipe.encode_text(["a robot arm pouring coffee into a cup"])
    gen = jax.jit(lambda p, n, c: dm.generate(p, n, c, num_steps=4, num_conditional_frames=1))

    def lap(seed: int) -> float:
        # per-stage splits so the gap between the component sum and the
        # measured e2e is attributable (upload/host glue vs device stages)
        t0 = time.perf_counter()
        # production api.py feed: uint8 H2D, normalize fused in the encode chunks
        latents = encode_streaming(
            pipe.vae.config, pipe.vae_params,
            jnp.asarray(video).transpose(0, 2, 3, 4, 1), pixel_format="uint8",
        )
        gt = latents.transpose(0, 4, 1, 2, 3).astype(jnp.float32)
        _ = float(jnp.sum(gt[:, :1]))  # force encode before timing the split
        t_enc = time.perf_counter() - t0
        cond = make_condition(emb, data_type=DataType.VIDEO).replace(gt_frames=gt)
        noise = arch_invariant_rand(gt.shape, seed=seed)
        t1 = time.perf_counter()
        x = gen(pipe.params, noise, cond)
        _ = float(jnp.sum(x[:, :, :1].astype(jnp.float32)))
        t_den = time.perf_counter() - t1
        t2 = time.perf_counter()
        frames = decode_streaming(
            pipe.vae.config, pipe.vae_params, x.astype(pipe.vae.config.dtype).transpose(0, 2, 3, 4, 1),
            chunk_latent_frames=1,  # DiT co-resident: chunk 2 OOMs (pipeline.py note)
            out="host", pixel_format="uint8",  # production api.py route
        )
        t_dec = time.perf_counter() - t2
        # uint8 is always finite; catch NaN-poisoned decodes (quantize
        # maps NaN to a constant) by requiring real image variance
        assert frames.dtype == np.uint8 and frames.std(dtype=np.float32) > 1.0
        t = time.perf_counter() - t0
        print(
            f"[e2e]   split: upload+encode={t_enc:.1f}s denoise4={t_den:.1f}s "
            f"decode={t_dec:.1f}s glue={t - t_enc - t_den - t_dec:.1f}s",
            flush=True,
        )
        return t

    print(f"[e2e] dmd2: {T}f {H}x{W}, 4-step distilled — first run (incl compile)...", flush=True)
    print(f"[e2e] first={lap(1):.1f}s", flush=True)
    laps = []
    for i in range(repeat):
        laps.append(lap(2 + i))
        print(f"[e2e] steady run {i}: {laps[-1]:.1f}s", flush=True)
    p50 = float(np.median(laps))
    print(
        f"[e2e] RESULT geom={geom}-dmd2{'-sparse' if sparse else ''} frames={T} size={H}x{W} steps=4 "
        f"p50_clip_latency={p50:.1f}s  frames_per_sec_e2e={T / p50:.4f}",
        flush=True,
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("geom", nargs="?", default="small", choices=["tiny", "small", "full"])
    ap.add_argument("--steps", type=int, default=35)
    # >=4 steady laps for a robust p50 (VERDICT r2 #9); per-lap times printed
    ap.add_argument("--repeat", type=int, default=4)
    ap.add_argument("--sparse", action="store_true", help="GNA sparse interleave (sparse_2B recipe)")
    ap.add_argument("--dmd2", action="store_true", help="distilled 4-step path (no CFG)")
    args = ap.parse_args()

    pipe, (H, W, state_t) = build_pipe(args.geom, args.steps, sparse=args.sparse)
    if args.dmd2:
        run_dmd2(pipe, H, W, state_t, args.repeat, geom=args.geom, sparse=args.sparse)
        return
    T = (state_t - 1) * 4 + 1
    video = np.random.RandomState(0).randint(0, 255, (1, 3, T, H, W), dtype=np.uint8)
    video[:, :, 1:] = 0  # image2world: frame 0 conditions
    emb = pipe.encode_text(["a robot arm pouring coffee into a cup"])

    print(f"[e2e] {args.geom}: {T}f {H}x{W}, {args.steps} steps — first run (incl compile)...", flush=True)
    t0 = time.perf_counter()
    frames = pipe.generate_vid2world(video, emb, guidance=7.0, num_steps=args.steps, seed=1, pixel_format="uint8")
    t_first = time.perf_counter() - t0
    # uint8 is always finite; require real image variance to catch a
    # NaN-poisoned decode (quantize maps NaN to a constant)
    assert frames.shape == (T, H, W, 3) and frames.std(dtype=np.float32) > 1.0
    print(f"[e2e] first={t_first:.1f}s", flush=True)

    laps = []
    for i in range(args.repeat):
        t0 = time.perf_counter()
        frames = pipe.generate_vid2world(video, emb, guidance=7.0, num_steps=args.steps, seed=2 + i, pixel_format="uint8")
        laps.append(time.perf_counter() - t0)
        print(f"[e2e] steady run {i}: {laps[-1]:.1f}s", flush=True)
    p50 = float(np.median(laps))
    tag = "-sparse" if args.sparse else ""
    print(
        f"[e2e] RESULT geom={args.geom}{tag} frames={T} size={H}x{W} steps={args.steps} "
        f"p50_clip_latency={p50:.1f}s  frames_per_sec_e2e={T / p50:.4f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
