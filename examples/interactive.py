"""Interactive (real-time) streaming generation example.

    COSMOS_SMOKE=1 python examples/interactive.py --frames 8

Streams latent-frame blocks from the causal few-step (DMD2) student with a
rolling KV-cache window — the reference's ActionStreamingInference loop
(interactive/inference/action_video2world_streaming.py:90-297). With
COSMOS_SMOKE=1 a tiny random-weight student runs on CPU/one chip; with a
distilled checkpoint pass --checkpoint/--vae as in examples/inference.py.

Multi-chip: --cp N runs the same loop under an N-way Ulysses context-
parallel mesh (KV ring buffers stay head-sharded on their chips; see
docs/PERF.md "Interactive").
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# this environment's TPU plugin overrides JAX_PLATFORMS at import time;
# re-assert an explicit cpu request so smoke runs never touch the tunnel
if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8, help="latent frames to stream")
    ap.add_argument("--hw", type=int, nargs=2, default=None, help="latent h w (default: smoke 8 8 / 2B 44 80)")
    ap.add_argument("--cache-frames", type=int, default=16)
    ap.add_argument("--frames-per-block", type=int, default=1)
    ap.add_argument("--num-steps", type=int, default=4, help="distilled denoise steps per block")
    ap.add_argument("--cp", type=int, default=0, help="Ulysses context-parallel degree (0 = off)")
    args = ap.parse_args()

    from cosmos_predict2_tpu.conditioning.conditioner import make_condition
    from cosmos_predict2_tpu.models.interactive import (
        CausalVideo2WorldModel,
        StreamingConfig,
        StreamingInference,
        causal_model_config,
    )
    from cosmos_predict2_tpu.networks.dit import PRESETS, DiTConfig
    from cosmos_predict2_tpu.utils.flags import SMOKE

    if SMOKE:
        net = dataclasses.replace(
            PRESETS["test"], num_heads=4, dtype=jnp.float32, remat="none"
        )
        h, w = args.hw or (8, 8)
    else:
        net = DiTConfig(
            model_channels=2048, num_heads=16, num_blocks=28, use_adaln_lora=True,
            rope_h_extrapolation_ratio=3.0, rope_w_extrapolation_ratio=3.0,
            rope_enable_fps_modulation=False, dtype=jnp.bfloat16, remat="none",
        )
        h, w = args.hw or (44, 80)
    if args.cp:
        net = dataclasses.replace(net, cp_axis="cp")

    model = CausalVideo2WorldModel(
        causal_model_config(net, num_frame_per_block=args.frames_per_block, state_t=4)
    )
    stream = StreamingInference(
        StreamingConfig(
            num_frame_per_block=args.frames_per_block,
            cache_frame_size=args.cache_frames,
            num_steps=args.num_steps,
        ),
        model,
    )

    import contextlib

    ctx = contextlib.nullcontext()
    if args.cp:
        from cosmos_predict2_tpu.parallel.mesh import make_mesh

        # the whole loop (incl. params init — a cp_axis net traces its CP
        # collectives at init too) must run inside the mesh context
        ctx = jax.set_mesh(make_mesh(1, 1, args.cp, 1, devices=jax.devices()[: args.cp]))

    shape = (1, 16, 4, h, w)
    print(f"[interactive] init params ({net.model_channels}ch causal student), latent {h}x{w}", flush=True)
    with ctx:
        params = model.init_params(jax.random.PRNGKey(0), shape, text_len=8)
        emb = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 1024)) * 0.05
        cond = make_condition(emb)

        t0 = time.perf_counter()
        out = stream.generate(
            params, jax.random.PRNGKey(5), cond,
            init_latents=None, num_latent_frames=args.frames, latent_shape_hw=(h, w),
        )
        out = jax.device_get(out)
    dt = time.perf_counter() - t0
    assert np.isfinite(np.asarray(out)).all()
    lfps = args.frames / dt
    print(
        f"[interactive] streamed {args.frames} latent frames ({out.shape}) in {dt:.1f}s "
        f"incl compile -> {lfps:.2f} latent f/s ({4 * lfps:.1f} pixel fps; steady-state "
        f"rates in docs/PERF.md 'Interactive')",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
