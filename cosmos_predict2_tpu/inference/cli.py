"""Inference CLI.

Parity with the reference's examples/inference.py + tyro CLI
(cosmos_predict2/config.py:380-472):

    python -m cosmos_predict2_tpu.inference.cli \
        --experiment=predict2_video2world_2b_rectified_flow \
        --checkpoint=path/to/model.msgpack --vae=path/to/Wan2.1_VAE.pth \
        --prompt "a robot pouring coffee" --input input.jpg \
        [--batch samples.json] [--num-steps 35] [--guidance 7] ...

COSMOS_SMOKE=1 uses random weights + 1 step for plumbing checks.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="cosmos_predict2_tpu inference")
    p.add_argument("--experiment", default="predict2_video2world_2b_rectified_flow")
    p.add_argument("--checkpoint", default=None, help="model params (.msgpack or torch .pt to convert)")
    p.add_argument("--vae", default=None, help="Wan2.1_VAE.pth (torch) or .msgpack params")
    p.add_argument("--text-encoder", default=None, help="Qwen text-encoder weights dir/safetensors")
    p.add_argument("--tokenizer-path", default=None, help="HF tokenizer dir for the text encoder")
    p.add_argument("--prompt", default="")
    p.add_argument("--negative-prompt", default="")
    p.add_argument("--input", dest="input_path", default=None)
    p.add_argument("--batch", default=None, help="json/jsonl batch of samples")
    p.add_argument("--output-dir", default="outputs")
    p.add_argument("--num-steps", type=int, default=None)
    p.add_argument("--guidance", type=float, default=7.0)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--resolution", default="480")
    p.add_argument("--num-conditional-frames", type=int, default=1)
    p.add_argument("--autoregressive", action="store_true")
    p.add_argument("--mode", choices=["video", "text2image"], default="video",
                   help="text2image: single-frame generation (reference inference/text2image.py)")
    p.add_argument("--num-output-frames", type=int, default=77)
    p.add_argument("--disable-guardrails", action="store_true")
    p.add_argument("--text-embedding-path", default=None, help=".npy precomputed embedding (offline path)")
    p.add_argument("--sampler", choices=["unipc", "dmd2"], default="unipc",
                   help="dmd2 = few-step distilled path (no CFG; needs distilled weights)")
    return p.parse_args(argv)


def build_pipeline(args):
    import jax
    import jax.numpy as jnp

    from cosmos_predict2_tpu.configs.defaults import make_config
    from cosmos_predict2_tpu.inference.pipeline import InferenceSetup, Video2WorldInference
    from cosmos_predict2_tpu.models.video2world import Video2WorldModel
    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig
    from cosmos_predict2_tpu.utils import log
    from cosmos_predict2_tpu.utils.flags import SMOKE

    config = make_config(args.experiment)
    model_cfg = config.model
    setup = InferenceSetup(
        model_config=model_cfg,
        vae_config=config.tokenizer,
        resolution=args.resolution,
        size_override=(192, 320) if SMOKE else None,
    )
    model = Video2WorldModel(model_cfg)
    if SMOKE:
        h, w = 192, 320
    else:
        from cosmos_predict2_tpu.utils.io import get_resolution

        w, h = get_resolution(args.resolution)
    latent_shape = (1, model_cfg.state_ch, model_cfg.state_t, h // 8, w // 8)

    if args.checkpoint and not SMOKE:
        if args.checkpoint.endswith((".pt", ".pth", ".safetensors")):
            from cosmos_predict2_tpu.utils.checkpoint_convert import convert_model_checkpoint

            params = jax.tree.map(jnp.asarray, convert_model_checkpoint(args.checkpoint, model_cfg.net.num_blocks))
            params = {"params": params["params"]}
            if model_cfg.net.scan_blocks:
                # torch checkpoints are always unrolled; stack into the
                # scanned layout the model expects
                from cosmos_predict2_tpu.utils.scan_params import adapt_block_layout

                params = adapt_block_layout(params, model_cfg.net)
        else:
            from cosmos_predict2_tpu.training.checkpointing import load_consolidated

            template = model.init_params(jax.random.PRNGKey(0), latent_shape)
            try:
                params = load_consolidated(template, args.checkpoint)
            except (ValueError, KeyError) as first_err:
                # checkpoint saved with the other DiT block layout
                # (unrolled blocks_i <-> stacked blocks_scan{start}):
                # deserialize against the flipped-layout template, then
                # convert to the layout this model expects
                from cosmos_predict2_tpu.utils.scan_params import adapt_block_layout

                log.warning(
                    f"checkpoint did not match the configured block layout "
                    f"({type(first_err).__name__}: {first_err}); retrying with "
                    f"the flipped scan_blocks layout"
                )
                flipped = dataclasses.replace(
                    model_cfg.net, scan_blocks=not model_cfg.net.scan_blocks
                )
                alt_template = adapt_block_layout(template, flipped)
                try:
                    params = adapt_block_layout(
                        load_consolidated(alt_template, args.checkpoint), model_cfg.net
                    )
                except (ValueError, KeyError) as second_err:
                    # both layouts failed: the checkpoint is corrupt or
                    # wrong-shape, not layout-flipped — surface the ORIGINAL
                    # error so the real cause isn't hidden behind the retry
                    raise first_err from second_err
    else:
        log.warning("no checkpoint given (or SMOKE): using random weights")
        params = model.init_params(jax.random.PRNGKey(0), latent_shape)

    vae = WanVAE(config.tokenizer)
    if args.vae and not SMOKE:
        if args.vae.endswith((".pt", ".pth")):
            from cosmos_predict2_tpu.utils.checkpoint_convert import convert_vae_state_dict, load_torch_state_dict

            vae_params = jax.tree.map(jnp.asarray, convert_vae_state_dict(load_torch_state_dict(args.vae)))
        else:
            from cosmos_predict2_tpu.training.checkpointing import load_consolidated

            template = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 5, 64, 64, 3)))
            vae_params = load_consolidated(template, args.vae)
    else:
        vae_params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 5, 64, 64, 3)))

    text_encoder = None
    if args.text_encoder:
        from cosmos_predict2_tpu.text_encoders.qwen import QwenConfig, QwenLM
        from cosmos_predict2_tpu.text_encoders.text_encoder import (
            CosmosTextEncoder,
            TextEncoderConfig,
            convert_qwen_hf_state_dict,
        )
        from cosmos_predict2_tpu.utils.checkpoint_convert import load_torch_state_dict

        te_cfg = TextEncoderConfig(tokenizer_path=args.tokenizer_path)
        sd = load_torch_state_dict(args.text_encoder)
        te_params = jax.tree.map(jnp.asarray, convert_qwen_hf_state_dict(sd, te_cfg.model.num_hidden_layers))
        encoder = CosmosTextEncoder(te_cfg, params=te_params)
        text_encoder = lambda prompts: encoder(prompts)
    elif SMOKE:
        import jax.numpy as jnp

        ctx_dim = (
            model_cfg.net.crossattn_proj_in_channels
            if model_cfg.net.use_crossattn_projection
            else model_cfg.net.crossattn_emb_channels
        )
        text_encoder = lambda prompts: jnp.zeros((len(prompts), 512, ctx_dim))

    return Video2WorldInference(setup, params, vae_params, text_encoder=text_encoder)


def main(argv=None) -> int:
    args = parse_args(argv)
    from cosmos_predict2_tpu.inference.api import Inference, InferenceArguments
    from cosmos_predict2_tpu.utils.flags import SMOKE
    from cosmos_predict2_tpu.utils.guardrails import create_text_guardrail_runner

    pipe = build_pipeline(args)
    guard = None if (args.disable_guardrails or SMOKE) else create_text_guardrail_runner()

    if args.mode == "text2image":
        import os

        from cosmos_predict2_tpu.inference.pipeline import Text2ImageInference

        if guard is not None and not guard(args.prompt):
            print("prompt rejected by guardrail"); return 1
        t2i = Text2ImageInference(pipe.setup, pipe.params, pipe.vae_params, text_encoder=pipe.text_encoder)
        img = t2i.generate_image(
            t2i.encode_text([args.prompt]),
            guidance=args.guidance,
            num_steps=args.num_steps or (1 if SMOKE else 35),
            seed=args.seed,
        )
        out = t2i.save_image(img, os.path.join(args.output_dir, "sample.png"))
        print(out)
        return 0

    api = Inference(pipe, output_dir=args.output_dir, text_guardrail=guard)

    if args.batch:
        samples = InferenceArguments.from_file(args.batch)
    else:
        samples = [
            InferenceArguments(
                name="sample",
                prompt=args.prompt,
                negative_prompt=args.negative_prompt,
                input_path=args.input_path,
                num_steps=args.num_steps or ((1 if SMOKE else 35) if args.sampler == "unipc" else 4),
                guidance=args.guidance,
                seed=args.seed,
                num_conditional_frames=args.num_conditional_frames,
                enable_autoregressive=args.autoregressive,
                num_output_frames=args.num_output_frames,
                text_embedding_path=args.text_embedding_path,
                sampler=args.sampler,
            )
        ]
    outputs = api.generate(samples)
    print("\n".join(outputs))
    return 0 if outputs else 1


if __name__ == "__main__":
    sys.exit(main())
