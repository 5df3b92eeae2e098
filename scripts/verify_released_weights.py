"""Released-weights verifier: convert -> load -> generate -> PSNR, one command.

The single unproven claim of this rebuild is output parity against the CUDA
reference with *real* released checkpoints (no egress here). This script is
the readiness kit: the day weights are present, one command runs the whole
chain and reports PSNR against stored goldens (reference contract:
predict2/utils/model_loader.py:33-171 rebuilds the train config from the
checkpoint's experiment name; scripts/convert_distcp_to_pt.py is the
conversion direction).

    # bless goldens from a trusted run (e.g. reference outputs, or a first
    # verified run of this stack):
    python scripts/verify_released_weights.py --dit model_ema_bf16.pt \
        --vae Wan2.1_VAE.pth --golden goldens/2b_base.npz --write-golden

    # verify:
    python scripts/verify_released_weights.py --dit model_ema_bf16.pt \
        --vae Wan2.1_VAE.pth --golden goldens/2b_base.npz --psnr-min 35

Offline self-test: tests/test_verify_released_weights.py manufactures
synthetic checkpoints at the TRUE released tensor shapes via
utils/checkpoint_export.py and runs this script end-to-end.

Prints one JSON line: {"ok": bool, "psnr_db": float, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="released-weights verification")
    p.add_argument("--dit", default=None, help="consolidated DiT .pt (net/net_ema namespaces)")
    p.add_argument("--vae", default=None, help="Wan VAE .pth")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint-DB uuid/name; resolves --dit via the DB when omitted")
    p.add_argument("--experiment", default=(
        "Stage-c_pt_4-reason_embeddings-v1p1-Index-26-Size-2B-Res-720-Fps-16"
        "-Note-T2V_high_sigma_loss_reweighted_1_1_rectified_flow_only_resume2"))
    p.add_argument("--golden", default=None, help=".npz with blessed output pixels")
    p.add_argument("--write-golden", action="store_true")
    p.add_argument("--psnr-min", type=float, default=35.0)
    p.add_argument("--steps", type=int, default=2)
    p.add_argument("--frames", type=int, default=5)
    p.add_argument("--height", type=int, default=64)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--guidance", type=float, default=7.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-ema", action="store_true")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    return p.parse_args(argv)


def _shape_diff(template, params) -> list[str]:
    """Structure + shape mismatches between the model template and the
    converted tree (the converter contract at real tensor shapes)."""
    import jax

    t_flat = {"/".join(str(getattr(k, "key", k)) for k in path): leaf
              for path, leaf in jax.tree_util.tree_flatten_with_path(template)[0]}
    p_flat = {"/".join(str(getattr(k, "key", k)) for k in path): leaf
              for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]}
    errs = []
    for k in sorted(set(t_flat) | set(p_flat)):
        if k not in p_flat:
            errs.append(f"missing in checkpoint: {k} {tuple(t_flat[k].shape)}")
        elif k not in t_flat:
            errs.append(f"unexpected in checkpoint: {k} {tuple(p_flat[k].shape)}")
        elif tuple(t_flat[k].shape) != tuple(p_flat[k].shape):
            errs.append(f"shape mismatch {k}: model {tuple(t_flat[k].shape)} vs ckpt {tuple(p_flat[k].shape)}")
    return errs


def main(argv=None) -> int:
    args = parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from cosmos_predict2_tpu.conditioning.conditioner import make_condition
    from cosmos_predict2_tpu.configs.defaults import make_config
    from cosmos_predict2_tpu.models.video2world import Video2WorldModel
    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE
    from cosmos_predict2_tpu.utils import checkpoint_convert as cc
    from cosmos_predict2_tpu.utils.misc import arch_invariant_rand

    dit_path = args.dit
    if dit_path is None:
        if args.checkpoint is None:
            print(json.dumps({"ok": False, "error": "need --dit or --checkpoint"}))
            return 2
        from cosmos_predict2_tpu.utils.checkpoint_db import get_checkpoint_path

        dit_path = get_checkpoint_path(args.checkpoint)

    cfg = make_config(args.experiment)
    model = Video2WorldModel(cfg.model)

    lt = 1 + (args.frames - 1) // 4
    latent_shape = (1, cfg.model.state_ch, lt, args.height // 8, args.width // 8)

    # 1. convert
    params = cc.convert_model_checkpoint(dit_path, cfg.model.net.num_blocks, use_ema=not args.no_ema)

    # 2. contract check against the model's own init template (true shapes)
    template = jax.eval_shape(
        lambda rng: model.init_params(rng, latent_shape, text_len=512), jax.random.PRNGKey(0)
    )
    errs = _shape_diff(template, params)
    if errs:
        print("\n".join(errs[:40]), file=sys.stderr)
        print(json.dumps({"ok": False, "error": f"{len(errs)} converter contract violations"}))
        return 1

    # 3. deterministic 2-step generation (arch-invariant noise: reproducible
    #    across TPU/CPU/GPU backends, reference misc.py arch_invariant_rand)
    params = jax.tree.map(jnp.asarray, params)
    noise = arch_invariant_rand(latent_shape, args.seed)
    ctx_dim = (
        cfg.model.net.crossattn_proj_in_channels
        if cfg.model.net.use_crossattn_projection
        else cfg.model.net.crossattn_emb_channels
    )
    text_emb = arch_invariant_rand((1, 512, ctx_dim), args.seed + 1)
    condition = make_condition(text_emb, fps=jnp.full((1,), 16.0))
    latents = model.generate(
        params, noise, condition, guidance=args.guidance, num_steps=args.steps,
        num_conditional_frames=0,
    )

    # 4. VAE decode (skipped when --vae is absent: latents are then the
    #    compared artifact)
    if args.vae:
        vae = WanVAE(cfg.tokenizer)
        vae_params = jax.tree.map(jnp.asarray, cc.convert_vae_state_dict(cc.load_torch_state_dict(args.vae)))
        pixels = vae.apply(
            vae_params, latents.transpose(0, 2, 3, 4, 1), method=WanVAE.decode
        )
        out = np.asarray(pixels, dtype=np.float32)
    else:
        out = np.asarray(latents, dtype=np.float32)

    meta = dict(
        experiment=args.experiment, steps=args.steps, frames=args.frames,
        height=args.height, width=args.width, seed=args.seed, guidance=args.guidance,
        decoded=bool(args.vae),
    )

    if args.write_golden:
        assert args.golden, "--write-golden requires --golden PATH"
        os.makedirs(os.path.dirname(os.path.abspath(args.golden)), exist_ok=True)
        np.savez_compressed(args.golden, pixels=out, meta=json.dumps(meta))
        print(json.dumps({"ok": True, "golden_written": args.golden, **meta}))
        return 0

    if not args.golden:
        print(json.dumps({"ok": True, "note": "no golden given; conversion+generation ran clean",
                          "out_mean": float(out.mean()), "out_std": float(out.std()), **meta}))
        return 0

    blessed = np.load(args.golden, allow_pickle=False)
    ref = blessed["pixels"].astype(np.float32)
    if ref.shape != out.shape:
        print(json.dumps({"ok": False, "error": f"golden shape {ref.shape} vs output {out.shape}"}))
        return 1
    mse = float(np.mean((ref - out) ** 2))
    # pixel range is [-1, 1] -> peak-to-peak 2
    psnr = float("inf") if mse == 0 else 10.0 * np.log10(4.0 / mse)
    ok = psnr >= args.psnr_min
    print(json.dumps({"ok": bool(ok), "psnr_db": round(psnr, 2), "psnr_min": args.psnr_min, **meta}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
