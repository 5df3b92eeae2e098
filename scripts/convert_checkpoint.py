"""Convert released torch checkpoints to this repo's consolidated format.

Counterpart of the reference's checkpoint conversion script
(scripts/convert_distcp_to_pt.py there; converters live in
cosmos_predict2_tpu/utils/checkpoint_convert.py here):

    python scripts/convert_checkpoint.py --kind dit --num-blocks 28 \
        --input model.pt --output model.msgpack
    python scripts/convert_checkpoint.py --kind wan_vae --input Wan2.1_VAE.pth --output vae.msgpack
    python scripts/convert_checkpoint.py --kind wan22_vae ... / --kind wan_dit ... \
        / --kind qwen --num-blocks 28 ... / --kind clip_vision ...
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="torch -> JAX checkpoint conversion")
    p.add_argument("--kind", required=True,
                   choices=["dit", "wan_dit", "wan_vae", "wan22_vae", "qwen", "clip_vision"])
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True, help=".msgpack consolidated params")
    p.add_argument("--num-blocks", type=int, default=28)
    p.add_argument("--no-ema", action="store_true", help="dit: use regular instead of EMA weights")
    p.add_argument("--i2v", action="store_true", help="wan_dit: include the image-branch weights")
    args = p.parse_args(argv)

    from cosmos_predict2_tpu.training.checkpointing import save_consolidated
    from cosmos_predict2_tpu.utils import checkpoint_convert as cc

    sd = cc.load_torch_state_dict(args.input)
    if args.kind == "dit":
        prefix = "net." if args.no_ema else "net_ema."
        if not any(k.startswith(prefix) for k in sd):
            prefix = ""  # bare net state dict
        params = cc.convert_dit_state_dict(cc.strip_prefix(sd, prefix) if prefix else sd, args.num_blocks)
    elif args.kind == "wan_dit":
        params = cc.convert_wan_dit_state_dict(sd, args.num_blocks, i2v=args.i2v)
    elif args.kind == "wan_vae":
        params = cc.convert_vae_state_dict(sd)
    elif args.kind == "wan22_vae":
        params = cc.convert_wan22_vae_state_dict(sd)
    elif args.kind == "qwen":
        from cosmos_predict2_tpu.text_encoders.text_encoder import convert_qwen_hf_state_dict

        params = convert_qwen_hf_state_dict(sd, args.num_blocks)
    else:  # clip_vision
        from cosmos_predict2_tpu.text_encoders.clip_vision import convert_clip_vision_state_dict

        params = convert_clip_vision_state_dict(sd)

    save_consolidated(params, args.output)
    print(args.output)
    return 0


if __name__ == "__main__":
    sys.exit(main())
