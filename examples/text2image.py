"""Text2Image example: single-frame generation through the same DiT.

    COSMOS_SMOKE=1 python examples/text2image.py
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run():
    import dataclasses

    import jax.numpy as jnp

    from cosmos_predict2_tpu.inference.pipeline import InferenceSetup, Text2ImageInference
    from cosmos_predict2_tpu.models.video2world import RFModelConfig, Video2WorldModel
    from cosmos_predict2_tpu.networks.dit import PRESETS
    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig
    from cosmos_predict2_tpu.utils.flags import SMOKE

    import jax

    net = PRESETS["test" if SMOKE else "2B"]
    if SMOKE:
        net = dataclasses.replace(net, dtype=jnp.float32, remat="none")
    setup = InferenceSetup(
        model_config=RFModelConfig(net=net, state_t=1, sampling_num_steps=2 if SMOKE else 35),
        vae_config=WanVAEConfig(dim=16 if SMOKE else 96),
        resolution="480",
        size_override=(64, 64) if SMOKE else None,
    )
    model = Video2WorldModel(setup.model_config)
    params = model.init_params(jax.random.PRNGKey(0), (1, 16, 1, 8, 8), text_len=8 if SMOKE else 512)
    vae = WanVAE(setup.vae_config)
    vae_params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 64, 64, 3)))
    t2i = Text2ImageInference(
        setup, params, vae_params,
        text_encoder=lambda prompts: jnp.ones((len(prompts), 8 if SMOKE else 512, 1024)) * 0.01,
    )
    img = t2i.generate_image(t2i.encode_text(["a watercolor lighthouse"]))
    out = t2i.save_image(img, "outputs/text2image_sample.png")
    print("saved", out)


if __name__ == "__main__":
    run()
