"""Drive text2image + multiview pipelines end-to-end on the real chip."""
import sys, time
sys.path.insert(0, "/root/repo")
import dataclasses
import numpy as np
import jax, jax.numpy as jnp

from cosmos_predict2_tpu.inference.pipeline import InferenceSetup, Text2ImageInference
from cosmos_predict2_tpu.inference.multiview import MultiviewInference, MultiviewInferenceArguments
from cosmos_predict2_tpu.models.video2world import RFModelConfig, Video2WorldModel
from cosmos_predict2_tpu.models.multiview import MultiviewVid2VidModel, multiview_model_config
from cosmos_predict2_tpu.networks.dit import PRESETS
from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig

print("backend:", jax.default_backend())
net = dataclasses.replace(PRESETS["mini"], dtype=jnp.bfloat16, remat="none")
fake_te = lambda prompts: jnp.ones((len(prompts), 512, 1024), jnp.bfloat16) * 0.01

# ---- text2image at 480 bucket ----
t0 = time.time()
setup = InferenceSetup(
    model_config=RFModelConfig(net=net, state_t=1, sampling_num_steps=10),
    vae_config=WanVAEConfig(dim=96), resolution="480", aspect="16,9",
)
model = Video2WorldModel(setup.model_config)
params = model.init_params(jax.random.PRNGKey(0), (1, 16, 1, 60, 104), text_len=512)
vae = WanVAE(setup.vae_config)
vae_params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 64, 64, 3)))
t2i = Text2ImageInference(setup, params, vae_params, text_encoder=fake_te)
img = t2i.generate_image(t2i.encode_text(["a watercolor lighthouse"]), num_steps=10)
print(f"text2image 480x832: img {img.shape} in {time.time()-t0:.1f}s (incl. compile)")
t2i.save_image(img, "/tmp/t2i_tpu.png")

# ---- multiview 2 views ----
t0 = time.time()
mcfg = multiview_model_config(dataclasses.replace(net, num_heads=8), n_views=2, state_t=2, sampling_num_steps=6)
mv_model = MultiviewVid2VidModel(mcfg)
mv_params = mv_model.init_params(jax.random.PRNGKey(2), (1, 16, 4, 30, 52), text_len=1024)
pipe = MultiviewInference(mv_model, mv_params, vae_params, setup.vae_config,
                          text_encoder=fake_te, height=240, width=416)
videos = np.random.RandomState(0).randint(0, 255, (2, 5, 240, 416, 3), dtype=np.uint8)
frames, grid = pipe.generate(
    MultiviewInferenceArguments(prompt="driving", inference_type="image2world", n_views=2, num_steps=6),
    videos,
)
print(f"multiview 2x{frames.shape[1]}f 240x416: grid {grid.shape} in {time.time()-t0:.1f}s (incl. compile)")
print("finite:", np.isfinite(frames).all())
