import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import jax, jax.numpy as jnp
import numpy as np

# 1. frame-causal flash attention vs reference on TPU
from cosmos_predict2_tpu.ops.flash_attention import flash_attention
from cosmos_predict2_tpu.ops.attention import reference_attention
B, S, H, D = 1, 2048, 4, 128
q = jax.random.normal(jax.random.PRNGKey(0), (B, S, H, D), dtype=jnp.bfloat16)
k = jax.random.normal(jax.random.PRNGKey(1), (B, S, H, D), dtype=jnp.bfloat16)
v = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D), dtype=jnp.bfloat16)
fg = 512  # frame group of 512 tokens
out = flash_attention(q, k, v, frame_group=fg)
ref = reference_attention(q, k, v, frame_group=fg)
print("causal flash fwd err:", float(jnp.max(jnp.abs(out.astype(jnp.float32)-ref.astype(jnp.float32)))))
gf = jax.grad(lambda a: jnp.sum(flash_attention(a, k, v, frame_group=fg).astype(jnp.float32)**2))(q)
gr = jax.grad(lambda a: jnp.sum(reference_attention(a, k, v, frame_group=fg).astype(jnp.float32)**2))(q)
print("causal flash dq err:", float(jnp.max(jnp.abs(gf.astype(jnp.float32)-gr.astype(jnp.float32)))))

# 2. E2E Image2World drive through the public API (small 8-block model, bf16)
import dataclasses
from cosmos_predict2_tpu.inference.pipeline import InferenceSetup, Video2WorldInference, read_and_process_image
from cosmos_predict2_tpu.inference.api import Inference, InferenceArguments
from cosmos_predict2_tpu.models.video2world import RFModelConfig, Video2WorldModel
from cosmos_predict2_tpu.networks.dit import DiTConfig
from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig

net = DiTConfig(model_channels=512, num_heads=4, num_blocks=8, adaln_lora_dim=64,
                dtype=jnp.bfloat16, remat="none")
setup = InferenceSetup(model_config=RFModelConfig(net=net, state_t=5, sampling_num_steps=8),
                       vae_config=WanVAEConfig(dim=48, dtype=jnp.bfloat16),
                       size_override=(192, 320), text_len=16)
model = Video2WorldModel(setup.model_config)
params = model.init_params(jax.random.PRNGKey(0), (1, 16, 5, 24, 40), text_len=16)
vae = WanVAE(setup.vae_config)
vae_params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 5, 64, 64, 3), dtype=jnp.bfloat16))
pipe = Video2WorldInference(setup, params, vae_params,
                            text_encoder=lambda p: jnp.ones((len(p), 16, 1024), dtype=jnp.bfloat16) * 0.01)

from PIL import Image
import os
os.makedirs("/tmp/e2e", exist_ok=True)
Image.fromarray(np.random.RandomState(0).randint(0, 255, (192, 320, 3), dtype=np.uint8)).save("/tmp/e2e/input.png")
api = Inference(pipe, output_dir="/tmp/e2e/out", keep_going=False)
t0 = time.time()
paths = api.generate([InferenceArguments(name="i2w", prompt="a robot", input_path="/tmp/e2e/input.png",
                                         num_steps=8, guidance=7.0)])
print("E2E Image2World output:", paths, f"({time.time()-t0:.1f}s incl compile)")
# probe: Text2World (no input) and autoregressive
t0 = time.time()
paths2 = api.generate([InferenceArguments(name="t2w_ar", prompt="waves", num_steps=8,
                                          enable_autoregressive=True, num_output_frames=25,
                                          chunk_size=17, chunk_overlap=1)])
print("E2E autoregressive output:", paths2, f"({time.time()-t0:.1f}s)")
import os
for p in paths + paths2:
    print(p, os.path.getsize(p), "bytes")
