import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from cosmos_predict2_tpu.text_encoders.clip_vision import CLIPVisionConfig, CLIPVisionTower
from cosmos_predict2_tpu.models.wan_video2world import (
    WanModelConfig, WanVideo2WorldModel, make_i2v_condition)
from cosmos_predict2_tpu.networks.wan_dit import WanConfig

clip_cfg = CLIPVisionConfig(image_size=28, patch_size=14, dim=16, num_heads=2, num_layers=3, dtype=jnp.float32)
tower = CLIPVisionTower(clip_cfg)
clip_params = tower.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3)))

net = WanConfig(model_type="i2v", dim=32, ffn_dim=64, num_heads=2, num_layers=2,
                text_dim=48, clip_dim=16, in_dim=36, out_dim=16, dtype=jnp.float32)
cfg = WanModelConfig(net=net, state_t=3, sampling_num_steps=4)
model = WanVideo2WorldModel(cfg)
latent_shape = (1, 16, 3, 4, 4)
params = model.init_params(jax.random.PRNGKey(1), latent_shape, text_len=8)

video = jax.random.uniform(jax.random.PRNGKey(2), (1, 9, 28, 28, 3), minval=-1, maxval=1)
latents = jax.random.normal(jax.random.PRNGKey(3), latent_shape)
text = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 48))
cond = make_i2v_condition(text, latents, tower, clip_params, video)
print("clip_emb", cond.clip_emb.shape, "mask frame0/1:",
      float(cond.condition_video_mask[0,0,0,0,0]), float(cond.condition_video_mask[0,0,1,0,0]))
noise = jax.random.normal(jax.random.PRNGKey(5), latent_shape)
out = model.generate(params, noise, cond, guidance=3.0)
print("generated", out.shape, "finite:", bool(np.isfinite(np.asarray(out)).all()))
# text-only path: zero CLIP context, empty mask
cond2 = make_i2v_condition(text, latents)
assert cond2.clip_emb.shape == (1, 257, 1280) and float(cond2.condition_video_mask.sum()) == 0.0
print("t2v-case condition OK")
