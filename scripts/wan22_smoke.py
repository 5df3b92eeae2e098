import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax, jax.numpy as jnp
from cosmos_predict2_tpu.tokenizers.wan22_vae import Wan22VAE, Wan22VAEConfig

cfg = Wan22VAEConfig(dim=8, dec_dim=8, z_dim=48, dtype=jnp.float32)
vae = Wan22VAE(cfg)
clip = jax.random.uniform(jax.random.PRNGKey(0), (1, 5, 32, 32, 3), minval=-1, maxval=1)
params = vae.init(jax.random.PRNGKey(1), clip)
z = vae.apply(params, clip, method=Wan22VAE.encode)
print("wan2.2 latent:", z.shape, "(expect (1, 2, 2, 2, 48))")
rec = vae.apply(params, z, method=Wan22VAE.decode)
print("wan2.2 recon:", rec.shape, "finite:", bool(jnp.isfinite(rec).all()))
# causality probe
z2 = vae.apply(params, clip.at[:, 3:].set(-clip[:, 3:]), method=Wan22VAE.encode)
import numpy as np
print("latent frame0 causal:", float(np.abs(np.asarray(z[:, 0]) - np.asarray(z2[:, 0])).max()))
