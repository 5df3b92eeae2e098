"""Video tokenizer interface.

Capability parity with the reference tokenizer interface + Wan wrapper
(cosmos_predict2/_src/predict2/tokenizers/interface.py:25-98 and
wan2pt1.py:961-1060 ``Wan2pt1VAEInterface``): latent/pixel frame
conversions, compression factors, chunk_duration, and the **second-stage**
latent normalization — image batches via (img_mean, img_std), video
batches via per-latent-frame (video_mean[:, :, :t], video_std[:, :, :t]);
identity unless statistics are loaded (reference defaults zeros/ones).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig


@dataclasses.dataclass
class VAEInterfaceConfig:
    vae: WanVAEConfig = WanVAEConfig()
    chunk_duration: int = 81  # pixel frames per chunk (reference default)
    max_latent_frames: int = 50  # video_mean/std table length (reference 1,1,50,1,1)


class WanVAEInterface:
    """Model-facing tokenizer: (B, C, T, H, W) pixels <-> (B, 16, t, h, w) latents."""

    def __init__(
        self,
        config: VAEInterfaceConfig,
        params,
        img_mean: Optional[np.ndarray] = None,
        img_std: Optional[np.ndarray] = None,
        video_mean: Optional[np.ndarray] = None,
        video_std: Optional[np.ndarray] = None,
    ):
        self.config = config
        self.vae = WanVAE(config.vae)
        self.params = params
        ch = config.vae.z_dim
        t = config.max_latent_frames
        self.img_mean = jnp.asarray(img_mean if img_mean is not None else np.zeros((1, ch, 1, 1, 1)), jnp.float32)
        self.img_std = jnp.asarray(img_std if img_std is not None else np.ones((1, ch, 1, 1, 1)), jnp.float32)
        self.video_mean = jnp.asarray(
            video_mean if video_mean is not None else np.zeros((1, 1, t, 1, 1)), jnp.float32
        )
        self.video_std = jnp.asarray(video_std if video_std is not None else np.ones((1, 1, t, 1, 1)), jnp.float32)
        self._encode = jax.jit(lambda p, v: self.vae.apply(p, v, method=WanVAE.encode))
        self._decode = jax.jit(lambda p, z: self.vae.apply(p, z, method=WanVAE.decode))

    # ------------------------- frame conversions -------------------------

    def get_latent_num_frames(self, num_pixel_frames: int) -> int:
        return 1 + (num_pixel_frames - 1) // 4

    def get_pixel_num_frames(self, num_latent_frames: int) -> int:
        return (num_latent_frames - 1) * 4 + 1

    @property
    def spatial_compression_factor(self) -> int:
        return 8

    @property
    def temporal_compression_factor(self) -> int:
        return 4

    @property
    def latent_ch(self) -> int:
        return self.config.vae.z_dim

    @property
    def pixel_chunk_duration(self) -> int:
        return self.config.chunk_duration

    @property
    def latent_chunk_duration(self) -> int:
        return self.get_latent_num_frames(self.config.chunk_duration)

    @property
    def name(self) -> str:
        return "wan2pt1_tokenizer"

    # ------------------------------ codec ------------------------------

    def _stats(self, t: int):
        if t == 1:
            return self.img_mean, self.img_std
        return self.video_mean[:, :, :t], self.video_std[:, :, :t]

    def encode(self, state_B_C_T_H_W: jax.Array) -> jax.Array:
        z = self._encode(self.params, state_B_C_T_H_W.transpose(0, 2, 3, 4, 1))
        z = z.transpose(0, 4, 1, 2, 3).astype(jnp.float32)  # (B, 16, t, h, w)
        mean, std = self._stats(z.shape[2])
        return (z - mean) / std

    def decode(self, latent_B_C_T_H_W: jax.Array) -> jax.Array:
        mean, std = self._stats(latent_B_C_T_H_W.shape[2])
        z = latent_B_C_T_H_W.astype(jnp.float32) * std + mean
        px = self._decode(self.params, z.transpose(0, 2, 3, 4, 1))
        return px.transpose(0, 4, 1, 2, 3)  # (B, 3, T, H, W)
