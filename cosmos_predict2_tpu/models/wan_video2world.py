"""Wan2.1-flavored Text2World / Video2World model layer.

Capability parity with the reference Wan model classes
(cosmos_predict2/_src/predict2/models/text2world_wan2pt1_model.py:754 and
video2world_wan2pt1_model.py): rectified-flow training/sampling over the
WanModel backbone, with Wan's i2v conditioning layout — instead of
FRAME_REPLACE, the conditional frames enter as extra input channels
``y = [mask (4ch), masked latents (16ch)]`` and a CLIP image embedding
feeds the dedicated cross-attention branch. Text is umT5 (4096-d).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from cosmos_predict2_tpu.conditioning.conditioner import (
    Video2WorldCondition,
    get_condition_uncondition,
)
from cosmos_predict2_tpu.networks.wan_dit import WanConfig, WanModel
from cosmos_predict2_tpu.schedulers import unipc
from cosmos_predict2_tpu.schedulers.rectified_flow import RectifiedFlow, RectifiedFlowConfig


@dataclasses.dataclass(frozen=True)
class WanModelConfig:
    net: WanConfig = WanConfig()
    rectified_flow: RectifiedFlowConfig = RectifiedFlowConfig(shift=5.0, train_time_distribution="logitnormal")
    state_ch: int = 16
    state_t: int = 21  # Wan 81-frame default
    loss_scale: float = 1.0
    sampling_num_steps: int = 35
    sampling_shift: float = 5.0


from flax import struct


@struct.dataclass
class WanCondition:
    """Wan conditioning bundle: umT5 text + optional CLIP image features +
    conditional latents/mask for the i2v channel concat."""

    crossattn_emb: jax.Array  # (B, 512, 4096)
    clip_emb: Optional[jax.Array] = None  # (B, 257, 1280)
    gt_frames: Optional[jax.Array] = None  # (B, 16, T, h, w)
    condition_video_mask: Optional[jax.Array] = None  # (B, 1, T, 1, 1)
    padding_mask: Optional[jax.Array] = None


def make_i2v_condition(
    crossattn_emb: jax.Array,
    media_latents_B_C_T_H_W: jax.Array,
    clip_tower=None,
    clip_params=None,
    video_pm1_B_T_H_W_C: Optional[jax.Array] = None,
) -> WanCondition:
    """Build the Wan i2v conditioning bundle (reference clip.py:570-588
    Wan2pt1CLIPEmb.forward): CLIP-encode the first pixel frame for the image
    cross-attention branch and mark latent frame 0 as conditional. For the
    text-only/image-gen case (no input video) the CLIP context is zeros and
    the mask stays empty."""
    B, C, T, H, W = media_latents_B_C_T_H_W.shape
    if video_pm1_B_T_H_W_C is not None and clip_tower is not None:
        from cosmos_predict2_tpu.text_encoders.clip_vision import encode_first_frame

        clip_emb = encode_first_frame(clip_tower, clip_params, video_pm1_B_T_H_W_C)
        mask = jnp.zeros((B, 1, T, 1, 1)).at[:, :, :1].set(1.0)
    else:
        clip_emb = jnp.zeros((B, 257, 1280))
        mask = jnp.zeros((B, 1, T, 1, 1))
    return WanCondition(
        crossattn_emb=crossattn_emb,
        clip_emb=clip_emb,
        gt_frames=media_latents_B_C_T_H_W,
        condition_video_mask=mask,
    )


class WanVideo2WorldModel:
    def __init__(self, config: WanModelConfig):
        self.config = config
        self.net = WanModel(config.net)
        self.rectified_flow = RectifiedFlow(config.rectified_flow)

    def init_params(self, rng, latent_shape, text_len: int = 512):
        B, C, T, H, W = latent_shape
        x = jnp.zeros(latent_shape)
        ts = jnp.zeros((B,))
        ctx = jnp.zeros((B, text_len, self.config.net.text_dim))
        kwargs = {}
        if self.config.net.model_type in ("i2v", "flf2v"):
            kwargs["y_B_C_T_H_W"] = jnp.zeros((B, self.config.net.in_dim - C, T, H, W))
            kwargs["frame_cond_crossattn_emb"] = jnp.zeros((B, 257, self.config.net.clip_dim))
        return self.net.init(rng, x, ts, ctx, **kwargs)

    def _build_y(self, condition: WanCondition, latent_shape) -> Optional[jax.Array]:
        """i2v conditional input channels: [mask x4 | masked gt latents]."""
        if self.config.net.model_type not in ("i2v", "flf2v"):
            return None
        B, C, T, H, W = latent_shape
        extra = self.config.net.in_dim - C  # typically 20
        if condition.gt_frames is None or condition.condition_video_mask is None:
            return jnp.zeros((B, extra, T, H, W), dtype=jnp.float32)
        mask = jnp.broadcast_to(condition.condition_video_mask, (B, 1, T, H, W)).astype(jnp.float32)
        mask4 = jnp.broadcast_to(mask, (B, extra - C, T, H, W))
        masked_latents = condition.gt_frames.astype(jnp.float32) * mask
        return jnp.concatenate([mask4, masked_latents], axis=1)

    def denoise(self, params, xt, timesteps_B, condition: WanCondition) -> jax.Array:
        y = self._build_y(condition, xt.shape)
        return self.net.apply(
            params,
            xt.astype(self.config.net.dtype),
            timesteps_B,
            condition.crossattn_emb,
            y_B_C_T_H_W=y,
            frame_cond_crossattn_emb=condition.clip_emb,
            padding_mask=condition.padding_mask,
        ).astype(jnp.float32)

    def training_step(self, params, rng, x0_B_C_T_H_W, condition: WanCondition):
        cfg = self.config
        B = x0_B_C_T_H_W.shape[0]
        rng_eps, rng_t = jax.random.split(rng)
        eps = jax.random.normal(rng_eps, x0_B_C_T_H_W.shape, dtype=jnp.float32)
        u = self.rectified_flow.sample_train_time(rng_t, B)
        timesteps, sigmas = self.rectified_flow.discretize(u)
        xt, v_target = self.rectified_flow.get_interpolation(eps, x0_B_C_T_H_W.astype(jnp.float32), sigmas)
        v_pred = self.denoise(params, xt, timesteps, condition)
        per_instance = jnp.mean(jnp.square(v_pred - v_target), axis=tuple(range(1, v_pred.ndim)))
        loss = jnp.mean(per_instance) * cfg.loss_scale
        return loss, {"loss": loss}

    def generate(
        self,
        params,
        noise: jax.Array,
        condition: WanCondition,
        guidance: float = 5.0,
        num_steps: Optional[int] = None,
        shift: Optional[float] = None,
        negative_text_embeddings: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        coeffs = unipc.set_timesteps(num_steps or cfg.sampling_num_steps, shift=shift or cfg.sampling_shift)
        uncond_text = (
            negative_text_embeddings
            if negative_text_embeddings is not None
            else jnp.zeros_like(condition.crossattn_emb)
        )
        uncondition = condition.replace(crossattn_emb=uncond_text)

        def velocity_fn(x, t):
            ts = jnp.broadcast_to(t, (x.shape[0],)).astype(jnp.float32)
            cond_v = self.denoise(params, x, ts, condition)
            uncond_v = self.denoise(params, x, ts, uncondition)
            return uncond_v + guidance * (cond_v - uncond_v)

        return unipc.sample(velocity_fn, noise.astype(jnp.float32), coeffs)
