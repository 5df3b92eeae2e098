"""Legacy EDM-parameterized diffusion model (pre-rectified-flow).

Capability parity with the reference EDM models
(cosmos_predict2/_src/predict2/models/text2world_model.py:126 +
video2world_model.py, with the res_sampler "2ab" solver): EDM
preconditioning (c_skip/c_out/c_in/c_noise), log-normal sigma sampling for
training with the EDM loss weight (sigma^2+sd^2)/(sigma*sd)^2, and
CFG x0 sampling through the Karras multistep sampler.

Shares the DiT, conditioner, and FRAME_REPLACE machinery with the RF model.
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
from cosmos_predict2_tpu.models.video2world import RFModelConfig, Video2WorldModel
from cosmos_predict2_tpu.schedulers import edm_sampler


@dataclasses.dataclass(frozen=True)
class EDMModelConfig:
    model: RFModelConfig = RFModelConfig()
    sigma_data: float = 0.5
    p_mean: float = -1.2  # log-normal training sigma
    p_std: float = 1.2
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    # the reference scales c_noise by the net's timestep convention
    c_noise_scale: float = 1000.0


class EDMVideo2WorldModel:
    def __init__(self, config: EDMModelConfig):
        self.config = config
        self.base = Video2WorldModel(config.model)

    def init_params(self, *args, **kwargs):
        return self.base.init_params(*args, **kwargs)

    # ----------------------------- denoise -----------------------------

    def denoise(self, params, xt: jax.Array, sigma_B: jax.Array, condition: Video2WorldCondition) -> jax.Array:
        """x0 prediction with EDM preconditioning + FRAME_REPLACE."""
        cfg = self.config
        sd = cfg.sigma_data
        sigma = sigma_B.reshape(-1, 1, 1, 1, 1).astype(jnp.float32)
        c_skip, c_out, c_in, c_noise = edm_sampler.edm_scalings(sigma, sd)

        net_in = xt.astype(jnp.float32) * c_in
        mask = None
        if condition.is_video and condition.condition_video_mask is not None:
            mask = condition.condition_video_mask.astype(jnp.float32)
            use_vc = jnp.asarray(condition.use_video_condition).astype(jnp.float32)
            gt_in = condition.gt_frames.astype(jnp.float32) * use_vc
            net_in = gt_in * c_in * mask + net_in * (1.0 - mask)

        ts = jnp.broadcast_to(c_noise[:, 0, 0, 0, 0], (xt.shape[0],)) * cfg.c_noise_scale
        net_out = self.base.net.apply(
            params,
            net_in.astype(cfg.model.net.dtype),
            ts,
            condition.crossattn_emb,
            fps=condition.fps,
            padding_mask=condition.padding_mask,
        ).astype(jnp.float32)
        x0 = c_skip * xt.astype(jnp.float32) + c_out * net_out
        if condition.is_video and mask is not None and cfg.model.denoise_replace_gt_frames:
            x0 = condition.gt_frames.astype(jnp.float32) * mask + x0 * (1.0 - mask)
        return x0

    # ----------------------------- training -----------------------------

    def training_step(self, params, rng, x0_B_C_T_H_W, condition):
        cfg = self.config
        B = x0_B_C_T_H_W.shape[0]
        rng_s, rng_e, rng_k = jax.random.split(rng, 3)
        if condition.is_video and condition.gt_frames is not None:
            k = self.base.sample_num_conditional_frames(rng_k, B)
            condition = condition.set_video_condition(condition.gt_frames, k)
        sigma = jnp.exp(cfg.p_mean + cfg.p_std * jax.random.normal(rng_s, (B,)))
        eps = jax.random.normal(rng_e, x0_B_C_T_H_W.shape, dtype=jnp.float32)
        xt = x0_B_C_T_H_W.astype(jnp.float32) + sigma.reshape(-1, 1, 1, 1, 1) * eps
        x0_pred = self.denoise(params, xt, sigma, condition)
        sd = cfg.sigma_data
        weight = (sigma**2 + sd**2) / jnp.square(sigma * sd)
        per_instance = jnp.mean(jnp.square(x0_pred - x0_B_C_T_H_W), axis=tuple(range(1, x0_pred.ndim)))
        loss = jnp.mean(weight * per_instance)
        return loss, {"loss": loss, "sigma_mean": jnp.mean(sigma)}

    # ----------------------------- sampling -----------------------------

    def generate(
        self,
        params,
        noise: jax.Array,
        condition: Video2WorldCondition,
        guidance: float = 7.0,
        num_steps: int = 35,
        num_conditional_frames: int = 1,
        rng: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        condition, uncondition = get_condition_uncondition(condition)
        if condition.is_video and condition.gt_frames is not None:
            condition = condition.edit_for_inference(True, num_conditional_frames)
            uncondition = uncondition.edit_for_inference(False, num_conditional_frames)

        def x0_fn(x, sigma_scalar):
            sb = jnp.broadcast_to(sigma_scalar, (x.shape[0],))
            cond_x0 = self.denoise(params, x, sb, condition)
            uncond_x0 = self.denoise(params, x, sb, uncondition)
            return cond_x0 + guidance * (cond_x0 - uncond_x0)

        return edm_sampler.sample(
            x0_fn,
            noise.astype(jnp.float32) * cfg.sigma_max,
            num_steps=num_steps,
            sigma_min=cfg.sigma_min,
            sigma_max=cfg.sigma_max,
            rho=cfg.rho,
            rng=rng,
        )
