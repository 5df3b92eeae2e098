"""DMD2 few-step distillation (TrigFlow parameterization).

Capability parity with the reference distillation stack
(cosmos_predict2/_src/predict2/distill/models/: DistillationCoreMixin
training phases, video2world_model_distill_dmd2.py:85-365 losses and
backward simulation; modules/denoiser_scaling.py TrigFlow->EDM scalings;
few-step inference generate_samples_from_batch_dmd2 at
text2world_model_rectified_flow.py:603-677):

* three networks — student generator, frozen teacher, fake-score critic —
  share one architecture; here they are three param pytrees over one Flax
  module, so the jitted steps are pure functions of all three.
* student phase: G_x0 = few-step backward simulation (grad on last step);
  DMD gradient trick loss (G - (G - grad).detach())^2 with the per-sample
  |G - teacher| normalization.
* critic phase: fake-score denoising loss (G_x0 - fake_x0)^2 / sin(t)^2.
* 4-step inference schedule [pi/2, atan 15, atan 5, atan 5/3]
  (distill/configs/experiment/experiments_dmd2_trigflow.py:179).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from cosmos_predict2_tpu.conditioning.conditioner import Video2WorldCondition
from cosmos_predict2_tpu.models.video2world import RFModelConfig, Video2WorldModel

DEFAULT_SAMPLING_TIMES = (math.pi / 2, math.atan(15.0), math.atan(5.0), math.atan(5.0 / 3.0))


def trigflow_scalings_rf(t: jax.Array, sigma_data: float = 1.0):
    """RectifiedFlow_sCMWrapper (denoiser_scaling.py:46-67), fp64->fp32."""
    t = t.astype(jnp.float64)
    denom = jnp.cos(t) + sigma_data * jnp.sin(t)
    c_skip = sigma_data / denom
    c_out = -sigma_data * jnp.sin(t) / denom
    c_in = sigma_data / denom
    c_noise = sigma_data * jnp.sin(t) / denom
    to32 = lambda a: a.astype(jnp.float32)
    return to32(c_skip), to32(c_out), to32(c_in), to32(c_noise)


def trigflow_scalings_edm(t: jax.Array, sigma_data: float = 1.0):
    """EDM_sCMWrapper (denoiser_scaling.py:28-44)."""
    t = t.astype(jnp.float64)
    sigma = jnp.tan(t) * sigma_data
    c_skip = sigma_data * jnp.cos(t)
    c_out = sigma_data * jnp.sin(t)
    c_in = jnp.ones_like(t)
    c_noise = 0.25 * jnp.log(sigma)
    to32 = lambda a: a.astype(jnp.float32)
    return to32(c_skip), to32(c_out), to32(c_in), to32(c_noise)


@dataclasses.dataclass(frozen=True)
class DistillationConfig:
    model: RFModelConfig = RFModelConfig()
    selected_sampling_time: tuple[float, ...] = DEFAULT_SAMPLING_TIMES
    scaling: str = "rectified_flow"  # or "edm"
    sigma_data: float = 1.0
    sigma_conditional: float = 1e-4
    teacher_guidance: float = 0.0
    student_update_freq: int = 5
    loss_scale_sid: float = 1.0
    loss_scale_fake_score: float = 1.0
    timestep_shift: float = 5.0  # critic time sampling shift
    # timestep that the nets were trained with (RF nets take c_noise*1000)
    c_noise_scale: float = 1000.0


class DistillationModel:
    """DMD2 trainer/sampler over (student, teacher, fake_score) param trees."""

    def __init__(self, config: DistillationConfig):
        self.config = config
        self.base = Video2WorldModel(config.model)

    @property
    def scalings(self):
        return trigflow_scalings_rf if self.config.scaling == "rectified_flow" else trigflow_scalings_edm

    # ----------------------------- denoise -----------------------------

    def denoise_edm(
        self,
        params,
        xt_B_C_T_H_W: jax.Array,
        time_B_T: jax.Array,
        condition: Video2WorldCondition,
        return_F: bool = False,
    ):
        """EDM-parameterized denoise under TrigFlow time
        (video2world_model_rectified_flow.py:214-346). Returns x0 prediction
        (and optionally the TrigFlow F prediction)."""
        cfg = self.config
        sd = cfg.sigma_data
        if time_B_T.ndim == 1:
            time_B_T = time_B_T[:, None]
        time_B_1_T_1_1 = time_B_T[:, None, :, None, None].astype(jnp.float32)

        mask = None
        if condition.is_video and condition.condition_video_mask is not None:
            mask = condition.condition_video_mask.astype(jnp.float32)
            t_cond = jnp.arctan(jnp.asarray(cfg.sigma_conditional / sd, dtype=jnp.float32))
            time_B_1_T_1_1 = t_cond * mask + time_B_1_T_1_1 * (1.0 - mask)

        c_skip, c_out, c_in, c_noise = self.scalings(time_B_1_T_1_1, sd)
        net_in = xt_B_C_T_H_W.astype(jnp.float32) * c_in

        if condition.is_video and mask is not None:
            use_vc = jnp.asarray(condition.use_video_condition).astype(jnp.float32)
            gt_in = condition.gt_frames.astype(jnp.float32) / sd * use_vc
            net_in = gt_in * mask + net_in * (1.0 - mask)

        timesteps_B_T = (c_noise[:, 0, :, 0, 0] * cfg.c_noise_scale).astype(jnp.float32)
        net_out = self.base.net.apply(
            params,
            net_in.astype(cfg.model.net.dtype),
            timesteps_B_T,
            condition.crossattn_emb,
            fps=condition.fps,
            padding_mask=condition.padding_mask,
        ).astype(jnp.float32)

        x0 = c_skip * xt_B_C_T_H_W.astype(jnp.float32) + c_out * net_out
        if condition.is_video and mask is not None and cfg.model.denoise_replace_gt_frames:
            gt = condition.gt_frames.astype(jnp.float32)
            x0 = gt * mask + x0 * (1.0 - mask)
        if return_F:
            F = (jnp.cos(time_B_1_T_1_1) * xt_B_C_T_H_W.astype(jnp.float32) - x0) / (
                jnp.sin(time_B_1_T_1_1) * sd
            )
            return x0, F
        return x0

    # --------------------------- few-step sampling ---------------------------

    def backward_simulation(
        self,
        student_params,
        condition: Video2WorldCondition,
        init_noise: jax.Array,
        n_steps: int,
        grad_on_last_step: bool = False,
    ) -> jax.Array:
        """Few-step TrigFlow sampler (distill dmd2 :133-159): x = x0_pred;
        re-noise to the next time with the SAME init noise."""
        cfg = self.config
        t_steps = list(cfg.selected_sampling_time[:n_steps]) + [0.0]
        x = init_noise.astype(jnp.float32)
        B = x.shape[0]
        for count, (t_cur, t_next) in enumerate(zip(t_steps[:-1], t_steps[1:])):
            is_last = count == n_steps - 1
            times = jnp.full((B,), t_cur, dtype=jnp.float32)
            x0 = self.denoise_edm(student_params, x, times, condition)
            if grad_on_last_step and not is_last:
                x0 = jax.lax.stop_gradient(x0)
            elif not grad_on_last_step:
                x0 = jax.lax.stop_gradient(x0)
            x = x0
            if t_next > 1e-5:
                x = math.cos(t_next) * x / cfg.sigma_data + math.sin(t_next) * init_noise
        return x

    def generate(
        self,
        student_params,
        noise: jax.Array,
        condition: Video2WorldCondition,
        num_steps: int = 4,
        num_conditional_frames: int = 1,
    ) -> jax.Array:
        """Distilled few-step inference (no CFG: guidance is distilled)."""
        if condition.is_video and condition.gt_frames is not None:
            condition = condition.edit_for_inference(True, num_conditional_frames)
        x = self.backward_simulation(student_params, condition, noise, num_steps)
        return jnp.nan_to_num(x)

    # ------------------------------ training ------------------------------

    def draw_training_time_D(self, rng: jax.Array, batch_size: int) -> jax.Array:
        """Critic noise-time sampling (distillation_base_mixin.py:1001-1015):
        sigma ~ U[0,1] through the shift map; t = arctan(sigma/(1-sigma))."""
        cfg = self.config
        sigma = jax.random.uniform(rng, (batch_size,), dtype=jnp.float32)
        shift = cfg.timestep_shift
        sigma = shift * sigma / (1.0 + (shift - 1.0) * sigma)
        return jnp.arctan(sigma / (1.0 - sigma)).astype(jnp.float32)[:, None]

    def is_student_phase(self, iteration: int) -> bool:
        return (iteration + 1) % self.config.student_update_freq == 0

    def training_step_generator(
        self,
        student_params,
        teacher_params,
        fake_score_params,
        rng: jax.Array,
        x0_B_C_T_H_W: jax.Array,
        condition: Video2WorldCondition,
        uncondition: Optional[Video2WorldCondition],
        n_steps: int,
    ):
        cfg = self.config
        B = x0_B_C_T_H_W.shape[0]
        rng_t, rng_g, rng_d = jax.random.split(rng, 3)
        D_time_B_T = self.draw_training_time_D(rng_t, B)
        G_eps = jax.random.normal(rng_g, x0_B_C_T_H_W.shape, dtype=jnp.float32)
        D_eps = jax.random.normal(rng_d, x0_B_C_T_H_W.shape, dtype=jnp.float32)

        G_x0 = self.backward_simulation(student_params, condition, G_eps, n_steps, grad_on_last_step=True)

        D_time = D_time_B_T[:, None, :, None, None]
        D_xt = G_x0 * jnp.cos(D_time) / cfg.sigma_data + D_eps * jnp.sin(D_time)

        fake_x0 = jax.lax.stop_gradient(
            self.denoise_edm(fake_score_params, D_xt, D_time_B_T, condition)
        )
        teacher_x0 = self.denoise_edm(teacher_params, D_xt, D_time_B_T, condition)
        if cfg.teacher_guidance > 0.0 and uncondition is not None:
            teacher_x0_uncond = self.denoise_edm(teacher_params, D_xt, D_time_B_T, uncondition)
            teacher_x0 = teacher_x0 + cfg.teacher_guidance * (teacher_x0 - teacher_x0_uncond)
        teacher_x0 = jax.lax.stop_gradient(teacher_x0)

        weight = jnp.clip(
            jnp.mean(jnp.abs(G_x0 - teacher_x0), axis=(1, 2, 3, 4), keepdims=True), min=1e-5
        )
        grad = jax.lax.stop_gradient((fake_x0 - teacher_x0) / weight)
        loss_dmd = jnp.square(G_x0 - jax.lax.stop_gradient(G_x0 - grad))
        loss_dmd = jnp.nan_to_num(loss_dmd)
        loss = cfg.loss_scale_sid * jnp.mean(loss_dmd, axis=(1, 2, 3, 4))
        return jnp.mean(loss), {"dmd_loss_generator": jnp.mean(loss), "grad_norm_dmd": jnp.mean(jnp.abs(grad))}

    def training_step_critic(
        self,
        student_params,
        fake_score_params,
        rng: jax.Array,
        x0_B_C_T_H_W: jax.Array,
        condition: Video2WorldCondition,
        n_steps: int,
    ):
        cfg = self.config
        B = x0_B_C_T_H_W.shape[0]
        rng_t, rng_g, rng_d = jax.random.split(rng, 3)
        D_time_B_T = self.draw_training_time_D(rng_t, B)
        G_eps = jax.random.normal(rng_g, x0_B_C_T_H_W.shape, dtype=jnp.float32)
        D_eps = jax.random.normal(rng_d, x0_B_C_T_H_W.shape, dtype=jnp.float32)

        G_x0 = jax.lax.stop_gradient(self.backward_simulation(student_params, condition, G_eps, n_steps))
        D_time = D_time_B_T[:, None, :, None, None]
        D_xt = G_x0 * jnp.cos(D_time) / cfg.sigma_data + D_eps * jnp.sin(D_time)

        fake_x0 = self.denoise_edm(fake_score_params, D_xt, D_time_B_T, condition)
        loss = cfg.loss_scale_fake_score * jnp.mean(
            jnp.square(G_x0 - fake_x0) / jnp.square(jnp.sin(D_time)), axis=(1, 2, 3, 4)
        )
        return jnp.mean(loss), {"dmd_loss_critic": jnp.mean(loss)}
