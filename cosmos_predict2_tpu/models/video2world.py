"""Rectified-flow Video2World / Text2World / Image2World model.

Capability parity with the reference model classes
(cosmos_predict2/_src/predict2/models/text2world_model_rectified_flow.py:114-1009
and video2world_model_rectified_flow.py:62-346), redesigned as pure
functions over parameter pytrees:

* ``training_step``: encode -> sample t (uniform/logitnormal, discretized
  on the shift-5 schedule) -> interpolate x_t = eps*t + x0*(1-t) -> predict
  velocity -> masked MSE with FRAME_REPLACE conditioning.
* ``generate``: CFG velocity function + the scan-based UniPC sampler; the
  whole 35-step x (2 net calls) loop is one jit.
* FRAME_REPLACE conditioning (video2world_model_rectified_flow.py:77-138):
  the first k latent frames of x_t are replaced by clean latents, and the
  predicted velocity on those frames is replaced by the ground-truth
  velocity (noise - x0) so their loss is zero / sampling leaves them fixed.

Text2World is the same model with zero conditional frames; Image2World is a
video batch whose gt_frames come from a single repeated image frame.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from cosmos_predict2_tpu.conditioning.conditioner import (
    Video2WorldCondition,
    get_condition_uncondition,
    get_condition_with_negative_prompt,
)
from cosmos_predict2_tpu.networks.dit import DiTConfig, MiniTrainDIT
from cosmos_predict2_tpu.schedulers import unipc
from cosmos_predict2_tpu.schedulers.rectified_flow import RectifiedFlow, RectifiedFlowConfig


@dataclasses.dataclass(frozen=True)
class RFModelConfig:
    net: DiTConfig = DiTConfig()
    rectified_flow: RectifiedFlowConfig = RectifiedFlowConfig(shift=5.0, train_time_distribution="logitnormal")
    state_ch: int = 16
    state_t: int = 24
    resolution: str = "720"
    sigma_data: float = 1.0
    loss_scale: float = 10.0
    # conditioning
    min_num_conditional_frames: int = 0
    max_num_conditional_frames: int = 2
    conditional_frames_probs: Optional[tuple[tuple[int, float], ...]] = ((0, 0.5), (1, 0.25), (2, 0.25))
    denoise_replace_gt_frames: bool = True
    conditional_frame_timestep: float = -1.0
    # training-time conditioning dropout (reference conditioner defaults:
    # text 0.2, use_video_condition BooleanFlag 0.2)
    text_dropout_rate: float = 0.2
    video_cond_dropout_rate: float = 0.2
    # CFG composition: "v2w" => cond + g*(cond-uncond); "t2w" => uncond + g*(cond-uncond)
    cfg_mode: str = "v2w"
    # sampling defaults
    sampling_num_steps: int = 35
    sampling_shift: float = 5.0
    use_karras_sigma_at_inference: bool = False
    # high-sigma strategy: bias a fraction of training samples toward the
    # near-pure-noise timesteps (reference
    # text2world_model_rectified_flow.py:103-106,375-390)
    use_high_sigma_strategy: bool = False
    high_sigma_ratio: float = 0.05
    high_sigma_timesteps_min: int = 980
    high_sigma_timesteps_max: int = 1000
    # LoRA post-training (reference peft injection add_lora,
    # text2world_model_rectified_flow.py:923; recipe defaults from
    # cosmos_predict2/experiments/base/cosmos_nemo_assets_lora.py:118-123)
    use_lora: bool = False
    lora_rank: int = 32
    lora_alpha: float = 32.0
    lora_targets: tuple[str, ...] = (
        "q_proj", "k_proj", "v_proj", "output_proj", "mlp/layer1", "mlp/layer2",
    )


class Video2WorldModel:
    """Stateless model: all methods are pure in (params, inputs)."""

    def __init__(self, config: RFModelConfig):
        self.config = config
        self.net = MiniTrainDIT(config.net)
        self.rectified_flow = RectifiedFlow(config.rectified_flow)

    # ------------------------------ init ------------------------------

    def init_params(self, rng: jax.Array, latent_shape: tuple[int, int, int, int, int], text_len: int = 512):
        B, C, T, H, W = latent_shape
        x = jnp.zeros(latent_shape, dtype=jnp.float32)
        ts = jnp.zeros((B,), dtype=jnp.float32)
        ctx_dim = (
            self.config.net.crossattn_proj_in_channels
            if self.config.net.use_crossattn_projection
            else self.config.net.crossattn_emb_channels
        )
        ctx = jnp.zeros((B, text_len, ctx_dim), dtype=jnp.float32)
        kwargs = {}
        if self.config.net.action_dim is not None:
            kwargs["action"] = jnp.zeros(
                (B, self.config.net.num_action_per_chunk, self.config.net.action_dim), dtype=jnp.float32
            )
        return self.net.init(rng, x, ts, ctx, **kwargs)

    # ----------------------------- denoise -----------------------------

    def denoise(
        self,
        params,
        noise: Optional[jax.Array],
        xt_B_C_T_H_W: jax.Array,
        timesteps_B_T: jax.Array,
        condition: Video2WorldCondition,
    ) -> jax.Array:
        """Velocity prediction with FRAME_REPLACE conditioning."""
        cfg = self.config
        mask = None
        if condition.is_video and condition.condition_video_mask is not None:
            mask = condition.condition_video_mask.astype(xt_B_C_T_H_W.dtype)  # (B,1,T,1,1)
            use_vc = jnp.asarray(condition.use_video_condition).astype(xt_B_C_T_H_W.dtype)
            if use_vc.ndim == 1:  # per-sample flag (batched CFG)
                use_vc = use_vc.reshape(-1, 1, 1, 1, 1)
            gt_in = condition.gt_frames.astype(xt_B_C_T_H_W.dtype) * use_vc
            xt_B_C_T_H_W = gt_in * mask + xt_B_C_T_H_W * (1.0 - mask)
            if cfg.conditional_frame_timestep >= 0:
                # pin conditional-frame timesteps (per-frame timesteps path)
                if timesteps_B_T.ndim == 1:
                    timesteps_B_T = timesteps_B_T[:, None]
                t_mask = mask[:, 0, :, 0, 0]  # (B, T)
                timesteps_B_T = jnp.broadcast_to(timesteps_B_T, t_mask.shape)
                timesteps_B_T = cfg.conditional_frame_timestep * t_mask + timesteps_B_T * (1.0 - t_mask)

        net_kwargs = {}
        if cfg.net.concat_condition_mask:
            B, _, T, H, W = xt_B_C_T_H_W.shape
            full_mask = (
                jnp.broadcast_to(mask, (B, 1, T, H, W))
                if (condition.is_video and mask is not None)
                else jnp.zeros((B, 1, T, H, W), dtype=xt_B_C_T_H_W.dtype)
            )
            net_kwargs["condition_mask"] = full_mask
        if cfg.net.action_dim is not None:
            net_kwargs["action"] = condition.action
        if cfg.net.camera_dim is not None:
            net_kwargs["camera"] = condition.camera

        v_pred = self.net.apply(
            params,
            xt_B_C_T_H_W,
            timesteps_B_T,
            condition.crossattn_emb,
            fps=condition.fps,
            padding_mask=condition.padding_mask,
            **net_kwargs,
        ).astype(jnp.float32)

        if condition.is_video and mask is not None and cfg.denoise_replace_gt_frames:
            gt = condition.gt_frames.astype(jnp.float32)
            gt_velocity = noise.astype(jnp.float32) - gt
            maskf = mask.astype(jnp.float32)
            v_pred = gt_velocity * maskf + v_pred * (1.0 - maskf)
        return v_pred

    # --------------------------- training step ---------------------------

    def sample_num_conditional_frames(self, rng: jax.Array, batch_size: int) -> jax.Array:
        """Per-sample k from conditional_frames_probs or uniform [min, max]."""
        cfg = self.config
        if cfg.conditional_frames_probs is not None:
            options = jnp.asarray([k for k, _ in cfg.conditional_frames_probs])
            probs = jnp.asarray([p for _, p in cfg.conditional_frames_probs])
            idx = jax.random.categorical(rng, jnp.log(probs), shape=(batch_size,))
            return options[idx]
        return jax.random.randint(
            rng, (batch_size,), cfg.min_num_conditional_frames, cfg.max_num_conditional_frames + 1
        )

    def training_step(
        self,
        params,
        rng: jax.Array,
        x0_B_C_T_H_W: jax.Array,
        condition: Video2WorldCondition,
    ) -> tuple[jax.Array, dict]:
        """Loss for one batch of clean latents + condition.

        VAE encoding and conditioning-dropout happen in the caller (the
        train loop), keeping this jit-compiled function pure.
        """
        cfg = self.config
        B = x0_B_C_T_H_W.shape[0]
        rng_eps, rng_t, rng_k, rng_hs = jax.random.split(rng, 4)

        if condition.is_video and condition.gt_frames is not None:
            k = self.sample_num_conditional_frames(rng_k, B)
            condition = condition.set_video_condition(condition.gt_frames, k)

        eps = jax.random.normal(rng_eps, x0_B_C_T_H_W.shape, dtype=jnp.float32)
        u = self.rectified_flow.sample_train_time(rng_t, B)
        timesteps, sigmas = self.rectified_flow.discretize(u)
        if cfg.use_high_sigma_strategy:
            timesteps, sigmas = self.rectified_flow.apply_high_sigma(
                rng_hs, timesteps, sigmas, cfg.high_sigma_ratio,
                cfg.high_sigma_timesteps_min, cfg.high_sigma_timesteps_max,
            )

        xt, v_target = self.rectified_flow.get_interpolation(eps, x0_B_C_T_H_W.astype(jnp.float32), sigmas)
        v_pred = self.denoise(params, eps, xt, timesteps[:, None], condition)

        weights = self.rectified_flow.time_weight(timesteps)
        per_instance = jnp.mean(jnp.square(v_pred - v_target), axis=tuple(range(1, v_pred.ndim)))
        loss = jnp.mean(weights * per_instance) * cfg.loss_scale
        return loss, {"loss": loss, "sigma_mean": jnp.mean(sigmas), "per_instance_loss": per_instance}

    # ----------------------------- sampling -----------------------------

    def velocity_fn_from_condition(
        self,
        params,
        condition: Video2WorldCondition,
        uncondition: Video2WorldCondition,
        guidance: float,
        noise: jax.Array,
    ) -> Callable[[jax.Array, jax.Array], jax.Array]:
        """CFG velocity function with BATCHED cond/uncond: both branches run
        in one forward at batch 2B (the reference calls the net twice,
        text2world_model_rectified_flow.py:508-515 — batching halves weight
        traffic and doubles kernel grid parallelism on TPU)."""
        cfg = self.config

        def _stack(a, b):
            if a is None or b is None:
                return a if a is not None else b
            return jnp.concatenate([jnp.asarray(a), jnp.asarray(b)], axis=0)

        use_c = jnp.broadcast_to(jnp.asarray(condition.use_video_condition), (noise.shape[0],))
        use_u = jnp.broadcast_to(jnp.asarray(uncondition.use_video_condition), (noise.shape[0],))
        batched = condition.replace(
            crossattn_emb=_stack(condition.crossattn_emb, uncondition.crossattn_emb),
            fps=_stack(condition.fps, uncondition.fps),
            padding_mask=_stack(condition.padding_mask, uncondition.padding_mask),
            gt_frames=_stack(condition.gt_frames, uncondition.gt_frames),
            condition_video_mask=_stack(condition.condition_video_mask, uncondition.condition_video_mask),
            use_video_condition=jnp.concatenate([use_c, use_u]),
            action=_stack(condition.action, uncondition.action),
            camera=_stack(condition.camera, uncondition.camera),
        )

        def velocity_pure(captures, x: jax.Array, t: jax.Array) -> jax.Array:
            # params/condition/noise enter as explicit arguments so a jit of
            # this function does NOT bake the 2B params into the lowered
            # program as ~4 GB of constants (unipc.sample_host_loop captures)
            params_, batched_, noise_ = captures
            B = x.shape[0]
            ts = jnp.broadcast_to(t, (2 * B,)).astype(jnp.float32)
            x2 = jnp.concatenate([x, x], axis=0)
            noise2 = jnp.concatenate([noise_, noise_], axis=0)
            v = self.denoise(params_, noise2, x2, ts[:, None], batched_)
            cond_v, uncond_v = v[:B], v[B:]
            if cfg.cfg_mode == "v2w":
                return cond_v + guidance * (cond_v - uncond_v)
            return uncond_v + guidance * (cond_v - uncond_v)

        captures = (params, batched, noise)

        def velocity_fn(x: jax.Array, t: jax.Array) -> jax.Array:
            return velocity_pure(captures, x, t)

        velocity_fn.pure = velocity_pure
        velocity_fn.captures = captures
        return velocity_fn

    def generate(
        self,
        params,
        noise: jax.Array,
        condition: Video2WorldCondition,
        guidance: float = 7.0,
        num_steps: Optional[int] = None,
        shift: Optional[float] = None,
        num_conditional_frames: int = 1,
        negative_text_embeddings: Optional[jax.Array] = None,
        host_loop: bool = False,
    ) -> jax.Array:
        """Full UniPC sampling from noise. All shapes static; jit-able.

        ``host_loop=True`` steps the UniPC loop from the host (one jitted
        CFG forward per step) instead of one scan program — required at
        full-scale geometries where a single 35-step program runs for many
        minutes. Do not wrap the host_loop variant in an outer jit.
        """
        cfg = self.config
        num_steps = num_steps or cfg.sampling_num_steps
        shift = shift if shift is not None else cfg.sampling_shift
        coeffs = unipc.set_timesteps(num_steps, shift=shift, use_karras_sigma=cfg.use_karras_sigma_at_inference)

        if negative_text_embeddings is not None:
            condition, uncondition = get_condition_with_negative_prompt(condition, negative_text_embeddings)
        else:
            condition, uncondition = get_condition_uncondition(condition)
        if condition.is_video and condition.gt_frames is not None:
            condition = condition.edit_for_inference(True, num_conditional_frames)
            uncondition = uncondition.edit_for_inference(False, num_conditional_frames)

        velocity_fn = self.velocity_fn_from_condition(params, condition, uncondition, guidance, noise)
        if host_loop:
            return unipc.sample_host_loop(
                velocity_fn.pure, noise.astype(jnp.float32), coeffs, captures=velocity_fn.captures
            )
        return unipc.sample(velocity_fn, noise.astype(jnp.float32), coeffs)

    def state_shape(self, n_sample: int, height: int, width: int, spatial_compression: int = 8) -> tuple:
        cfg = self.config
        return (n_sample, cfg.state_ch, cfg.state_t, height // spatial_compression // 1, width // spatial_compression)
