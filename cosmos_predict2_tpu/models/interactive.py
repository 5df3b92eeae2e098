"""Interactive (causal, real-time) world model with KV-cache streaming.

Capability parity with the reference interactive stack
(cosmos_predict2/_src/predict2/interactive/): ``CausalDIT`` — the video DiT
with temporal block-causal self-attention (networks/dit_causal.py:569,
blockmask.py:54-118) — and the streaming KV-cache inference loop
(``CausalDITKVCache.make_it_kv_cache`` :1193-1260 and
``ActionStreamingInference`` with its ``cache_frame_size`` rolling window,
inference/action_video2world_streaming.py:90-297), plus the self-forcing
DMD2 rollout structure (models/action_video2world_self_forcing.py:43-450).

TPU design: the cache is an explicit pytree of head-major (B, H, S_max, D)
ring buffers + a filled-length scalar, updated with dynamic_update_slice inside
one jitted decode step; denoise steps read the cache without persisting
(noisy kv is never committed), and a final "commit" forward appends the
clean block's kv — the prefill/denoise split of the reference's rollout.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from cosmos_predict2_tpu.conditioning.conditioner import Video2WorldCondition
from cosmos_predict2_tpu.models.distillation import DistillationConfig, DistillationModel
from cosmos_predict2_tpu.models.video2world import RFModelConfig, Video2WorldModel
from cosmos_predict2_tpu.networks.dit import DiTConfig


def causal_model_config(base_net: DiTConfig, num_frame_per_block: int = 1, **model_kwargs) -> RFModelConfig:
    net = dataclasses.replace(base_net, temporal_causal=True, num_frame_per_block=num_frame_per_block)
    return RFModelConfig(net=net, **model_kwargs)


class CausalVideo2WorldModel(Video2WorldModel):
    """Video2World with temporal block-causal attention (trainable as usual)."""

    def init_kv_caches(self, batch: int, max_latent_frames: int, latent_h: int, latent_w: int, dtype=jnp.bfloat16):
        cfg = self.config.net
        hp, wp = latent_h // cfg.patch_spatial, latent_w // cfg.patch_spatial
        s_max = max_latent_frames * hp * wp
        def one():
            # HEAD-MAJOR ring buffers (B, H, S_max, D): the flash decode
            # kernels read them with no relayout (ops/flash_attention.py)
            return {
                "k": jnp.zeros((batch, cfg.num_heads, s_max, cfg.head_dim), dtype=dtype),
                "v": jnp.zeros((batch, cfg.num_heads, s_max, cfg.head_dim), dtype=dtype),
                "len": jnp.zeros((), dtype=jnp.int32),
            }

        return [one() for _ in range(cfg.num_blocks)]

    def forward_with_cache(
        self,
        params,
        x_new_B_C_T_H_W: jax.Array,
        timesteps_B_T: jax.Array,
        condition: Video2WorldCondition,
        kv_caches: list,
        t_start: jax.Array | int,
    ):
        """One forward of the new frame block against cached context.

        Returns (velocity/net output, new_caches). Callers decide whether to
        keep new_caches (commit/prefill) or drop them (denoise step).
        Action conditioning (the reference's ActionStreamingInference)
        rides through condition.action when the net has action embedders.
        """
        kwargs = {}
        if self.config.net.action_dim is not None:
            kwargs["action"] = condition.action
        if self.config.net.concat_condition_mask:
            B, _, T, H, W = x_new_B_C_T_H_W.shape
            kwargs["condition_mask"] = jnp.zeros((B, 1, T, H, W), dtype=x_new_B_C_T_H_W.dtype)
        return self.net.apply(
            params,
            x_new_B_C_T_H_W,
            timesteps_B_T,
            condition.crossattn_emb,
            fps=condition.fps,
            padding_mask=condition.padding_mask,
            kv_caches=kv_caches,
            t_start=t_start,
            **kwargs,
        )


def shift_cache_window(cache: dict, drop_tokens: int) -> dict:
    """Roll the ring buffer left by ``drop_tokens`` (rolling cache window,
    reference cache_frame_size semantics)."""
    return {
        "k": jnp.roll(cache["k"], -drop_tokens, axis=2),
        "v": jnp.roll(cache["v"], -drop_tokens, axis=2),
        "len": cache["len"] - drop_tokens,
    }


@dataclasses.dataclass
class StreamingConfig:
    distill: DistillationConfig = DistillationConfig()
    num_frame_per_block: int = 1
    cache_frame_size: int = 16  # rolling window, in latent frames
    num_steps: int = 4


class StreamingInference:
    """Frame-block streaming generation with the few-step distilled student.

    Parity: ActionStreamingInference (interactive/inference/
    action_video2world_streaming.py:90-297): prefill conditioning frames,
    then per block — few-step denoise against the cache, commit the clean
    block's kv, slide the window.
    """

    def __init__(self, config: StreamingConfig, model: CausalVideo2WorldModel):
        self.config = config
        self.model = model
        self.dm = DistillationModel(dataclasses.replace(config.distill, model=model.config))
        self.dm.base = model
        self._jit_blocks: dict = {}
        self._jit_shifts: dict = {}

    def _jitted_block(self, block_shape: tuple):
        """Compiled generate_block with DONATED caches for the inference loop.

        Without donation two full KV-cache copies are live across the step
        boundary — 13.7 GB at 720p cache-16, which alone exceeds a 16 GB
        chip. (The training rollout must NOT donate: it reuses the caches
        under grad.)"""
        fn = self._jit_blocks.get(block_shape)
        if fn is None:
            fn = jax.jit(
                lambda params, rng, cond, caches, t_pos: self.generate_block(
                    params, rng, cond, caches, block_shape, t_pos
                ),
                donate_argnums=(3,),
            )
            self._jit_blocks[block_shape] = fn
        return fn

    def _jitted_shift(self, drop_tokens: int):
        """Compiled window slide with DONATED caches: an eager
        [shift_cache_window(c) for c in caches] keeps the whole old cache
        list alive while building the new one — two full copies, the same
        13.7 GB condition donation in _jitted_block exists to avoid."""
        fn = self._jit_shifts.get(drop_tokens)
        if fn is None:
            fn = jax.jit(
                lambda caches: [shift_cache_window(c, drop_tokens) for c in caches],
                donate_argnums=(0,),
            )
            self._jit_shifts[drop_tokens] = fn
        return fn

    def prefill(self, params, latents_B_C_T_H_W, condition, kv_caches, t_start=0):
        """Append clean frames' kv to the cache (timestep ~0 = clean)."""
        B, _, T, _, _ = latents_B_C_T_H_W.shape
        ts = jnp.zeros((B, T), dtype=jnp.float32)
        _, new_caches = self.model.forward_with_cache(
            params, latents_B_C_T_H_W.astype(self.model.config.net.dtype), ts, condition, kv_caches, t_start
        )
        return new_caches

    def generate_block(
        self,
        params,
        rng: jax.Array,
        condition: Video2WorldCondition,
        kv_caches: list,
        block_shape: tuple,  # (B, C, num_frame_per_block, h, w)
        t_start: jax.Array | int,
    ):
        """Few-step TrigFlow denoise of one new frame block, then commit."""
        import math

        cfg = self.config
        noise = jax.random.normal(rng, block_shape, dtype=jnp.float32)
        x = noise
        t_steps = list(self.dm.config.selected_sampling_time[: cfg.num_steps]) + [0.0]
        B = block_shape[0]
        sd = self.dm.config.sigma_data
        for t_cur, t_next in zip(t_steps[:-1], t_steps[1:]):
            times = jnp.full((B, block_shape[2]), t_cur, dtype=jnp.float32)
            from cosmos_predict2_tpu.models.distillation import trigflow_scalings_rf

            c_skip, c_out, c_in, c_noise = trigflow_scalings_rf(times[:, None, :, None, None], sd)
            net_in = (x * c_in).astype(self.model.config.net.dtype)
            net_out, _ = self.model.forward_with_cache(
                params, net_in, c_noise[:, 0, :, 0, 0] * 1000.0, condition, kv_caches, t_start
            )
            x0 = c_skip * x + c_out * net_out.astype(jnp.float32)
            x = x0
            if t_next > 1e-5:
                x = math.cos(t_next) * x / sd + math.sin(t_next) * noise
        # commit the clean block
        new_caches = self.prefill(params, x, condition, kv_caches, t_start)
        return x, new_caches

    def generate(
        self,
        params,
        rng: jax.Array,
        condition: Video2WorldCondition,
        init_latents: Optional[jax.Array],
        num_latent_frames: int,
        latent_shape_hw: tuple[int, int],
        state_ch: int = 16,
    ) -> jax.Array:
        """Stream num_latent_frames latent frames; returns (B, C, T, h, w)."""
        cfg = self.config
        B = condition.crossattn_emb.shape[0]
        h, w = latent_shape_hw
        hp = h // self.model.config.net.patch_spatial
        wp = w // self.model.config.net.patch_spatial
        tokens_per_frame = hp * wp

        caches = self.model.init_kv_caches(B, cfg.cache_frame_size + cfg.num_frame_per_block, h, w)
        blocks = []
        t_pos = 0
        if init_latents is not None:
            caches = self.prefill(params, init_latents, condition, caches, t_start=0)
            t_pos = init_latents.shape[2]
            blocks.append(init_latents.astype(jnp.float32))

        generated = t_pos
        step = 0
        while generated < num_latent_frames:
            nb = cfg.num_frame_per_block
            block_shape = (B, state_ch, nb, h, w)
            x, caches = self._jitted_block(block_shape)(
                params, jax.random.fold_in(rng, step), condition, caches, t_pos
            )
            blocks.append(x)
            generated += nb
            t_pos += nb
            step += 1
            # slide the window when the cache is full
            max_tokens = cfg.cache_frame_size * tokens_per_frame
            if (step * nb + (init_latents.shape[2] if init_latents is not None else 0)) * tokens_per_frame > max_tokens:
                caches = self._jitted_shift(nb * tokens_per_frame)(caches)
        return jnp.concatenate(blocks, axis=2)[:, :, :num_latent_frames]


# -------------------------- self-forcing training --------------------------


class SelfForcingDMD2:
    """Self-forcing DMD2 training for the causal student (reference
    interactive/models/action_video2world_self_forcing.py:229-450
    ActionVideo2WorldModelTrigflowSelfForcingDMD2): the student generates the
    clip AUTOREGRESSIVELY with its KV cache (instead of the bidirectional
    backward simulation), then the standard DMD2 losses apply — generator =
    distribution-matching gradient trick against frozen teacher + fake-score
    critic, critic = denoising loss on the rolled-out video. Gradients flow through
    each block's few-step denoise (disable with grad_on_last_step=False for
    the critic's detached rollout); caches are committed under
    stop_gradient — the reference's rollout detach.
    """

    def __init__(self, streaming: StreamingInference):
        self.streaming = streaming
        self.dm = streaming.dm

    def rollout(
        self,
        params,
        rng: jax.Array,
        condition: Video2WorldCondition,
        n_blocks: int,
        latent_hw: tuple[int, int],
        state_ch: int = 16,
        grad_on_last_step: bool = True,
    ) -> jax.Array:
        """Autoregressive student generation; each block's few-step denoise
        is differentiable, KV caches are detached between blocks.
        Returns (B, C, n_blocks*nb, h, w)."""
        s = self.streaming
        cfg = s.config
        B = condition.crossattn_emb.shape[0]
        h, w = latent_hw
        nb = cfg.num_frame_per_block
        caches = s.model.init_kv_caches(B, n_blocks * nb, h, w)
        blocks = []
        t_pos = 0
        for step in range(n_blocks):
            x, caches = s.generate_block(
                params, jax.random.fold_in(rng, step), condition,
                jax.tree.map(jax.lax.stop_gradient, caches),
                (B, state_ch, nb, h, w), t_pos,
            )
            if not grad_on_last_step:
                x = jax.lax.stop_gradient(x)
            blocks.append(x)
            t_pos += nb
        return jnp.concatenate(blocks, axis=2)

    def generator_loss(
        self, student_params, teacher_params, fake_score_params, rng, condition,
        uncondition, n_blocks: int, latent_hw: tuple[int, int], state_ch: int = 16,
    ):
        """DMD generator loss over the self-forced rollout (reference :252)."""
        cfg = self.dm.config
        rng_roll, rng_t, rng_d = jax.random.split(rng, 3)
        G_x0 = self.rollout(student_params, rng_roll, condition, n_blocks, latent_hw, state_ch)
        B = G_x0.shape[0]
        D_time_B_T = self.dm.draw_training_time_D(rng_t, B)
        # broadcast per-frame times over the rollout length
        D_time_B_T = jnp.broadcast_to(D_time_B_T[:, :1], (B, G_x0.shape[2]))
        D_eps = jax.random.normal(rng_d, G_x0.shape, dtype=jnp.float32)
        D_time = D_time_B_T[:, None, :, None, None]
        D_xt = G_x0 * jnp.cos(D_time) / cfg.sigma_data + D_eps * jnp.sin(D_time)

        fake_x0 = jax.lax.stop_gradient(self.dm.denoise_edm(fake_score_params, D_xt, D_time_B_T, condition))
        teacher_x0 = self.dm.denoise_edm(teacher_params, D_xt, D_time_B_T, condition)
        if cfg.teacher_guidance > 0.0 and uncondition is not None:
            t_un = self.dm.denoise_edm(teacher_params, D_xt, D_time_B_T, uncondition)
            teacher_x0 = teacher_x0 + cfg.teacher_guidance * (teacher_x0 - t_un)
        teacher_x0 = jax.lax.stop_gradient(teacher_x0)

        weight = jnp.clip(jnp.mean(jnp.abs(G_x0 - teacher_x0), axis=(1, 2, 3, 4), keepdims=True), min=1e-5)
        grad = jax.lax.stop_gradient((fake_x0 - teacher_x0) / weight)
        loss = cfg.loss_scale_sid * jnp.mean(jnp.nan_to_num(jnp.square(G_x0 - jax.lax.stop_gradient(G_x0 - grad))))
        return loss, {"self_forcing_dmd_loss": loss}

    def critic_loss(
        self, student_params, fake_score_params, rng, condition,
        n_blocks: int, latent_hw: tuple[int, int], state_ch: int = 16,
    ):
        """Fake-score denoising loss on the (detached) rollout (reference :276)."""
        cfg = self.dm.config
        rng_roll, rng_t, rng_d = jax.random.split(rng, 3)
        G_x0 = jax.lax.stop_gradient(
            self.rollout(student_params, rng_roll, condition, n_blocks, latent_hw, state_ch, grad_on_last_step=False)
        )
        B = G_x0.shape[0]
        D_time_B_T = jnp.broadcast_to(self.dm.draw_training_time_D(rng_t, B)[:, :1], (B, G_x0.shape[2]))
        D_eps = jax.random.normal(rng_d, G_x0.shape, dtype=jnp.float32)
        D_time = D_time_B_T[:, None, :, None, None]
        D_xt = G_x0 * jnp.cos(D_time) / cfg.sigma_data + D_eps * jnp.sin(D_time)
        fake_x0 = self.dm.denoise_edm(fake_score_params, D_xt, D_time_B_T, condition)
        loss = cfg.loss_scale_fake_score * jnp.mean(
            jnp.square(G_x0 - fake_x0) / jnp.square(jnp.sin(D_time))
        )
        return loss, {"self_forcing_critic_loss": loss}
