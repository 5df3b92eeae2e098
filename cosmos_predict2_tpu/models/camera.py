"""Camera-conditioned Video2World (novel-view / trajectory-controlled).

Capability parity with the reference camera variant
(cosmos_predict2/_src/predict2/camera/models/
camera_conditioned_video2world_model_rectified_flow.py:45-284 and
configs/camera_conditioned/conditioner.py:42-68): the latent T axis packs
[output chunk 0 | input (conditioning) chunk | output chunk 1] — the real
video sits in the MIDDLE and the model inpaints the surrounding chunks for
the target camera trajectories. Camera embeddings (Plücker-ray per-token
maps) are chunk-reordered the same way and enter every DiT block through
the per-block ``cam_encoder`` (networks/dit.py, camera_dim).

Differences from plain Video2World conditioning:
 * the conditioning mask marks latent frames [k, 2k) — the middle chunk —
   instead of the first k frames (conditioner.py:62-65 there);
 * both CFG branches keep the video condition active (the reference sets
   the same gt/mask on condition and uncondition, :211-219);
 * CFG combine is cond + g*(cond - uncond) (velocity_fn :227-233).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from cosmos_predict2_tpu.conditioning.conditioner import (
    Video2WorldCondition,
    get_condition_uncondition,
    get_condition_with_negative_prompt,
)
from cosmos_predict2_tpu.models.video2world import Video2WorldModel
from cosmos_predict2_tpu.schedulers import unipc


def reorder_camera_chunks(camera: jax.Array, n_chunks: int = 3) -> jax.Array:
    """Chunk axis 1 and move the first (input) chunk to the middle —
    [cam_out0, cam_in, cam_out1] from dataset order [cam_in, cam_out0,
    cam_out1] (reference :81-83 ``camera_list[1], [0], [2]``)."""
    chunks = jnp.split(camera, n_chunks, axis=1)
    return jnp.concatenate([chunks[1], chunks[0], *chunks[2:]], axis=1)


class CameraVideo2WorldModel(Video2WorldModel):
    """Latents: (B, C, 3*Tc, H, W) with the conditioning clip in the middle."""

    def set_camera_condition(
        self, condition: Video2WorldCondition, gt_frames: jax.Array, num_conditional_frames: int
    ) -> Video2WorldCondition:
        """Mask latent frames [k, 2k) — the middle (input) chunk."""
        B, _, T, _, _ = gt_frames.shape
        k = num_conditional_frames
        if T == 1:
            mask = jnp.zeros((B, 1, T, 1, 1), dtype=gt_frames.dtype)
        else:
            idx = jnp.arange(T)
            mask = ((idx >= k) & (idx < 2 * k)).astype(gt_frames.dtype)
            mask = jnp.broadcast_to(mask[None, None, :, None, None], (B, 1, T, 1, 1))
        return condition.replace(
            gt_frames=gt_frames, condition_video_mask=mask, use_video_condition=jnp.asarray(True)
        )

    def generate(
        self,
        params,
        noise: jax.Array,
        condition: Video2WorldCondition,
        guidance: float = 1.5,
        num_steps: Optional[int] = None,
        shift: Optional[float] = None,
        num_conditional_frames: int = 1,
        negative_text_embeddings: Optional[jax.Array] = None,
    ) -> jax.Array:
        """UniPC sampling with the middle-chunk mask on BOTH CFG branches
        (reference get_velocity_fn_from_batch :204-219)."""
        cfg = self.config
        coeffs = unipc.set_timesteps(
            num_steps or cfg.sampling_num_steps,
            shift=shift if shift is not None else cfg.sampling_shift,
            use_karras_sigma=cfg.use_karras_sigma_at_inference,
        )
        if negative_text_embeddings is not None:
            cond, uncond = get_condition_with_negative_prompt(condition, negative_text_embeddings)
        else:
            cond, uncond = get_condition_uncondition(condition)
        cond = self.set_camera_condition(cond, condition.gt_frames, num_conditional_frames)
        uncond = self.set_camera_condition(uncond, condition.gt_frames, num_conditional_frames)

        velocity_fn = self.velocity_fn_from_condition(params, cond, uncond, guidance, noise)
        return unipc.sample(velocity_fn, noise.astype(jnp.float32), coeffs)

    def pack_inference_latents(self, cond_latents: jax.Array) -> jax.Array:
        """[zeros | encoded conditioning clip | zeros] (reference :206)."""
        z = jnp.zeros_like(cond_latents)
        return jnp.concatenate([z, cond_latents, z], axis=2)


class CameraFrameinitVideo2WorldModel(CameraVideo2WorldModel):
    """Frame-init camera variant (reference camera_conditioned_frameinit_
    video2world_model_rectified_flow.py:45 + conditioner.py:115-143): same
    [out0 | cond | out1] packing, but the mask anchors frame 0 plus the
    first k frames of the middle and last chunks."""

    def set_camera_condition(self, condition, gt_frames, num_conditional_frames: int):
        B, _, T, _, _ = gt_frames.shape
        k = num_conditional_frames
        if T == 1:
            mask = jnp.zeros((B, 1, T, 1, 1), dtype=gt_frames.dtype)
        else:
            idx = jnp.arange(T)
            c = T // 3
            m = (idx == 0) | ((idx >= c) & (idx < c + k)) | ((idx >= 2 * c) & (idx < 2 * c + k))
            mask = jnp.broadcast_to(m.astype(gt_frames.dtype)[None, None, :, None, None], (B, 1, T, 1, 1))
        return condition.replace(
            gt_frames=gt_frames, condition_video_mask=mask, use_video_condition=jnp.asarray(True)
        )


def reorder_camera_chunks_ar(camera: jax.Array) -> jax.Array:
    """AR dataset order [c0, c1, c2, c3, src] -> model order
    [c0, c1, src, c2, c3] (reference AR model :96-99)."""
    chunks = jnp.split(camera, 5, axis=1)
    return jnp.concatenate([chunks[0], chunks[1], chunks[4], chunks[2], chunks[3]], axis=1)


class CameraARVideo2WorldModel(CameraVideo2WorldModel):
    """Autoregressive camera variant (reference camera_conditioned_ar_
    video2world_model_rectified_flow.py:45 + conditioner.py:190-224):
    latents pack [cond0 | cond1 | out | cond2 | cond3]; the mask covers the
    first 2k and last 2k frames, optionally extending 6 frames into the
    output chunk for long-video-generation rollouts (``lvg``)."""

    def set_camera_condition(self, condition, gt_frames, num_conditional_frames: int, lvg: bool = False):
        B, _, T, _, _ = gt_frames.shape
        k = num_conditional_frames
        if T == 1:
            mask = jnp.zeros((B, 1, T, 1, 1), dtype=gt_frames.dtype)
        else:
            idx = jnp.arange(T)
            m = (idx < 2 * k) | (idx >= T - 2 * k)
            if lvg:
                m = m | ((idx >= 2 * k) & (idx < 2 * k + 6))
            mask = jnp.broadcast_to(m.astype(gt_frames.dtype)[None, None, :, None, None], (B, 1, T, 1, 1))
        return condition.replace(
            gt_frames=gt_frames, condition_video_mask=mask, use_video_condition=jnp.asarray(True)
        )

    def pack_inference_latents(self, cond_chunks: list[jax.Array], out_shape_latents: jax.Array) -> jax.Array:
        """[cond0 | cond1 | zeros-like-out | cond2 | cond3]."""
        z = jnp.zeros_like(out_shape_latents)
        c0, c1, c2, c3 = cond_chunks
        return jnp.concatenate([c0, c1, z, c2, c3], axis=2)
