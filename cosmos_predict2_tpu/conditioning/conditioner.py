"""Conditioning: condition pytrees + CFG cond/uncond construction.

Capability parity with the reference conditioner stack
(cosmos_predict2/_src/predict2/conditioner.py:395-573 and
configs/video2world/defaults/conditioner.py:39-200), redesigned as
immutable pytrees instead of nn.Module embedders:

* ``Text2WorldCondition``: crossattn_emb + fps + padding_mask (+ data_type).
* ``Video2WorldCondition`` adds frame conditioning: ``gt_frames`` (clean
  latents) and a (B, 1, T, 1, 1)-broadcastable ``condition_video_mask``
  marking the first k latent frames, plus ``use_video_condition``.
* ``get_condition_uncondition``: the conditional pass keeps all inputs; the
  unconditional pass zeroes the text embedding (TextAttr dropout with
  rate 1) and drops the video condition flag (BooleanFlag dropout) —
  exactly the reference's zero-dropout vs full-dropout passes (:498-540).
* ``edit_for_inference``: at inference the *unconditional* branch keeps
  use_video_condition=True (no CFG on conditional frames, reference
  conditioner.py:131-145).

Everything is shape-static under jit: the number of conditional frames k is
encoded in the mask, never branched on in Python.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct


class DataType:
    IMAGE = "image"
    VIDEO = "video"


@struct.dataclass
class Video2WorldCondition:
    """Condition pytree fed to the model's denoise step.

    ``data_type`` is static (affects shapes); array leaves are traced.
    """

    crossattn_emb: jax.Array  # (B, L, D_text)
    fps: Optional[jax.Array] = None  # (B,)
    padding_mask: Optional[jax.Array] = None  # (B, 1, H, W)
    data_type: str = struct.field(pytree_node=False, default=DataType.VIDEO)
    # video conditioning
    gt_frames: Optional[jax.Array] = None  # (B, C, T, H, W) clean latents
    condition_video_mask: Optional[jax.Array] = None  # (B, 1, T, 1, 1)
    use_video_condition: Optional[jax.Array] = None  # scalar or (B,) bool
    # action conditioning (robot variants): (B, T_act, action_dim)
    action: Optional[jax.Array] = None
    # camera conditioning (Plücker-ray style per-token embedding in the
    # patchified token grid): (B, Tt, Hp, Wp, camera_dim)
    camera: Optional[jax.Array] = None

    @property
    def is_video(self) -> bool:
        return self.data_type == DataType.VIDEO

    def set_video_condition(
        self,
        gt_frames: jax.Array,
        num_conditional_frames: jax.Array | int,
    ) -> "Video2WorldCondition":
        """Set gt_frames + the first-k-frames conditioning mask.

        ``num_conditional_frames``: int or (B,) int array; the mask marks
        latent frames [0, k) as conditioning (reference conditioner.py:45-131).
        For image batches (T == 1) the mask is all zeros.
        """
        B, _, T, _, _ = gt_frames.shape
        k = jnp.asarray(num_conditional_frames)
        if k.ndim == 0:
            k = jnp.broadcast_to(k, (B,))
        if T == 1:
            mask = jnp.zeros((B, 1, T, 1, 1), dtype=gt_frames.dtype)
        else:
            frame_idx = jnp.arange(T)[None, :]  # (1, T)
            mask = (frame_idx < k[:, None]).astype(gt_frames.dtype)  # (B, T)
            mask = mask[:, None, :, None, None]
        return self.replace(gt_frames=gt_frames, condition_video_mask=mask)

    def edit_for_inference(self, is_cfg_conditional: bool, num_conditional_frames: int) -> "Video2WorldCondition":
        cond = self.set_video_condition(self.gt_frames, num_conditional_frames)
        if not is_cfg_conditional:
            # no CFG on conditional frames (reference: fill_(True))
            cond = cond.replace(use_video_condition=jnp.asarray(True))
        return cond


def make_condition(
    t5_text_embeddings: jax.Array,
    fps: Optional[jax.Array] = None,
    padding_mask: Optional[jax.Array] = None,
    data_type: str = DataType.VIDEO,
) -> Video2WorldCondition:
    return Video2WorldCondition(
        crossattn_emb=t5_text_embeddings,
        fps=fps,
        padding_mask=padding_mask,
        data_type=data_type,
        use_video_condition=jnp.asarray(True),
    )


def get_condition_uncondition(
    condition: Video2WorldCondition,
) -> tuple[Video2WorldCondition, Video2WorldCondition]:
    """CFG pair: cond (no dropout) and uncond (full dropout).

    Reference GeneralConditioner.get_condition_uncondition (:498-540):
    under full dropout TextAttr zeroes the embedding and BooleanFlag
    drops use_video_condition to False.
    """
    uncond = condition.replace(
        crossattn_emb=jnp.zeros_like(condition.crossattn_emb),
        use_video_condition=jnp.asarray(False),
    )
    return condition, uncond


def get_condition_with_negative_prompt(
    condition: Video2WorldCondition,
    negative_text_embeddings: jax.Array,
) -> tuple[Video2WorldCondition, Video2WorldCondition]:
    """CFG pair where the unconditional branch uses negative-prompt text."""
    uncond = condition.replace(
        crossattn_emb=negative_text_embeddings,
        use_video_condition=jnp.asarray(False),
    )
    return condition, uncond


def apply_train_dropout(
    rng: jax.Array,
    condition: Video2WorldCondition,
    text_dropout_rate: float = 0.2,
    video_cond_dropout_rate: float = 0.0,
) -> Video2WorldCondition:
    """Training-time random conditioning dropout (per sample).

    TextAttr.random_dropout_input (conditioner.py:269-286): bernoulli keep
    mask multiplied into the embedding. BooleanFlag dropout flips
    use_video_condition to False for dropped samples.
    """
    rng_text, rng_flag = jax.random.split(rng)
    B = condition.crossattn_emb.shape[0]
    keep = jax.random.bernoulli(rng_text, 1.0 - text_dropout_rate, (B,))
    emb = condition.crossattn_emb * keep[:, None, None].astype(condition.crossattn_emb.dtype)
    use_video = jax.random.bernoulli(rng_flag, 1.0 - video_cond_dropout_rate, ())
    return condition.replace(crossattn_emb=emb, use_video_condition=use_video)
