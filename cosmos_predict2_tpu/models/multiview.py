"""Auto-multiview Video2World (7-camera driving variant).

Capability parity with the reference multiview stack
(cosmos_predict2/_src/predict2_multiview/: MultiViewDiT, per-view RoPE,
MultiViewCrossAttention, multiview_vid2vid_model_rectified_flow.py:134, and
the public API cosmos_predict2/multiview.py:46): the latent T axis packs
views view-major as (V Tv); each view cross-attends its own 512-token
caption; the conditioning mask marks the first k latent frames *of every
view*.

The view packing rides on the unified DiT (networks/dit.py: n_views,
concat_view_embedding) so Ulysses CP and FSDP sharding apply unchanged —
CP splits within each view's frames like the reference's per-view CP split
(rearrange B C (V T) H W -> (B V) C T H W before splitting).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from cosmos_predict2_tpu.models.video2world import RFModelConfig, Video2WorldModel
from cosmos_predict2_tpu.networks.dit import DiTConfig


def multiview_model_config(
    base_net: DiTConfig,
    n_views: int = 7,
    state_t: int = 8,
    concat_view_embedding: bool = True,
    view_condition_dim: int = 6,
    **model_kwargs,
) -> RFModelConfig:
    net = dataclasses.replace(
        base_net,
        n_views=n_views,
        concat_view_embedding=concat_view_embedding,
        view_condition_dim=view_condition_dim if concat_view_embedding else 0,
        concat_condition_mask=True,
    )
    return RFModelConfig(net=net, state_t=state_t * n_views, **model_kwargs)


class MultiviewVid2VidModel(Video2WorldModel):
    """Latents: (B, C, V*Tv, H, W); captions: (B, V*tokens_per_view, D)."""

    @property
    def n_views(self) -> int:
        return self.config.net.n_views

    def set_multiview_condition(self, condition, gt_frames: jax.Array, num_conditional_frames: int):
        """Mark the first k latent frames of EVERY view as conditioning."""
        B, _, VT, _, _ = gt_frames.shape
        V = self.n_views
        Tv = VT // V
        frame_in_view = jnp.arange(VT) % Tv
        mask = (frame_in_view < num_conditional_frames).astype(gt_frames.dtype)
        mask = jnp.broadcast_to(mask[None, None, :, None, None], (B, 1, VT, 1, 1))
        return condition.replace(gt_frames=gt_frames, condition_video_mask=mask)


def stack_views(per_view_latents: list[jax.Array]) -> jax.Array:
    """[V x (B, C, T, H, W)] -> (B, C, V*T, H, W) view-major packing."""
    return jnp.concatenate(per_view_latents, axis=2)


def unstack_views(latents: jax.Array, n_views: int) -> list[jax.Array]:
    vt = latents.shape[2]
    tv = vt // n_views
    return [latents[:, :, i * tv : (i + 1) * tv] for i in range(n_views)]


def view_grid(frames_per_view: list[np.ndarray], cols: int = 4) -> np.ndarray:
    """Arrange per-view clips [(T, H, W, 3)] into one grid video for export
    (reference inference grid layout, predict2_multiview/scripts/inference.py:191-225)."""
    V = len(frames_per_view)
    cols = min(cols, V)
    rows = (V + cols - 1) // cols
    T, H, W, C = frames_per_view[0].shape
    grid = np.zeros((T, rows * H, cols * W, C), dtype=frames_per_view[0].dtype)
    for i, clip in enumerate(frames_per_view):
        r, c = divmod(i, cols)
        grid[:, r * H : (r + 1) * H, c * W : (c + 1) * W] = clip
    return grid
