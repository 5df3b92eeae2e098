"""Multiview (7-camera) inference pipeline.

Capability parity with the reference multiview public API
(cosmos_predict2/multiview.py:46 + multiview_config.py:63-134
MultiviewInferenceArguments / ViewConfig / per-view input paths, and
predict2_multiview/scripts/inference.py:98-225 Vid2VidInference with the
view-grid export): Text2World / Image2World / Video2World over V views at
once, each view cross-attending its own caption copy, outputs written per
view plus a tiled grid video.

The whole denoise (all views packed view-major on the latent T axis) is one
jitted program — view packing is a reshape, so FSDP/CP shardings apply
unchanged (models/multiview.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cosmos_predict2_tpu.conditioning.conditioner import DataType, make_condition
from cosmos_predict2_tpu.models.multiview import (
    MultiviewVid2VidModel,
    unstack_views,
    view_grid,
)
from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig
from cosmos_predict2_tpu.utils import log
from cosmos_predict2_tpu.utils.misc import arch_invariant_rand

# Camera order of the 7-view driving rig (reference multiview_config.py:109-125
# MultiviewInferenceArgumentsWithInputPaths field order).
VIEW_NAMES = (
    "front_wide",
    "rear",
    "rear_left",
    "rear_right",
    "cross_left",
    "cross_right",
    "front_tele",
)


@dataclasses.dataclass
class MultiviewInferenceArguments:
    """Reference MultiviewInferenceArguments (multiview_config.py:72-107)."""

    prompt: str
    inference_type: str = "text2world"  # text2world | image2world | video2world
    n_views: int = 7
    fps: int = 30
    num_steps: int = 35
    guidance: float = 7.0
    seed: int = 1
    # per-view input video paths, keyed by VIEW_NAMES (ViewConfig.video_path);
    # ignored for text2world, first frame used for image2world, first
    # conditioning clip for video2world
    view_paths: dict[str, str] = dataclasses.field(default_factory=dict)

    @property
    def num_input_frames(self) -> int:
        return {"text2world": 0, "image2world": 1, "video2world": 2}[self.inference_type]


class MultiviewInference:
    def __init__(
        self,
        model: MultiviewVid2VidModel,
        params,
        vae_params,
        vae_config: WanVAEConfig = WanVAEConfig(),
        text_encoder=None,
        height: int = 240,
        width: int = 416,
    ):
        self.model = model
        self.params = params
        self.vae = WanVAE(vae_config)
        self.vae_params = vae_params
        self.text_encoder = text_encoder
        self.height, self.width = height, width
        self._jit_generate = jax.jit(
            self._generate_impl, static_argnames=("num_steps", "num_conditional_frames")
        )

    @property
    def frames_per_view(self) -> int:
        tv = self.model.config.state_t // self.model.n_views
        return (tv - 1) * 4 + 1

    def _encode_views(self, videos_u8: np.ndarray) -> jax.Array:
        """(V, T, H, W, 3) uint8 -> packed latents (1, C, V*tv, h, w)."""
        x = jnp.asarray(videos_u8, dtype=jnp.float32) / 127.5 - 1.0
        z = self.vae.apply(self.vae_params, x, method=WanVAE.encode)  # (V, tv, h, w, C)
        z = z.transpose(0, 4, 1, 2, 3)  # (V, C, tv, h, w)
        return jnp.concatenate([z[i][None] for i in range(z.shape[0])], axis=2)

    def _generate_impl(self, params, vae_params, gt_latents, text_emb, noise, guidance,
                       num_steps: int, num_conditional_frames: int):
        condition = make_condition(text_emb, data_type=DataType.VIDEO)
        condition = self.model.set_multiview_condition(condition, gt_latents, num_conditional_frames)
        samples = self.model.generate(
            params, noise, condition, guidance=guidance, num_steps=num_steps,
            num_conditional_frames=num_conditional_frames,
        )
        V = self.model.n_views
        per_view = jnp.concatenate(unstack_views(samples, V), axis=0)  # (V, C, tv, h, w)
        frames = self.vae.apply(
            vae_params, per_view.astype(jnp.bfloat16).transpose(0, 2, 3, 4, 1), method=WanVAE.decode
        )
        return frames  # (V, T, H, W, 3) in [-1, 1]

    def generate(self, args: MultiviewInferenceArguments, videos_u8: Optional[np.ndarray] = None):
        """videos_u8: (V, T0, H, W, 3) conditioning frames (None for t2w).
        Returns (per_view_frames (V, T, H, W, 3) uint8, grid (T, gh, gw, 3))."""
        V = args.n_views
        T, H, W = self.frames_per_view, self.height, self.width
        buf = np.zeros((V, T, H, W, 3), dtype=np.uint8)
        if videos_u8 is not None:
            t0 = min(videos_u8.shape[1], T)
            buf[:, :t0] = videos_u8[:, :t0]
        gt_latents = self._encode_views(buf)

        if self.text_encoder is None:
            raise ValueError("construct with text_encoder=... or precompute embeddings")
        emb_single = self.text_encoder([args.prompt])  # (1, L, D)
        text_emb = jnp.tile(emb_single, (1, V, 1))  # each view gets its caption copy

        k = 0 if args.inference_type == "text2world" else (1 if args.inference_type == "image2world" else 2)
        noise = arch_invariant_rand(gt_latents.shape, seed=args.seed)
        frames = self._jit_generate(
            self.params, self.vae_params, gt_latents, text_emb, noise,
            jnp.float32(args.guidance), num_steps=args.num_steps, num_conditional_frames=k,
        )
        frames_u8 = np.asarray((frames + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        grid = view_grid([frames_u8[i] for i in range(V)])
        log.info(f"multiview generate: {V} views x {frames_u8.shape[1]} frames")
        return frames_u8, grid
