"""Video2World inference pipeline.

Capability parity with ``Video2WorldInference``
(cosmos_predict2/_src/predict2/inference/video2world.py:236-821): input
prep (image -> zero-padded frame video; video -> last 4(k-1)+1 frames +
last-frame padding; aspect-preserving resize + center crop), batch build,
text conditioning (precomputed embeddings or an online encoder), the jitted
generate step, VAE decode, and autoregressive sliding-window long video.

TPU-first: one process drives all local chips; model + VAE calls are
jit-compiled with static clip geometry so repeated calls hit the
compilation cache; CPU offload staging is unnecessary (weights stay in HBM).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cosmos_predict2_tpu.conditioning.conditioner import DataType, make_condition
from cosmos_predict2_tpu.models.video2world import RFModelConfig, Video2WorldModel
from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig
from cosmos_predict2_tpu.utils import log
from cosmos_predict2_tpu.utils.io import get_resolution, read_image, read_video, resize_frames
from cosmos_predict2_tpu.utils.misc import arch_invariant_rand

_IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".webp")
_VIDEO_EXTS = (".mp4", ".webm", ".mkv", ".mov")


def resize_input(frames_thwc: np.ndarray, height: int, width: int) -> np.ndarray:
    """Aspect-preserving resize + center crop (reference resize_input :75)."""
    t, h, w, _ = frames_thwc.shape
    scale = max(width / w, height / h)
    rh, rw = int(math.ceil(scale * h)), int(math.ceil(scale * w))
    resized = resize_frames(frames_thwc, rh, rw)
    top = (rh - height) // 2
    left = (rw - width) // 2
    return resized[:, top : top + height, left : left + width]


def read_and_process_image(path: str, height: int, width: int, num_video_frames: int) -> np.ndarray:
    """image -> (1, 3, T, H, W) uint8; frame 0 is the image, rest zeros."""
    img = read_image(path)  # (H, W, 3)
    frames = np.zeros((num_video_frames,) + img.shape, dtype=np.uint8)
    frames[0] = img
    frames = resize_input(frames, height, width)
    return frames.transpose(3, 0, 1, 2)[None]  # (1, C, T, H, W)


def read_and_process_video(
    path: str, height: int, width: int, num_video_frames: int, num_latent_conditional_frames: int = 2
) -> np.ndarray:
    """video -> (1, 3, T, H, W) uint8: last 4(k-1)+1 frames + last-frame pad."""
    if num_latent_conditional_frames not in (1, 2):
        raise ValueError(f"num_latent_conditional_frames must be 1 or 2, got {num_latent_conditional_frames}")
    frames, _ = read_video(path)
    k = 4 * (num_latent_conditional_frames - 1) + 1
    if frames.shape[0] < k:
        raise ValueError(f"video has {frames.shape[0]} frames, needs >= {k}")
    extracted = frames[-k:]
    full = np.concatenate(
        [extracted, np.repeat(extracted[-1:], num_video_frames - k, axis=0)], axis=0
    ) if num_video_frames > k else extracted[:num_video_frames]
    full = resize_input(full, height, width)
    return full.transpose(3, 0, 1, 2)[None]


@dataclasses.dataclass
class InferenceSetup:
    model_config: RFModelConfig
    vae_config: WanVAEConfig = WanVAEConfig()
    resolution: str = "480"
    aspect: str = "16,9"
    text_len: int = 512
    # explicit (height, width) override of the resolution bucket (tests,
    # custom sizes); must be divisible by 16 (VAE /8 x patch /2)
    size_override: Optional[tuple[int, int]] = None
    # Stream the VAE through O(chunk)-memory causal chunks instead of the
    # one-shot whole-clip encode/decode inside the jit. Required for the
    # full-scale 93-frame 720p workload: a one-shot decode materializes
    # ~93*704*1280*128ch activations (>HBM); the reference likewise chunks
    # (wan2pt1.py:504-592, chunk_duration=81). Sampling stays jitted; the
    # VAE runs as a host loop over two cached compiled chunk programs.
    streaming_vae: bool = False


class Video2WorldInference:
    """End-to-end Text2World / Image2World / Video2World generation."""

    def __init__(
        self,
        setup: InferenceSetup,
        params,
        vae_params,
        text_encoder: Optional[Callable[[list[str]], jax.Array]] = None,
    ):
        self.setup = setup
        self.model = Video2WorldModel(setup.model_config)
        self.vae = WanVAE(setup.vae_config)
        self.params = params
        self.vae_params = vae_params
        self.text_encoder = text_encoder
        # guidance is traced (changing it reuses the compiled program);
        # num_steps / num_conditional_frames change the graph -> static.
        self._generate_jit = jax.jit(
            self._generate_impl, static_argnames=("num_steps", "num_conditional_frames")
        )

    # ------------------------------ helpers ------------------------------

    @property
    def num_video_frames(self) -> int:
        return (self.setup.model_config.state_t - 1) * 4 + 1

    def video_size(self) -> tuple[int, int]:
        if self.setup.size_override is not None:
            return self.setup.size_override
        w, h = get_resolution(self.setup.resolution, self.setup.aspect)
        return h, w

    def encode_text(self, prompts: list[str]) -> jax.Array:
        if self.text_encoder is None:
            raise ValueError(
                "No text encoder attached: pass precomputed embeddings or construct with text_encoder=..."
            )
        return self.text_encoder(prompts)

    # ------------------------------ core ------------------------------

    def _generate_impl(
        self,
        params,
        vae_params,
        video_u8,  # (1, 3, T, H, W) uint8
        text_emb,
        neg_text_emb,
        noise,
        guidance: float,
        num_steps: int,
        num_conditional_frames: int,
    ):
        video = video_u8.astype(jnp.bfloat16) / 127.5 - 1.0
        # VAE expects channels-last (B, T, H, W, C)
        latents = self.vae.apply(vae_params, video.transpose(0, 2, 3, 4, 1), method=WanVAE.encode)
        gt_latents = latents.transpose(0, 4, 1, 2, 3).astype(jnp.float32)  # (B, C, t, h, w)

        condition = make_condition(text_emb, data_type=DataType.VIDEO).replace(gt_frames=gt_latents)
        samples = self.model.generate(
            params,
            noise,
            condition,
            guidance=guidance,
            num_steps=num_steps,
            num_conditional_frames=num_conditional_frames,
            negative_text_embeddings=neg_text_emb,
        )
        frames = self.vae.apply(
            vae_params, samples.astype(jnp.bfloat16).transpose(0, 2, 3, 4, 1), method=WanVAE.decode
        )
        return frames  # (B, T, H, W, 3) in [-1, 1]

    def _run_streaming(
        self, video_u8, text_emb, neg_text_emb, noise, guidance, num_steps, num_conditional_frames,
        pixel_format="float",
    ):
        from cosmos_predict2_tpu.tokenizers.wan_vae_streaming import decode_streaming, encode_streaming

        # uint8-native feed: the clip crosses H2D and lands in HBM as uint8
        # (0.25 GB at full scale); normalize fuses into the encode chunks.
        latents = encode_streaming(
            self.vae.config,
            self.vae_params,
            jnp.asarray(video_u8).transpose(0, 2, 3, 4, 1),
            pixel_format="uint8",
        )
        gt_latents = latents.transpose(0, 4, 1, 2, 3).astype(jnp.float32)
        # host-stepped UniPC (one jitted CFG forward per device execution):
        # at full scale a single 35-step scan program runs ~17 min, long
        # enough to hit connection/watchdog limits
        condition = make_condition(text_emb, data_type=DataType.VIDEO).replace(gt_frames=gt_latents)
        samples = self.model.generate(
            self.params,
            noise,
            condition,
            guidance=guidance,
            num_steps=num_steps,
            num_conditional_frames=num_conditional_frames,
            negative_text_embeddings=neg_text_emb,
            host_loop=True,
        )
        return decode_streaming(
            self.vae.config,
            self.vae_params,
            samples.astype(self.vae.config.dtype).transpose(0, 2, 3, 4, 1),
            # chunk 1 here (not the standalone-optimal 2): the 2B DiT params
            # are co-resident with the decoder in the pipeline and the
            # chunk-2 working set tips a 16 GB chip into RESOURCE_EXHAUSTED
            chunk_latent_frames=1,
            out="host",
            pixel_format=pixel_format,
        )

    def _run_dmd2(self, video_u8, text_emb, noise, num_steps, num_conditional_frames, pixel_format="float"):
        """Distilled few-step path (no CFG — guidance is distilled into the
        student): reference generate_samples_from_batch_dmd2
        (text2world_model_rectified_flow.py:603-677), 4 TrigFlow times."""
        from cosmos_predict2_tpu.models.distillation import DistillationConfig, DistillationModel
        from cosmos_predict2_tpu.tokenizers.wan_vae_streaming import decode_streaming, encode_streaming

        if not hasattr(self, "_dm"):
            self._dm = DistillationModel(DistillationConfig(model=self.setup.model_config))
            self._dmd2_gen = jax.jit(
                lambda p, n, c, k, ncf: self._dm.generate(
                    p, n, c, num_steps=k, num_conditional_frames=ncf
                ),
                static_argnums=(3, 4),
            )
        if self.setup.streaming_vae:
            latents = encode_streaming(
                self.vae.config,
                self.vae_params,
                jnp.asarray(video_u8).transpose(0, 2, 3, 4, 1),
                pixel_format="uint8",
            )
        else:
            video = jnp.asarray(video_u8).astype(jnp.bfloat16) / 127.5 - 1.0
            latents = self.vae.apply(self.vae_params, video.transpose(0, 2, 3, 4, 1), method=WanVAE.encode)
        gt = latents.transpose(0, 4, 1, 2, 3).astype(jnp.float32)
        condition = make_condition(text_emb, data_type=DataType.VIDEO).replace(gt_frames=gt)
        x = self._dmd2_gen(self.params, noise, condition, num_steps, num_conditional_frames)
        xt = x.astype(self.vae.config.dtype).transpose(0, 2, 3, 4, 1)
        if self.setup.streaming_vae:
            return decode_streaming(
                self.vae.config, self.vae_params, xt, chunk_latent_frames=1,
                out="host", pixel_format=pixel_format,  # chunk 1: DiT co-resident (see _run)
            )
        return self.vae.apply(self.vae_params, xt, method=WanVAE.decode)

    def generate_vid2world(
        self,
        video_u8: np.ndarray,
        text_emb: jax.Array,
        neg_text_emb: Optional[jax.Array] = None,
        guidance: float = 7.0,
        num_steps: int = 35,
        num_conditional_frames: int = 1,
        seed: int = 1,
        sampler: str = "unipc",  # "unipc" (CFG) or "dmd2" (distilled 4-step)
        pixel_format: str = "float",  # "float" [-1,1] or "uint8" [0,255]
    ) -> np.ndarray:
        """(1, 3, T, H, W) uint8 -> (T, H, W, 3) float in [-1, 1] (default)
        or uint8 [0, 255] with ``pixel_format="uint8"``.

        Every production consumer (guardrails, mp4/png writers, the
        autoregressive write-back buffer) quantizes to uint8 immediately;
        on the streaming-VAE route ``pixel_format="uint8"`` fuses that
        quantization into the compiled decode chunk program, halving the
        device->host transfer (PERF.md "VAE roofline": 24.9 -> 17.3 s for
        the full-scale decode) and skipping the host float pass entirely.
        """
        assert sampler in ("unipc", "dmd2"), f"unknown sampler {sampler!r}"
        assert pixel_format in ("float", "uint8"), pixel_format
        mc = self.setup.model_config
        _, _, T, H, W = video_u8.shape
        state_shape = (1, mc.state_ch, 1 + (T - 1) // 4, H // 8, W // 8)
        noise = arch_invariant_rand(state_shape, seed=seed)
        if sampler == "dmd2":
            frames = self._run_dmd2(
                video_u8, text_emb, noise, min(num_steps, 4), num_conditional_frames,
                pixel_format=pixel_format,
            )
        elif self.setup.streaming_vae:
            frames = self._run_streaming(
                video_u8, text_emb, neg_text_emb, noise, guidance, num_steps, num_conditional_frames,
                pixel_format=pixel_format,
            )
        else:
            frames = self._generate_jit(
                self.params,
                self.vae_params,
                jnp.asarray(video_u8),
                text_emb,
                neg_text_emb,
                noise,
                guidance=guidance,
                num_steps=num_steps,
                num_conditional_frames=num_conditional_frames,
            )
        return self._to_pixel_format(frames, pixel_format)[0]

    @staticmethod
    def _to_pixel_format(frames, pixel_format: str) -> np.ndarray:
        """Normalize any decode route's output to the requested format."""
        arr = np.asarray(frames)
        if pixel_format == "uint8":
            if arr.dtype == np.uint8:
                return arr
            return np.round((np.clip(arr.astype(np.float32), -1.0, 1.0) + 1.0) * 127.5).astype(np.uint8)
        if arr.dtype == np.uint8:
            return arr.astype(np.float32) / 127.5 - 1.0
        return arr.astype(np.float32)

    def generate_vid2world_batch(
        self,
        video_u8: np.ndarray,  # (B, 3, T, H, W) uint8
        text_emb: jax.Array,  # (B, L, D)
        neg_text_emb: Optional[jax.Array] = None,
        guidance: float = 7.0,
        num_steps: int = 35,
        num_conditional_frames: int = 1,
        seeds: Optional[list[int]] = None,
        pixel_format: str = "float",
    ) -> np.ndarray:
        """Batched serving path: N same-geometry requests in ONE sampling
        pass -> (B, T, H, W, 3) float in [-1, 1]. The denoise loop runs at
        batch 2B (batched CFG), filling the MXU far better than B
        sequential passes; per-sample seeds keep noise identical to the
        single-sample path. (The reference serves one request per GPU
        process — cosmos-gradio model_server; on TPU one process owns the
        chips, so batching is the natural throughput lever.)"""
        B = video_u8.shape[0]
        mc = self.setup.model_config
        _, _, T, H, W = video_u8.shape
        seeds = seeds if seeds is not None else list(range(1, B + 1))
        assert len(seeds) == B, f"need {B} seeds, got {len(seeds)}"
        per = (1, mc.state_ch, 1 + (T - 1) // 4, H // 8, W // 8)
        noise = jnp.concatenate([arch_invariant_rand(per, seed=s) for s in seeds], axis=0)
        if self.setup.streaming_vae:
            frames = self._run_streaming(
                video_u8, text_emb, neg_text_emb, noise, guidance, num_steps, num_conditional_frames,
                pixel_format=pixel_format,
            )
        else:
            frames = self._generate_jit(
                self.params,
                self.vae_params,
                jnp.asarray(video_u8),
                text_emb,
                neg_text_emb,
                noise,
                guidance=guidance,
                num_steps=num_steps,
                num_conditional_frames=num_conditional_frames,
            )
        return self._to_pixel_format(frames, pixel_format)

    # ----------------------- autoregressive mode -----------------------

    def generate_autoregressive(
        self,
        video_u8: np.ndarray,  # (1, 3, T0, H, W): initial conditioning frames
        text_emb: jax.Array,
        num_output_frames: int,
        chunk_size: Optional[int] = None,
        chunk_overlap: int = 1,
        num_conditional_frames: int = 1,
        guidance: float = 7.0,
        num_steps: int = 35,
        seed: int = 1,
        neg_text_emb: Optional[jax.Array] = None,
        pixel_format: str = "float",
    ) -> np.ndarray:
        """Sliding-window long-video generation
        (reference generate_autoregressive_from_batch, video2world.py:582-804):
        generate chunk, write generated frames back into the input buffer,
        re-condition the next chunk on the overlap, advance.

        chunk_overlap counts *latent* frames; chunk_size is pixel frames per
        chunk (defaults to the model's native clip length).
        """
        chunk = chunk_size or self.num_video_frames
        _, _, t0, H, W = video_u8.shape
        overlap_px = (chunk_overlap - 1) * 4 + 1

        # size the buffer so every window is exactly ``chunk`` frames —
        # a shorter tail window would change the jitted shape and force a
        # recompile of the whole sampling graph for the final chunk
        stride = chunk - overlap_px
        n_chunks = 1 + max(0, -(-(num_output_frames - chunk) // stride))
        buffer = np.zeros((1, 3, (n_chunks - 1) * stride + chunk, H, W), dtype=np.uint8)
        buffer[:, :, :t0] = video_u8
        out_frames: list[np.ndarray] = []

        start = 0
        chunk_idx = 0
        while len(out_frames) < num_output_frames:
            window = buffer[:, :, start : start + chunk]
            k = num_conditional_frames if chunk_idx == 0 else chunk_overlap
            # the re-conditioning buffer is uint8 either way; generate in the
            # caller's pixel_format so the FLOAT api keeps full-precision
            # outputs (only the written-back conditioning frames quantize,
            # matching the reference's uint8 input buffer), while the uint8
            # api gets the device-side-quantized fast path
            frames = self.generate_vid2world(
                window,
                text_emb,
                neg_text_emb=neg_text_emb,
                guidance=guidance,
                num_steps=num_steps,
                num_conditional_frames=k,
                seed=seed + chunk_idx,
                pixel_format=pixel_format,
            )  # (chunk, H, W, 3) in the requested format
            frames_u8 = self._to_pixel_format(frames, "uint8")
            # write generated frames back into the buffer for re-conditioning
            end = min(start + chunk, buffer.shape[2])
            buffer[0, :, start:end] = frames_u8.transpose(3, 0, 1, 2)[:, : end - start]
            new = frames if chunk_idx == 0 else frames[overlap_px:]
            out_frames.extend(list(new))
            start += chunk - overlap_px
            chunk_idx += 1
            log.info(f"autoregressive chunk {chunk_idx}: {len(out_frames)}/{num_output_frames} frames")

        return np.stack(out_frames[:num_output_frames])


class Text2ImageInference:
    """Image-mode generation (reference predict2/inference/text2image.py:52-111
    Text2ImageInference.generate_image): a single-latent-frame (T=1) sample
    through the same rectified-flow DiT, decoded to one image.

    The T=1 path flows through the standard Video2World machinery — the
    conditioning mask is all-zero for images (conditioner.py here,
    set_video_condition), so no frames are pinned and the model runs as a
    pure text-to-image sampler with IMAGE-type RoPE/temporal handling."""

    def __init__(self, setup: InferenceSetup, params, vae_params, text_encoder=None):
        # image mode forces a single latent frame
        import dataclasses as _dc

        setup = _dc.replace(setup, model_config=_dc.replace(setup.model_config, state_t=1))
        self._v2w = Video2WorldInference(setup, params, vae_params, text_encoder=text_encoder)

    def encode_text(self, prompts: list[str]) -> jax.Array:
        return self._v2w.encode_text(prompts)

    def generate_image(
        self,
        text_emb: jax.Array,
        neg_text_emb: Optional[jax.Array] = None,
        guidance: float = 7.0,
        num_steps: int = 35,
        seed: int = 1,
    ) -> np.ndarray:
        """-> (H, W, 3) uint8 image."""
        setup = self._v2w.setup
        if setup.size_override is not None:
            H, W = setup.size_override
        else:
            from cosmos_predict2_tpu.utils.io import get_image_resolution

            w, h = get_image_resolution(setup.resolution, setup.aspect)
            H, W = h, w
        # single gray input frame; with num_conditional_frames=0 and the
        # T=1 zero mask it only sets shapes, never pixels
        video_u8 = np.full((1, 3, 1, H, W), 127, dtype=np.uint8)
        frames = self._v2w.generate_vid2world(
            video_u8,
            text_emb,
            neg_text_emb=neg_text_emb,
            guidance=guidance,
            num_steps=num_steps,
            num_conditional_frames=0,
            seed=seed,
        )  # (1, H, W, 3) in [-1, 1]
        return ((frames[0] + 1.0) * 127.5).clip(0, 255).astype(np.uint8)

    def save_image(self, image_u8: np.ndarray, path: str) -> str:
        import os

        from PIL import Image

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        Image.fromarray(image_u8).save(path)
        return path
