"""Public Inference API.

Capability parity with ``cosmos_predict2/inference.py:29-173`` (`Inference`)
and the pydantic/tyro CLI arg system (`cosmos_predict2/config.py:204-472`):
typed setup + per-sample inference arguments, batch loading from json/jsonl,
text/video guardrail hook points, and media export.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from cosmos_predict2_tpu.inference.pipeline import (
    InferenceSetup,
    Video2WorldInference,
    read_and_process_image,
    read_and_process_video,
    _IMAGE_EXTS,
    _VIDEO_EXTS,
)
from cosmos_predict2_tpu.utils import log
from cosmos_predict2_tpu.utils.flags import SMOKE
from cosmos_predict2_tpu.utils.io import save_img_or_video


@dataclasses.dataclass
class InferenceArguments:
    """Per-sample arguments (reference cosmos_predict2/config.py:406-470)."""

    name: str = "sample"
    prompt: str = ""
    input_path: Optional[str] = None  # image or video; None => Text2World
    negative_prompt: str = ""
    num_output_frames: int = 77
    num_steps: int = 35 if not SMOKE else 1
    guidance: float = 7.0
    seed: int = 1
    num_conditional_frames: int = 1
    # autoregressive long-video mode
    enable_autoregressive: bool = False
    chunk_size: int = 77
    chunk_overlap: int = 1
    # precomputed text embedding path (.npy) when no online encoder
    text_embedding_path: Optional[str] = None
    # "video" (default) or "image": image runs the Text2Image single-frame
    # path (reference inference/text2image.py) and writes a png
    mode: str = "video"
    # "unipc" (35-step CFG) or "dmd2" (distilled 4-step student, no CFG —
    # reference generate_samples_from_batch_dmd2)
    sampler: str = "unipc"

    @staticmethod
    def from_file(path: str) -> list["InferenceArguments"]:
        """Load a batch of samples from json (list or single) / jsonl."""
        samples = []
        with open(path) as f:
            if path.endswith(".jsonl"):
                items = [json.loads(line) for line in f if line.strip()]
            else:
                data = json.load(f)
                items = data if isinstance(data, list) else [data]
        for item in items:
            known = {f.name for f in dataclasses.fields(InferenceArguments)}
            samples.append(InferenceArguments(**{k: v for k, v in item.items() if k in known}))
        return samples


class Inference:
    """Top-level generate() loop with guardrail hook points."""

    def __init__(
        self,
        pipe: Video2WorldInference,
        output_dir: str = "outputs",
        text_guardrail=None,
        video_guardrail=None,
        keep_going: bool = True,
    ):
        self.pipe = pipe
        self.output_dir = output_dir
        self.text_guardrail = text_guardrail
        self.video_guardrail = video_guardrail
        self.keep_going = keep_going
        os.makedirs(output_dir, exist_ok=True)

    def _text_embedding(self, args: InferenceArguments, prompt: str):
        if args.text_embedding_path and prompt == args.prompt:
            emb = np.load(args.text_embedding_path)
            return jnp.asarray(emb if emb.ndim == 3 else emb[None])
        return self.pipe.encode_text([prompt])

    def generate(self, samples: list[InferenceArguments]) -> list[str]:
        outputs = []
        for args in samples:
            try:
                outputs.append(self._generate_sample(args))
            except Exception as e:
                if not self.keep_going:
                    raise
                import traceback

                log.error(f"sample {args.name} failed; continuing (keep_going): {e}\n{traceback.format_exc()}")
        return outputs

    def _prepare_video(self, args: InferenceArguments) -> tuple[np.ndarray, int]:
        """(1, 3, T, H, W) uint8 input buffer + num conditional frames."""
        h, w = self.pipe.video_size()
        nvf = self.pipe.num_video_frames
        if args.input_path is None:
            return np.zeros((1, 3, nvf, h, w), dtype=np.uint8), 0
        if args.input_path.lower().endswith(_IMAGE_EXTS):
            return read_and_process_image(args.input_path, h, w, nvf), 1
        if args.input_path.lower().endswith(_VIDEO_EXTS):
            video = read_and_process_video(args.input_path, h, w, nvf, args.num_conditional_frames)
            return video, args.num_conditional_frames
        raise ValueError(f"unsupported input: {args.input_path}")

    @staticmethod
    def batch_key(args: InferenceArguments):
        """Requests with equal keys can share one batched sampling pass."""
        k = 0 if args.input_path is None else (
            1 if args.input_path.lower().endswith(_IMAGE_EXTS) else args.num_conditional_frames
        )
        return (
            args.mode,
            args.enable_autoregressive,
            args.guidance,
            args.num_steps,
            k,
            bool(args.negative_prompt),
            args.sampler,
        )

    def generate_batch(self, samples: list[InferenceArguments]) -> dict[str, str]:
        """Serve N same-geometry video requests in one sampling pass.

        Returns {name: output_path}; per-sample failures (guardrails, IO)
        raise under keep_going=False, otherwise are logged and skipped.
        Falls back to the sequential loop when the batch is not batchable
        (mixed keys, image mode, autoregressive).
        """
        keys = {self.batch_key(a) for a in samples}
        batchable = (
            len(samples) > 1
            and len(keys) == 1
            and samples[0].mode != "image"
            and not samples[0].enable_autoregressive
            # the batched pass is the UniPC CFG program; other samplers
            # (dmd2) run per-sample through _generate_sample
            and samples[0].sampler == "unipc"
        )
        if not batchable:
            outputs: dict[str, str] = {}
            for a in samples:
                try:
                    outputs[a.name] = self._generate_sample(a)
                except Exception as e:
                    if not self.keep_going:
                        raise
                    log.error(f"sample {a.name} failed; continuing (keep_going): {e}")
            return outputs

        ok: list[InferenceArguments] = []
        videos = []
        for args in samples:
            try:
                if self.text_guardrail is not None and not self.text_guardrail(args.prompt):
                    raise ValueError(f"prompt for {args.name} blocked by text guardrail")
                video, k = self._prepare_video(args)
                videos.append(video)
                ok.append(args)
            except Exception:
                if not self.keep_going:
                    raise
                log.error(f"sample {args.name} failed in prep; continuing (keep_going)")
        if not ok:
            return {}

        # ONE batched text-encoder forward + ONE batched sampling pass
        # (per-sample precomputed embeddings concat if any path is given)
        if any(a.text_embedding_path for a in ok):
            import jax.numpy as jnp

            emb = jnp.concatenate([self._text_embedding(a, a.prompt) for a in ok], axis=0)
            neg = (
                jnp.concatenate([self._text_embedding(a, a.negative_prompt) for a in ok], axis=0)
                if ok[0].negative_prompt
                else None
            )
        else:
            emb = self.pipe.encode_text([a.prompt for a in ok])
            neg = self.pipe.encode_text([a.negative_prompt for a in ok]) if ok[0].negative_prompt else None
        # uint8 end-to-end: the streaming decode quantizes on device (half
        # the D2H), the guardrail + mp4 writer consume uint8 natively
        frames_b = self.pipe.generate_vid2world_batch(
            np.concatenate(videos, axis=0),
            emb,
            neg_text_emb=neg,
            guidance=ok[0].guidance,
            num_steps=ok[0].num_steps,
            num_conditional_frames=self.batch_key(ok[0])[4],
            seeds=[a.seed for a in ok],
            pixel_format="uint8",
        )

        outputs: dict[str, str] = {}
        for args, frames in zip(ok, frames_b):
            try:
                if self.video_guardrail is not None:
                    frames = self.video_guardrail(frames)
                    if frames is None:
                        raise RuntimeError(f"sample {args.name}: video blocked by guardrail")
                outputs[args.name] = save_img_or_video(
                    frames, os.path.join(self.output_dir, args.name), fps=16
                )
                log.info(f"saved {outputs[args.name]}")
            except Exception:
                if not self.keep_going:
                    raise
                log.error(f"sample {args.name} failed post-processing; continuing (keep_going)")
        return outputs

    def _generate_sample(self, args: InferenceArguments) -> str:
        if self.text_guardrail is not None and not self.text_guardrail(args.prompt):
            raise ValueError(f"prompt for {args.name} blocked by text guardrail")

        if args.mode == "image":
            from cosmos_predict2_tpu.inference.pipeline import Text2ImageInference

            if not hasattr(self, "_t2i"):
                self._t2i = Text2ImageInference(
                    self.pipe.setup, self.pipe.params, self.pipe.vae_params,
                    text_encoder=self.pipe.text_encoder,
                )
            img = self._t2i.generate_image(
                self._text_embedding(args, args.prompt),
                neg_text_emb=self._text_embedding(args, args.negative_prompt) if args.negative_prompt else None,
                guidance=args.guidance, num_steps=args.num_steps, seed=args.seed,
            )
            path = self._t2i.save_image(img, os.path.join(self.output_dir, args.name + ".png"))
            log.info(f"saved {path}")
            return path

        video, k = self._prepare_video(args)
        emb = self._text_embedding(args, args.prompt)
        neg = self._text_embedding(args, args.negative_prompt) if args.negative_prompt else None

        # k == 0 (no input): pure Text2World, no conditional frames pinned.
        # uint8 end-to-end: device-side quantization on the streaming decode,
        # guardrail + writer consume uint8 natively (no float round-trip).
        if args.enable_autoregressive:
            frames = self.pipe.generate_autoregressive(
                video,
                emb,
                num_output_frames=args.num_output_frames,
                chunk_size=args.chunk_size,
                chunk_overlap=args.chunk_overlap,
                num_conditional_frames=k,
                guidance=args.guidance,
                num_steps=args.num_steps,
                seed=args.seed,
                neg_text_emb=neg,
                pixel_format="uint8",
            )
        else:
            frames = self.pipe.generate_vid2world(
                video,
                emb,
                neg_text_emb=neg,
                guidance=args.guidance,
                num_steps=args.num_steps,
                num_conditional_frames=k,
                seed=args.seed,
                sampler=args.sampler,
                pixel_format="uint8",
            )

        if self.video_guardrail is not None:
            frames = self.video_guardrail(frames)
            if frames is None:
                # fail-closed with a clear reason instead of an opaque
                # np.asarray(None) crash downstream (ADVICE r1); with
                # keep_going=True the batch loop logs and moves on.
                raise RuntimeError(f"sample {args.name}: video blocked by guardrail")

        path = save_img_or_video(frames, os.path.join(self.output_dir, args.name), fps=16)
        log.info(f"saved {path}")
        return path
