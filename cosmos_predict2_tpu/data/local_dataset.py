"""Local post-training dataset: a folder of video clips + text captions.

Capability parity with the reference local datasets
(predict2/datasets/local_datasets/dataset_video.py: folder of mp4s with
matching .txt captions, resize-smallest-side + center-crop + normalize
augmentors, fixed frame count 4k+1) plus the precomputed-embedding path
(t5_text_embeddings .npy next to the clip).

Layout:
    root/
      videos/clip_0001.{mp4,gif,npz,dir}   (any utils.io-readable video)
      metas/clip_0001.txt                  caption
      t5_xxl/clip_0001.npy                 optional precomputed embedding
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import numpy as np

from cosmos_predict2_tpu.inference.pipeline import resize_input
from cosmos_predict2_tpu.utils import log
from cosmos_predict2_tpu.utils.io import read_video


@dataclasses.dataclass(frozen=True)
class LocalVideoDatasetConfig:
    root: str = "datasets/custom"
    batch_size: int = 1
    num_frames: int = 93  # 4*23+1 <-> state_t 24
    height: int = 704
    width: int = 1280
    text_len: int = 512
    text_dim: int = 1024
    seed: int = 0


class LocalVideoDataset:
    def __init__(self, config: LocalVideoDatasetConfig):
        self.config = config
        vdir = os.path.join(config.root, "videos")
        self.clips = sorted(
            os.path.join(vdir, f) for f in os.listdir(vdir)
        ) if os.path.isdir(vdir) else []
        if not self.clips:
            raise FileNotFoundError(f"no clips found under {vdir}")
        log.info(f"LocalVideoDataset: {len(self.clips)} clips under {config.root}")

    def __len__(self):
        return len(self.clips)

    def _caption_path(self, clip_path: str) -> str:
        stem = os.path.splitext(os.path.basename(clip_path))[0]
        return os.path.join(self.config.root, "metas", stem + ".txt")

    def _embedding_path(self, clip_path: str) -> str:
        stem = os.path.splitext(os.path.basename(clip_path))[0]
        return os.path.join(self.config.root, "t5_xxl", stem + ".npy")

    def __getitem__(self, idx: int) -> dict:
        cfg = self.config
        clip_path = self.clips[idx % len(self.clips)]
        frames, fps = read_video(clip_path)
        if frames.shape[0] < cfg.num_frames:
            # pad by repeating the last frame
            pad = np.repeat(frames[-1:], cfg.num_frames - frames.shape[0], axis=0)
            frames = np.concatenate([frames, pad], axis=0)
        else:
            start = np.random.RandomState(cfg.seed + idx).randint(0, frames.shape[0] - cfg.num_frames + 1)
            frames = frames[start : start + cfg.num_frames]
        frames = resize_input(frames, cfg.height, cfg.width)
        batch = {
            "video": frames.transpose(3, 0, 1, 2)[None],  # (1, C, T, H, W) uint8
            "fps": np.asarray([fps], dtype=np.float32),
            "padding_mask": np.zeros((1, 1, cfg.height, cfg.width), dtype=np.float32),
        }
        cap_path = self._caption_path(clip_path)
        batch["caption"] = open(cap_path).read().strip() if os.path.exists(cap_path) else ""
        emb_path = self._embedding_path(clip_path)
        if os.path.exists(emb_path):
            emb = np.load(emb_path).astype(np.float32)
            emb = emb[None] if emb.ndim == 2 else emb
            # fixed text_len for the jitted train step: trim / zero-pad
            if emb.shape[1] >= cfg.text_len:
                emb = emb[:, : cfg.text_len]
            else:
                pad = np.zeros((emb.shape[0], cfg.text_len - emb.shape[1], emb.shape[2]), emb.dtype)
                emb = np.concatenate([emb, pad], axis=1)
            batch["t5_text_embeddings"] = emb
        else:
            # no precomputed embedding: unconditional training for this clip
            # (precompute with text_encoders/t5.py; reference get_t5_emb.py)
            batch["t5_text_embeddings"] = np.zeros(
                (1, cfg.text_len, cfg.text_dim), dtype=np.float32
            )
        return batch

    def __iter__(self):
        i = 0
        while True:
            yield self[i]
            i += 1
