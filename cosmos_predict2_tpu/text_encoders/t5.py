"""T5 / umT5 offline text-embedding paths.

Capability parity with the reference offline-embedding helpers
(cosmos_predict2/_src/predict2/inference/get_t5_emb.py:28 — T5-11B
``CosmosT5TextEncoder`` producing the precomputed ``t5_text_embeddings``
batches — and get_umt5_emb.py for the Wan path). TPU-pragmatic: the
encoders run through HuggingFace torch on host (they are tiny vs the DiT
and run once per prompt offline); outputs are padded to the fixed token
budget and saved as .npy for the training/inference pipelines.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from cosmos_predict2_tpu.utils import log


class OfflineT5Encoder:
    """Wraps a local HF T5/umT5 encoder checkpoint for offline embedding.

    Computes (B, max_length, hidden) embeddings with zero padding past each
    sequence's length (matching the reference's masked-fill, get_t5_emb.py).
    """

    def __init__(self, model_path: str, max_length: int = 512):
        self.model_path = model_path
        self.max_length = max_length
        self._model = None
        self._tokenizer = None

    def _load(self):
        if self._model is None:
            import torch
            from transformers import AutoTokenizer, T5EncoderModel

            self._tokenizer = AutoTokenizer.from_pretrained(self.model_path)
            self._model = T5EncoderModel.from_pretrained(self.model_path, torch_dtype=torch.float32).eval()
            log.info(f"loaded T5 encoder from {self.model_path}")

    def __call__(self, prompts: list[str]) -> np.ndarray:
        import torch

        self._load()
        batch = self._tokenizer(
            prompts,
            return_tensors="pt",
            padding="max_length",
            truncation=True,
            max_length=self.max_length,
        )
        with torch.no_grad():
            out = self._model(input_ids=batch.input_ids, attention_mask=batch.attention_mask)
        emb = out.last_hidden_state  # (B, L, D)
        emb = emb * batch.attention_mask[..., None]  # zero out padding
        return emb.float().numpy()


def save_embeddings(prompts: list[str], encoder, out_paths: list[str]) -> None:
    emb = encoder(prompts)
    for i, path in enumerate(out_paths):
        np.save(path, emb[i])


def load_embedding(path: str, max_length: Optional[int] = None) -> np.ndarray:
    emb = np.load(path).astype(np.float32)
    if emb.ndim == 2:
        emb = emb[None]
    if max_length is not None and emb.shape[1] != max_length:
        if emb.shape[1] > max_length:
            emb = emb[:, :max_length]
        else:
            pad = np.zeros((emb.shape[0], max_length - emb.shape[1], emb.shape[2]), dtype=emb.dtype)
            emb = np.concatenate([emb, pad], axis=1)
    return emb
