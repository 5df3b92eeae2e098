"""T5 / umT5 offline text-embedding paths.

Capability parity with the reference offline-embedding helpers
(cosmos_predict2/_src/predict2/inference/get_t5_emb.py:28 — T5-11B
``CosmosT5TextEncoder`` producing the precomputed ``t5_text_embeddings``
batches — and get_umt5_emb.py for the Wan path).

Two backends:
* ``backend="jax"`` (default when weights are loadable) — the first-party
  Flax tower (text_encoders/t5_encoder.py, HF-parity-tested) running on
  the accelerator; the HF repo supplies only the tokenizer + weights.
* ``backend="torch"`` — the HF torch module on host (fallback for
  checkpoints whose config the converter doesn't know).
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

    def __init__(self, model_path: str, max_length: int = 512, backend: str = "jax"):
        assert backend in ("jax", "torch"), backend
        self.model_path = model_path
        self.max_length = max_length
        self.backend = backend
        self._model = None
        self._tokenizer = None
        self._jax_apply = None

    def _load(self):
        if self._tokenizer is None:
            from transformers import AutoTokenizer

            self._tokenizer = AutoTokenizer.from_pretrained(self.model_path)
        if self.backend == "jax" and self._jax_apply is None:
            import jax
            import jax.numpy as jnp
            import torch
            from transformers import T5EncoderModel

            from cosmos_predict2_tpu.text_encoders.t5_encoder import (
                T5Config,
                T5Encoder,
                convert_t5_hf_state_dict,
            )

            hf = T5EncoderModel.from_pretrained(self.model_path, torch_dtype=torch.float32).eval()
            c = hf.config
            cfg = T5Config(
                vocab_size=c.vocab_size,
                d_model=c.d_model,
                d_kv=c.d_kv,
                d_ff=c.d_ff,
                num_layers=c.num_layers,
                num_heads=c.num_heads,
                relative_attention_num_buckets=c.relative_attention_num_buckets,
                relative_attention_max_distance=c.relative_attention_max_distance,
                gated_act="gated" in c.feed_forward_proj,
                per_layer_rel_bias=c.model_type == "umt5",
                dtype=jnp.bfloat16,
            )
            params = jax.tree.map(
                jnp.asarray, convert_t5_hf_state_dict(hf.state_dict(), cfg.num_layers)
            )
            del hf
            enc = T5Encoder(cfg)
            self._jax_apply = jax.jit(lambda ids, mask: enc.apply(params, ids, mask))
            log.info(f"loaded T5 encoder from {self.model_path} (jax tower)")
        elif self.backend == "torch" and self._model is None:
            import torch
            from transformers import T5EncoderModel

            self._model = T5EncoderModel.from_pretrained(self.model_path, torch_dtype=torch.float32).eval()
            log.info(f"loaded T5 encoder from {self.model_path} (torch host)")

    def __call__(self, prompts: list[str]) -> np.ndarray:
        self._load()
        batch = self._tokenizer(
            prompts,
            return_tensors="np",
            padding="max_length",
            truncation=True,
            max_length=self.max_length,
        )
        if self.backend == "jax":
            import jax.numpy as jnp

            emb = self._jax_apply(
                jnp.asarray(batch["input_ids"], dtype=jnp.int32),
                jnp.asarray(batch["attention_mask"], dtype=jnp.int32),
            )
            return np.asarray(emb, dtype=np.float32)
        import torch

        with torch.no_grad():
            out = self._model(
                input_ids=torch.from_numpy(np.asarray(batch["input_ids"], dtype=np.int64)),
                attention_mask=torch.from_numpy(np.asarray(batch["attention_mask"], dtype=np.int64)),
            )
        emb = out.last_hidden_state * torch.from_numpy(
            np.asarray(batch["attention_mask"], dtype=np.float32)
        )[..., None]
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
