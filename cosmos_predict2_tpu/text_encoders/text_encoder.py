"""Cosmos-Reason1 text encoder: tokenize -> Qwen forward -> pooled embedding.

Capability parity with ``TextEncoder``
(cosmos_predict2/_src/predict2/text_encoders/text_encoder.py:69-238):
chat-template tokenization with the image-generator system prompt, pad or
truncate to 512 tokens, forward with all hidden states, per-layer
mean-normalization and FULL_CONCAT / MEAN_POOLING /
POOL_EVERY_N_LAYERS_AND_CONCAT pooling. The 2B Video2World checkpoints use
FULL_CONCAT (28 x 3584 = 100352) feeding the DiT's crossattn projection.

Weight import: ``convert_qwen_hf_state_dict`` maps a HuggingFace
Qwen2.5-VL(-Instruct) LLM state dict onto the Flax tree.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cosmos_predict2_tpu.text_encoders.qwen import QwenConfig, QwenLM, pool_hidden_states
from cosmos_predict2_tpu.utils import log

NUM_EMBEDDING_PADDING_TOKENS = 512
SYSTEM_PROMPT = "You are a helpful assistant who will provide prompts to an image generator."


@dataclasses.dataclass(frozen=True)
class TextEncoderConfig:
    model: QwenConfig = QwenConfig.qwen2_5_vl_7b()
    embedding_concat_strategy: str = "full_concat"
    n_layers_per_group: int = 5
    num_padding_tokens: int = NUM_EMBEDDING_PADDING_TOKENS
    tokenizer_path: Optional[str] = None  # local HF tokenizer dir


class CosmosTextEncoder:
    def __init__(self, config: TextEncoderConfig, params=None):
        self.config = config
        self.lm = QwenLM(config.model)
        self.params = params
        self._tokenizer = None
        self._forward = jax.jit(self._forward_impl)

    # ---------------------------- tokenizer ----------------------------

    @property
    def tokenizer(self):
        if self._tokenizer is None:
            if self.config.tokenizer_path is None:
                raise ValueError("tokenizer_path not set; pass token ids directly to encode_tokens()")
            from transformers import AutoTokenizer

            self._tokenizer = AutoTokenizer.from_pretrained(self.config.tokenizer_path)
        return self._tokenizer

    def tokenize(self, prompts: list[str]) -> np.ndarray:
        """Chat-template tokenization, padded/truncated to 512 ids."""
        tok = self.tokenizer
        pad_id = tok.pad_token_id if tok.pad_token_id is not None else 0
        n = self.config.num_padding_tokens
        rows = []
        for prompt in prompts:
            conversation = [
                {"role": "system", "content": SYSTEM_PROMPT},
                {"role": "user", "content": prompt},
            ]
            ids = tok.apply_chat_template(conversation, tokenize=True, add_generation_prompt=False)
            ids = list(ids)[:n] + [pad_id] * max(0, n - len(ids))
            rows.append(ids[:n])
        return np.asarray(rows, dtype=np.int32)

    # ----------------------------- forward -----------------------------

    def _forward_impl(self, params, input_ids):
        hidden_states = self.lm.apply(params, input_ids)
        return pool_hidden_states(
            hidden_states,
            strategy=self.config.embedding_concat_strategy,
            n_layers_per_group=self.config.n_layers_per_group,
        )

    def encode_tokens(self, input_ids) -> jax.Array:
        if self.params is None:
            raise ValueError("text encoder params not loaded")
        return self._forward(self.params, jnp.asarray(input_ids))

    def compute_text_embeddings_online(self, prompts: list[str]) -> jax.Array:
        return self.encode_tokens(self.tokenize(prompts))

    def encode_multimodal(self, input_ids, vision_embeds, vision_mask) -> jax.Array:
        """Video/image-prompt embeddings (reference reason1 vlm_qwen path):
        vision-tower outputs (text_encoders/qwen_vision.encode_pixels,
        projected to hidden_size) are spliced over the placeholder token
        positions before the LM runs; pooling is unchanged."""
        if self.params is None:
            raise ValueError("text encoder params not loaded")
        hidden_states = self.lm.apply(
            self.params, jnp.asarray(input_ids),
            vision_embeds=vision_embeds, vision_mask=jnp.asarray(vision_mask),
        )
        return pool_hidden_states(
            hidden_states,
            strategy=self.config.embedding_concat_strategy,
            n_layers_per_group=self.config.n_layers_per_group,
        )

    def __call__(self, prompts: list[str]) -> jax.Array:
        return self.compute_text_embeddings_online(prompts)


# --------------------------- weight import ---------------------------


def convert_qwen_hf_state_dict(sd, num_layers: int) -> dict:
    """HF Qwen2(-.5-VL) LLM state dict -> flax {'params': ...}.

    Accepts either ``model.layers.N...`` (text model) or Qwen2.5-VL's
    ``model.language_model.layers.N...`` naming.
    """

    def _get(*names):
        for name in names:
            if name in sd:
                return np.asarray(sd[name])
        raise KeyError(f"none of {names} in state dict")

    def lin(prefix, bias):
        out = {"kernel": np.ascontiguousarray(np.transpose(_get(f"{prefix}.weight")))}
        if bias:
            out["bias"] = _get(f"{prefix}.bias")
        return out

    prefixes = ("model.language_model.", "model.", "")
    base = None
    for cand in prefixes:
        if any(k.startswith(f"{cand}layers.0.") for k in sd):
            base = cand
            break
    if base is None:
        raise KeyError("could not locate transformer layers in state dict")

    qkv_bias = f"{base}layers.0.self_attn.q_proj.bias" in sd
    qk_norm = f"{base}layers.0.self_attn.q_norm.weight" in sd
    p: dict = {"embed_tokens": _get(f"{base}embed_tokens.weight")}
    for i in range(num_layers):
        lp = f"{base}layers.{i}"
        attn = {
            "q_proj": lin(f"{lp}.self_attn.q_proj", qkv_bias),
            "k_proj": lin(f"{lp}.self_attn.k_proj", qkv_bias),
            "v_proj": lin(f"{lp}.self_attn.v_proj", qkv_bias),
            "o_proj": lin(f"{lp}.self_attn.o_proj", False),
        }
        if qk_norm:
            # Qwen3 per-head q/k RMSNorm
            attn["q_norm"] = {"weight": _get(f"{lp}.self_attn.q_norm.weight")}
            attn["k_norm"] = {"weight": _get(f"{lp}.self_attn.k_norm.weight")}
        p[f"layers_{i}"] = {
            "input_layernorm": {"weight": _get(f"{lp}.input_layernorm.weight")},
            "post_attention_layernorm": {"weight": _get(f"{lp}.post_attention_layernorm.weight")},
            "self_attn": attn,
            "mlp": {
                "gate_proj": lin(f"{lp}.mlp.gate_proj", False),
                "up_proj": lin(f"{lp}.mlp.up_proj", False),
                "down_proj": lin(f"{lp}.mlp.down_proj", False),
            },
        }
    p["norm"] = {"weight": _get(f"{base}norm.weight")}
    return {"params": p}


def convert_qwen_guard_hf_state_dict(sd, num_layers: int) -> dict:
    """HF causal-LM guard checkpoint (Qwen2 or Qwen3 family, e.g.
    Qwen/Qwen3Guard-Gen-0.6B) -> flax params for
    :class:`~cosmos_predict2_tpu.text_encoders.qwen.QwenGuardLM`.

    Wraps :func:`convert_qwen_hf_state_dict` (which auto-detects the Qwen3
    deltas: no qkv biases, per-head q/k norms) and adds the LM head —
    ``lm_head.weight`` when the checkpoint carries one, else the tied
    ``embed_tokens`` transposed (tie_word_embeddings, true for the 0.6B
    guard release)."""
    inner = convert_qwen_hf_state_dict(sd, num_layers)["params"]
    if "lm_head.weight" in sd:
        head = np.ascontiguousarray(np.transpose(np.asarray(sd["lm_head.weight"])))
    else:
        head = np.ascontiguousarray(np.transpose(inner["embed_tokens"]))
    return {"params": {"model": inner, "lm_head": head}}
