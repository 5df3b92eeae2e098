"""Qwen2.5(-VL) language model (text path) in Flax — the Cosmos-Reason1
text encoder backbone.

Architecture parity with the reference reason1 stack
(cosmos_predict2/_src/reason1/networks/qwen2_5_vl.py + the config at
predict2/text_encoders/text_encoder.py:49-66): 7B = hidden 3584, 28 layers,
28 query heads / 4 KV heads (GQA), head_dim 128, SwiGLU ffn 18944, RMSNorm
eps 1e-6, RoPE theta 1e6, attention q/k/v biases, vocab 152064.

For text-only prompts Qwen2.5-VL's M-RoPE degenerates to standard 1D RoPE
(all three position components equal the token index), so the vision tower
and mrope sections are not needed for the Video2World conditioning path;
video-prompt support can plug in a vision tower later.

TPU notes: GQA KV heads are broadcast at attention time; the whole 512-token
forward is a single jit; ``output_hidden_states`` returns all 29 states so
the Cosmos embedding pooling (mean-normalize layers 1..28, concat/mean) is
fused into the same program.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cosmos_predict2_tpu.ops.normalization import rms_norm


@dataclasses.dataclass(frozen=True)
class QwenConfig:
    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1e6
    dtype: jnp.dtype = jnp.bfloat16
    # Qwen3 family deltas (HF Qwen3*: per-head q/k RMSNorm, no attention
    # biases, tied input/output embeddings on the small checkpoints)
    attention_bias: bool = True
    qk_norm: bool = False
    tie_word_embeddings: bool = False

    @classmethod
    def qwen2_5_vl_7b(cls) -> "QwenConfig":
        return cls()

    @classmethod
    def qwen3guard_0_6b(cls) -> "QwenConfig":
        """Qwen/Qwen3Guard-Gen-0.6B — the reference's prompt guard model
        (imaginaire/auxiliary/guardrail/qwen3guard/qwen3guard.py:44)."""
        return cls(
            vocab_size=151936,
            hidden_size=1024,
            intermediate_size=3072,
            num_hidden_layers=28,
            num_attention_heads=16,
            num_key_value_heads=8,
            head_dim=128,
            rope_theta=1e6,
            attention_bias=False,
            qk_norm=True,
            tie_word_embeddings=True,
        )

    @classmethod
    def llama_guard_3_8b(cls) -> "QwenConfig":
        """meta-llama/Llama-Guard-3-8B — the reference's ALTERNATIVE prompt
        guard family (imaginaire/auxiliary/guardrail/llamaGuard3/
        llamaGuard3.py:29-111). Llama-3.1 architecture = this decoder with
        no attention biases, no qk-norm, untied head (GQA + RoPE + RMSNorm
        + SwiGLU are shared)."""
        return cls(
            vocab_size=128256,
            hidden_size=4096,
            intermediate_size=14336,
            num_hidden_layers=32,
            num_attention_heads=32,
            num_key_value_heads=8,
            head_dim=128,
            rope_theta=500000.0,
            attention_bias=False,
            qk_norm=False,
            tie_word_embeddings=False,
        )

    @classmethod
    def tiny(cls) -> "QwenConfig":
        return cls(
            vocab_size=256,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            head_dim=16,
            dtype=jnp.float32,
        )

    @classmethod
    def tiny3(cls) -> "QwenConfig":
        """Tiny Qwen3-architecture config (qk_norm, no biases, tied head)."""
        return dataclasses.replace(
            cls.tiny(), attention_bias=False, qk_norm=True, tie_word_embeddings=True
        )


def rope_1d_angles(positions: jax.Array, head_dim: int, theta: float) -> jax.Array:
    """(S,) int positions -> (S, head_dim) angles, NeoX half-rotation layout."""
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64)[: head_dim // 2] / head_dim))
    ang = positions.astype(jnp.float32)[:, None] * jnp.asarray(freqs, dtype=jnp.float32)[None, :]
    return jnp.concatenate([ang, ang], axis=-1)


def apply_rope_1d(x: jax.Array, angles: jax.Array) -> jax.Array:
    """x: (B, S, H, D); angles (S, D)."""
    d = x.shape[-1]
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., : d // 2], xf[..., d // 2 :]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (xf * cos + rotated * sin).astype(x.dtype)


class QwenAttention(nn.Module):
    config: QwenConfig

    @nn.compact
    def __call__(self, x, angles, attn_mask):
        cfg = self.config
        B, S, _ = x.shape
        nq, nkv, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

        dense = lambda feats, bias, name: nn.Dense(
            feats, use_bias=bias, dtype=cfg.dtype, param_dtype=jnp.float32, name=name
        )
        qkv_bias = cfg.attention_bias
        q = dense(nq * hd, qkv_bias, "q_proj")(x).reshape(B, S, nq, hd)
        k = dense(nkv * hd, qkv_bias, "k_proj")(x).reshape(B, S, nkv, hd)
        v = dense(nkv * hd, qkv_bias, "v_proj")(x).reshape(B, S, nkv, hd)

        if cfg.qk_norm:
            # Qwen3: per-head RMSNorm over head_dim, applied before RoPE
            # (HF Qwen3Attention.q_norm/k_norm)
            q = QwenRMSNorm(hd, cfg.rms_norm_eps, name="q_norm")(q)
            k = QwenRMSNorm(hd, cfg.rms_norm_eps, name="k_norm")(k)

        q = apply_rope_1d(q, angles)
        k = apply_rope_1d(k, angles)

        # GQA: broadcast kv heads
        rep = nq // nkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)

        scale = 1.0 / np.sqrt(hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
        logits = logits + attn_mask  # (1, 1, S, S) additive causal mask
        probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
        out = out.astype(cfg.dtype).reshape(B, S, nq * hd)
        return dense(cfg.hidden_size, False, "o_proj")(out)


class QwenMLP(nn.Module):
    config: QwenConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=cfg.dtype, param_dtype=jnp.float32, name=name
        )
        gate = dense(cfg.intermediate_size, "gate_proj")(x)
        up = dense(cfg.intermediate_size, "up_proj")(x)
        return dense(cfg.hidden_size, "down_proj")(jax.nn.silu(gate) * up)


class QwenRMSNorm(nn.Module):
    dim: int
    eps: float

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        return rms_norm(x, w, self.eps)


class QwenBlock(nn.Module):
    config: QwenConfig

    @nn.compact
    def __call__(self, x, angles, attn_mask):
        cfg = self.config
        h = QwenRMSNorm(cfg.hidden_size, cfg.rms_norm_eps, name="input_layernorm")(x)
        x = x + QwenAttention(cfg, name="self_attn")(h, angles, attn_mask)
        h = QwenRMSNorm(cfg.hidden_size, cfg.rms_norm_eps, name="post_attention_layernorm")(x)
        x = x + QwenMLP(cfg, name="mlp")(h)
        return x


class QwenLM(nn.Module):
    """Decoder returning all hidden states (embeddings + each layer output)."""

    config: QwenConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, vision_embeds=None, vision_mask=None, return_normed: bool = False):
        """``vision_embeds`` (B, S, D) + boolean ``vision_mask`` (B, S):
        multimodal prompts — vision-tower outputs replace the text embedding
        at image/video placeholder positions (the HF Qwen2.5-VL
        inputs_embeds splice; reference reason1/networks/qwen2_5_vl.py).
        ``return_normed``: also return the final-RMSNormed last state (what
        an LM head consumes — used by the guard classifier)."""
        cfg = self.config
        B, S = input_ids.shape
        embed = self.param(
            "embed_tokens", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.hidden_size)
        )
        x = embed[input_ids].astype(cfg.dtype)
        if vision_embeds is not None:
            x = jnp.where(vision_mask[..., None], vision_embeds.astype(cfg.dtype), x)

        positions = jnp.arange(S)
        angles = rope_1d_angles(positions, cfg.head_dim, cfg.rope_theta)
        causal = jnp.tril(jnp.ones((S, S), dtype=bool))
        attn_mask = jnp.where(causal, 0.0, -1e30)[None, None].astype(jnp.float32)

        hidden_states = [x]
        for i in range(cfg.num_hidden_layers):
            x = QwenBlock(cfg, name=f"layers_{i}")(x, angles, attn_mask)
            hidden_states.append(x)
        # final norm is applied to the last state only (HF semantics: the
        # last entry of output_hidden_states is the pre-norm layer output;
        # Cosmos pooling uses hidden_states[1:] which are pre-final-norm).
        normed = QwenRMSNorm(cfg.hidden_size, cfg.rms_norm_eps, name="norm")(x)
        if return_normed:
            return hidden_states, normed
        return hidden_states


def mean_normalize(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """(x - mean) / (std + eps) over the last dim; std uses the unbiased
    (n-1) estimator to match torch.std (text_encoder.py:121-139)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    n = x.shape[-1]
    var = jnp.sum(jnp.square(xf - mean), axis=-1, keepdims=True) / (n - 1)
    return (xf - mean) / (jnp.sqrt(var) + eps)


def pool_hidden_states(
    hidden_states: list[jax.Array],
    strategy: str = "full_concat",
    n_layers_per_group: int = 5,
) -> jax.Array:
    """Cosmos-Reason1 embedding pooling (text_encoder.py:185-220).

    Uses hidden_states[1:] (skipping the token-embedding state), each
    mean-normalized over channels.
    """
    normalized = [mean_normalize(h) for h in hidden_states[1:]]
    if strategy == "full_concat":
        return jnp.concatenate(normalized, axis=-1)
    if strategy == "mean_pooling":
        return jnp.mean(jnp.stack(normalized), axis=0)
    if strategy == "pool_every_n_layers_and_concat":
        groups = []
        for i in range(0, len(normalized), n_layers_per_group):
            groups.append(jnp.mean(jnp.stack(normalized[i : i + n_layers_per_group]), axis=0))
        return jnp.concatenate(groups, axis=-1)
    raise ValueError(f"Invalid embedding_concat_strategy: {strategy}")


class QwenGuardLM(nn.Module):
    """Qwen LM + untied lm_head: next-token logits at the last position.

    The model backbone behind the guard prompt classifier
    (utils/guardrails.py QwenGuardClassifier) — the reference ships
    Qwen3Guard / LlamaGuard3 as separate checkpoints
    (imaginaire/auxiliary/guardrail/qwen3guard/, presets.py:28-62); here the
    same decoder architecture already in the repo serves both the reason1
    text encoder and the guard, and guard weights load through the same
    converter path with the extra ``lm_head``.
    """

    config: QwenConfig

    @nn.compact
    def __call__(self, input_ids: jax.Array, position: Optional[jax.Array] = None) -> jax.Array:
        """(B, S) ids -> (B, vocab) next-token logits.

        ``position``: scalar index of the position whose logits to read
        (default: the last). With a fixed-size id buffer and causal
        attention, tokens past ``position`` cannot influence it, so greedy
        decoding appends into the buffer and reads logits at ``cur_len-1``
        without recompiling per length.
        """
        cfg = self.config
        _, normed = QwenLM(cfg, name="model")(input_ids, return_normed=True)
        # tied checkpoints (e.g. Qwen3Guard-0.6B) fill lm_head with
        # embed_tokens^T in the converter
        lm_head = self.param(
            "lm_head", nn.initializers.normal(0.02), (cfg.hidden_size, cfg.vocab_size)
        )
        if position is None:
            h = normed[:, -1, :]
        else:
            h = jax.lax.dynamic_index_in_dim(normed, position, axis=1, keepdims=False)
        return h.astype(jnp.float32) @ lm_head.astype(jnp.float32)


def greedy_generate(
    apply_fn,
    prompt_ids: list[int],
    max_new_tokens: int = 128,
    eos_ids: tuple[int, ...] = (),
    buffer_len: int = 512,
) -> list[int]:
    """Greedy decode on a fixed-size buffer: one compiled program for the
    whole generation (``apply_fn(ids_1xS, position) -> (1, vocab)``).

    The guard models emit short verdicts ("Safety: Unsafe ... Categories:
    ..."), so full-recompute greedy over a fixed 512-token window is the
    simplest correct TPU shape — no KV-cache plumbing for a <=128-token
    answer on a 0.6B model.
    """
    ids = list(prompt_ids)[-(buffer_len - max_new_tokens):]
    start = len(ids)
    buf = np.zeros((1, buffer_len), dtype=np.int32)
    buf[0, : len(ids)] = ids
    buf = jnp.asarray(buf)
    out: list[int] = []
    for step in range(max_new_tokens):
        pos = start + step - 1
        logits = apply_fn(buf, jnp.asarray(pos, dtype=jnp.int32))
        nxt = int(jnp.argmax(logits[0]))
        out.append(nxt)
        if nxt in eos_ids or start + step >= buffer_len - 1:
            break
        buf = buf.at[0, start + step].set(nxt)
    return out
