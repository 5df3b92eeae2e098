"""XLM-Roberta-Large text encoder (Wan2.1 i2v CLIP text tower) in Flax.

Architecture parity with the reference
(cosmos_predict2/_src/predict2/networks/xlm_roberta.py:87-160 XLMRoberta,
clip.py:285-307 XLMRobertaWithHead): post-norm transformer encoder with
learned positions computed from the non-pad cumulative sum (the HF
XLM-R position scheme), type-0 embeddings, additive pad mask; the Wan
i2v head mean-pools non-pad tokens and projects through
Linear->GELU->Linear (bias-free) to the CLIP joint space.

Inference path (the only use in Cosmos: Wan i2v text conditioning), so
dropout is omitted. One jit, static lengths, fp32 norms.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class XLMRobertaConfig:
    vocab_size: int = 250002
    max_seq_len: int = 514
    type_size: int = 1
    pad_id: int = 1
    dim: int = 1024
    num_heads: int = 16
    num_layers: int = 24
    post_norm: bool = True
    eps: float = 1e-5
    out_dim: int = 1024  # head projection (CLIP joint dim)
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def large(cls) -> "XLMRobertaConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "XLMRobertaConfig":
        return cls(vocab_size=64, max_seq_len=32, dim=32, num_heads=4, num_layers=2, out_dim=16)


class _LayerNorm(nn.Module):
    dim: int
    eps: float

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        return ((xf - mean) * jax.lax.rsqrt(var + self.eps) * w + b).astype(x.dtype)


class _SelfAttention(nn.Module):
    config: XLMRobertaConfig

    @nn.compact
    def __call__(self, x, mask_add):
        cfg = self.config
        B, S, C = x.shape
        n, d = cfg.num_heads, cfg.dim // cfg.num_heads
        dense = lambda name: nn.Dense(cfg.dim, dtype=cfg.dtype, param_dtype=jnp.float32, name=name)
        q = dense("q")(x).reshape(B, S, n, d)
        k = dense("k")(x).reshape(B, S, n, d)
        v = dense("v")(x).reshape(B, S, n, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) / np.sqrt(d)
        logits = logits + mask_add  # (B, 1, 1, S) additive pad mask
        probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
        return dense("o")(out.astype(cfg.dtype).reshape(B, S, C))


class _Block(nn.Module):
    config: XLMRobertaConfig

    @nn.compact
    def __call__(self, x, mask_add):
        cfg = self.config
        attn = _SelfAttention(cfg, name="attn")
        norm1 = _LayerNorm(cfg.dim, cfg.eps, name="norm1")
        norm2 = _LayerNorm(cfg.dim, cfg.eps, name="norm2")

        def ffn(h):
            h = nn.Dense(cfg.dim * 4, dtype=cfg.dtype, param_dtype=jnp.float32, name="ffn_0")(h)
            h = jax.nn.gelu(h, approximate=False)
            return nn.Dense(cfg.dim, dtype=cfg.dtype, param_dtype=jnp.float32, name="ffn_2")(h)

        if cfg.post_norm:
            x = norm1(x + attn(x, mask_add))
            x = norm2(x + ffn(x))
        else:
            x = x + attn(norm1(x), mask_add)
            x = x + ffn(norm2(x))
        return x


class XLMRoberta(nn.Module):
    """Encoder returning final hidden states (B, S, dim)."""

    config: XLMRobertaConfig

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        cfg = self.config
        B, S = ids.shape
        mask = (ids != cfg.pad_id).astype(jnp.int32)

        tok = self.param("token_embedding", nn.initializers.normal(0.02), (cfg.vocab_size, cfg.dim))
        typ = self.param("type_embedding", nn.initializers.normal(0.02), (cfg.type_size, cfg.dim))
        pos = self.param("pos_embedding", nn.initializers.normal(0.02), (cfg.max_seq_len, cfg.dim))

        positions = cfg.pad_id + jnp.cumsum(mask, axis=1) * mask
        x = tok[ids] + typ[jnp.zeros_like(ids)] + pos[positions]
        x = x.astype(cfg.dtype)

        norm = _LayerNorm(cfg.dim, cfg.eps, name="norm")
        if cfg.post_norm:
            x = norm(x)

        mask_add = jnp.where(mask[:, None, None, :] > 0, 0.0, -jnp.inf).astype(jnp.float32)
        for i in range(cfg.num_layers):
            x = _Block(cfg, name=f"blocks_{i}")(x, mask_add)

        if not cfg.post_norm:
            x = norm(x)
        return x


class XLMRobertaWithHead(nn.Module):
    """XLM-R + mean-pool + bias-free MLP head (clip.py:285-307)."""

    config: XLMRobertaConfig

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        cfg = self.config
        x = XLMRoberta(cfg, name="backbone")(ids)
        mask = (ids != cfg.pad_id).astype(x.dtype)[..., None]
        pooled = jnp.sum(x * mask, axis=1) / jnp.sum(mask, axis=1)
        mid = (cfg.dim + cfg.out_dim) // 2
        h = nn.Dense(mid, use_bias=False, dtype=cfg.dtype, param_dtype=jnp.float32, name="head_0")(pooled)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(cfg.out_dim, use_bias=False, dtype=cfg.dtype, param_dtype=jnp.float32, name="head_2")(h)


def convert_xlm_roberta_state_dict(sd, num_layers: int, with_head: bool = False) -> dict:
    """torch XLMRoberta(/WithHead) state dict -> flax params."""

    def a(name):
        t = sd[name]
        return np.asarray(t.float().cpu().numpy() if hasattr(t, "cpu") else t, dtype=np.float32)

    def lin(name):
        return {"kernel": a(f"{name}.weight").T, "bias": a(f"{name}.bias")}

    def ln(name):
        return {"weight": a(f"{name}.weight"), "bias": a(f"{name}.bias")}

    p: dict = {
        "token_embedding": a("token_embedding.weight"),
        "type_embedding": a("type_embedding.weight"),
        "pos_embedding": a("pos_embedding.weight"),
        "norm": ln("norm"),
    }
    for i in range(num_layers):
        b = f"blocks.{i}"
        p[f"blocks_{i}"] = {
            "attn": {
                "q": lin(f"{b}.attn.q"),
                "k": lin(f"{b}.attn.k"),
                "v": lin(f"{b}.attn.v"),
                "o": lin(f"{b}.attn.o"),
            },
            "norm1": ln(f"{b}.norm1"),
            "norm2": ln(f"{b}.norm2"),
            "ffn_0": lin(f"{b}.ffn.0"),
            "ffn_2": lin(f"{b}.ffn.2"),
        }
    if not with_head:
        return {"params": p}
    return {
        "params": {
            "backbone": p,
            "head_0": {"kernel": a("head.0.weight").T},
            "head_2": {"kernel": a("head.2.weight").T},
        }
    }
