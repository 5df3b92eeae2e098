"""T5 / umT5 encoder in Flax — first-party JAX implementation of the
offline text-embedding towers.

Covers both reference checkpoints:

* T5-11B (``CosmosT5TextEncoder``, predict2/inference/get_t5_emb.py:28):
  original T5 v1.0 — ReLU feed-forward, relative attention bias shared
  from layer 0.
* umT5-XXL (the Wan path, get_umt5_emb.py): mT5/v1.1 family — gated GELU
  feed-forward, per-layer relative attention bias.

Architecture notes (match HF ``T5EncoderModel``/``UMT5EncoderModel``):
  * T5 LayerNorm is scale-only RMS (no mean subtraction, no bias),
  * attention logits are NOT scaled by 1/sqrt(d) (T5 folds the scale into
    initialization),
  * the relative position bias is bucketed (bidirectional for the
    encoder): num_buckets/2 exact small offsets + log-spaced up to
    max_distance,
  * activations accumulate in f32; weights stay in the checkpoint dtype.

The whole fixed-length (512-token) batch is one jit — padding is masked
additively in attention and zeroed in the output like the reference's
masked fill.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cosmos_predict2_tpu.ops.normalization import rms_norm


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 1024
    d_kv: int = 64
    d_ff: int = 16384
    num_layers: int = 24
    num_heads: int = 128
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6
    gated_act: bool = False  # False: ReLU wi/wo (v1.0); True: GELU wi_0/wi_1 (v1.1/umT5)
    per_layer_rel_bias: bool = False  # umT5: each layer owns a bias table
    dtype: jnp.dtype = jnp.float32

    @classmethod
    def t5_11b(cls) -> "T5Config":
        """google-t5/t5-11b encoder (the Cosmos t5_text_embeddings tower)."""
        return cls()

    @classmethod
    def umt5_xxl(cls) -> "T5Config":
        """google/umt5-xxl encoder (the Wan2.x text tower)."""
        return cls(
            vocab_size=256384,
            d_model=4096,
            d_kv=64,
            d_ff=10240,
            num_layers=24,
            num_heads=64,
            gated_act=True,
            per_layer_rel_bias=True,
        )

    @classmethod
    def tiny(cls, **kw) -> "T5Config":
        base = dict(
            vocab_size=256, d_model=64, d_kv=16, d_ff=128, num_layers=2, num_heads=4
        )
        base.update(kw)
        return cls(**base)


def relative_position_buckets(
    qlen: int, klen: int, num_buckets: int, max_distance: int
) -> np.ndarray:
    """Bidirectional T5 bucket ids, (qlen, klen) int32 (HF
    T5Attention._relative_position_bucket semantics)."""
    ctx = np.arange(qlen, dtype=np.int64)[:, None]
    mem = np.arange(klen, dtype=np.int64)[None, :]
    rel = mem - ctx  # relative position of key wrt query
    nb = num_buckets // 2
    out = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    large = max_exact + (
        np.log(np.maximum(rel, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    out += np.where(is_small, rel, large)
    return out.astype(np.int32)


class T5Attention(nn.Module):
    config: T5Config
    has_rel_bias: bool

    @nn.compact
    def __call__(self, x, pos_bias, attn_mask):
        cfg = self.config
        B, S, _ = x.shape
        H, D = cfg.num_heads, cfg.d_kv
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=cfg.dtype, param_dtype=jnp.float32, name=name
        )
        q = dense(H * D, "q")(x).reshape(B, S, H, D)
        k = dense(H * D, "k")(x).reshape(B, S, H, D)
        v = dense(H * D, "v")(x).reshape(B, S, H, D)
        if self.has_rel_bias:
            table = self.param(
                "relative_attention_bias",
                nn.initializers.normal(1.0),
                (cfg.relative_attention_num_buckets, H),
            )
            buckets = relative_position_buckets(
                S, S, cfg.relative_attention_num_buckets, cfg.relative_attention_max_distance
            )
            pos_bias = jnp.transpose(table[jnp.asarray(buckets)], (2, 0, 1))[None]  # (1,H,S,S)
        # T5: no 1/sqrt(d) scaling
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits + pos_bias.astype(jnp.float32) + attn_mask
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
        out = out.astype(cfg.dtype).reshape(B, S, H * D)
        return dense(cfg.d_model, "o")(out), pos_bias


class T5FFN(nn.Module):
    config: T5Config

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=cfg.dtype, param_dtype=jnp.float32, name=name
        )
        if cfg.gated_act:
            gate = nn.gelu(dense(cfg.d_ff, "wi_0")(x), approximate=True)
            h = gate * dense(cfg.d_ff, "wi_1")(x)
        else:
            h = jax.nn.relu(dense(cfg.d_ff, "wi")(x))
        return dense(cfg.d_model, "wo")(h)


class T5Norm(nn.Module):
    dim: int
    eps: float

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        return rms_norm(x, w, self.eps)


class T5Encoder(nn.Module):
    """input_ids (B, S) + attention_mask (B, S) -> last hidden state
    (B, S, d_model) with padding positions zeroed (reference masked-fill,
    get_t5_emb.py)."""

    config: T5Config

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        cfg = self.config
        embed = self.param(
            "embed_tokens", nn.initializers.normal(1.0), (cfg.vocab_size, cfg.d_model)
        )
        x = embed[input_ids].astype(cfg.dtype)
        mask = attention_mask.astype(jnp.float32)
        attn_mask = ((1.0 - mask) * -1e9)[:, None, None, :]  # (B,1,1,S)

        pos_bias = None
        for i in range(cfg.num_layers):
            has_bias = cfg.per_layer_rel_bias or i == 0
            h = T5Norm(cfg.d_model, cfg.layer_norm_epsilon, name=f"ln_attn_{i}")(x)
            a, new_bias = T5Attention(cfg, has_rel_bias=has_bias, name=f"attn_{i}")(
                h, pos_bias if pos_bias is not None else jnp.zeros((), jnp.float32), attn_mask
            )
            if has_bias:
                pos_bias = new_bias
            x = x + a
            h = T5Norm(cfg.d_model, cfg.layer_norm_epsilon, name=f"ln_ffn_{i}")(x)
            x = x + T5FFN(cfg, name=f"ffn_{i}")(h)
        x = T5Norm(cfg.d_model, cfg.layer_norm_epsilon, name="final_norm")(x)
        return x.astype(jnp.float32) * mask[..., None]


# ------------------------------ converter ------------------------------


def convert_t5_hf_state_dict(sd, num_layers: int) -> dict:
    """HF T5EncoderModel / UMT5EncoderModel state dict -> flax params."""

    def g(name):
        t = sd[name]
        return np.asarray(t.detach().cpu().float().numpy() if hasattr(t, "detach") else t)

    def lin(name):
        return {"kernel": np.ascontiguousarray(np.transpose(g(name + ".weight")))}

    for emb_key in ("shared.weight", "encoder.embed_tokens.weight"):
        if emb_key in sd:
            p: dict = {"embed_tokens": g(emb_key)}
            break
    else:
        raise KeyError("no token embedding in state dict")

    gated = any(".wi_0." in k for k in sd)
    for i in range(num_layers):
        lp = f"encoder.block.{i}.layer"
        attn = {
            "q": lin(f"{lp}.0.SelfAttention.q"),
            "k": lin(f"{lp}.0.SelfAttention.k"),
            "v": lin(f"{lp}.0.SelfAttention.v"),
            "o": lin(f"{lp}.0.SelfAttention.o"),
        }
        bias_key = f"{lp}.0.SelfAttention.relative_attention_bias.weight"
        if bias_key in sd:
            attn["relative_attention_bias"] = g(bias_key)
        p[f"attn_{i}"] = attn
        p[f"ln_attn_{i}"] = {"weight": g(f"{lp}.0.layer_norm.weight")}
        if gated:
            p[f"ffn_{i}"] = {
                "wi_0": lin(f"{lp}.1.DenseReluDense.wi_0"),
                "wi_1": lin(f"{lp}.1.DenseReluDense.wi_1"),
                "wo": lin(f"{lp}.1.DenseReluDense.wo"),
            }
        else:
            p[f"ffn_{i}"] = {
                "wi": lin(f"{lp}.1.DenseReluDense.wi"),
                "wo": lin(f"{lp}.1.DenseReluDense.wo"),
            }
        p[f"ln_ffn_{i}"] = {"weight": g(f"{lp}.1.layer_norm.weight")}
    p["final_norm"] = {"weight": g("encoder.final_layer_norm.weight")}
    return {"params": p}
