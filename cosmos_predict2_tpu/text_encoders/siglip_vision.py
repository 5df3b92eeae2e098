"""SigLIP vision tower (so400m/patch14) — the guardrail frame embedder.

Capability parity with the reference's video-content-safety pipeline, which
embeds sampled frames with ``google/siglip-so400m-patch14-384``
(reference: imaginaire/auxiliary/guardrail/video_content_safety_filter/
model.py + presets.py:46-62) and feeds the pooled 1152-d features to the
7-class safety classifier (utils/guardrails.py:safety_classifier_apply
here). This makes the ``embed_frames`` hook first-party instead of
requiring an external model.

Architecture (HF ``SiglipVisionModel``): patch conv (+bias, no CLS token),
learned position embeddings, pre-LN transformer with gelu-tanh MLPs, final
LayerNorm, then a MAP head — a learned probe token cross-attending all
patch tokens, LayerNorm + residual MLP, returning the probe state.

TPU-first: channels-last patch embed lowered as one matmul; attention over
<=729 tokens stays as batched einsum (no flash kernel needed); fp32
softmax/LayerNorm with bf16 weights.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# SigLIP preprocessing: rescale to [-1, 1] (mean = std = 0.5)
SIGLIP_MEAN = 0.5
SIGLIP_STD = 0.5


@dataclasses.dataclass(frozen=True)
class SigLIPVisionConfig:
    """Defaults = so400m/patch14-384 (HF config)."""

    image_size: int = 384
    patch_size: int = 14
    dim: int = 1152
    mlp_dim: int = 4304
    num_heads: int = 16
    num_layers: int = 27
    norm_eps: float = 1e-6
    dtype: Any = jnp.bfloat16

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def _ln(x, w, b, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _mha(q, k, v, num_heads):
    """(B, Sq, D) x (B, Skv, D) -> (B, Sq, D); fp32 softmax."""
    B, Sq, D = q.shape
    hd = D // num_heads
    qh = q.reshape(B, Sq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = k.reshape(B, k.shape[1], num_heads, hd).transpose(0, 2, 1, 3)
    vh = v.reshape(B, v.shape[1], num_heads, hd).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32) / np.sqrt(hd)
    probs = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh, preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(B, Sq, D).astype(q.dtype)


class _Block(nn.Module):
    cfg: SigLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dt = cfg.dtype
        dense = lambda feats, name: nn.Dense(feats, dtype=dt, name=name)
        ln1_w = self.param("ln1_w", nn.initializers.ones, (cfg.dim,))
        ln1_b = self.param("ln1_b", nn.initializers.zeros, (cfg.dim,))
        h = _ln(x, ln1_w, ln1_b, cfg.norm_eps)
        q = dense(cfg.dim, "q")(h)
        k = dense(cfg.dim, "k")(h)
        v = dense(cfg.dim, "v")(h)
        x = x + dense(cfg.dim, "out")(_mha(q, k, v, cfg.num_heads))
        ln2_w = self.param("ln2_w", nn.initializers.ones, (cfg.dim,))
        ln2_b = self.param("ln2_b", nn.initializers.zeros, (cfg.dim,))
        h = _ln(x, ln2_w, ln2_b, cfg.norm_eps)
        h = dense(cfg.mlp_dim, "fc1")(h)
        h = nn.gelu(h, approximate=True)  # gelu_pytorch_tanh
        return x + dense(cfg.dim, "fc2")(h)


class SigLIPVisionTower(nn.Module):
    config: SigLIPVisionConfig = SigLIPVisionConfig()

    @nn.compact
    def __call__(self, pixels_B_H_W_C: jax.Array) -> jax.Array:
        """Normalized pixels (B, H, W, 3) -> pooled features (B, dim)."""
        cfg = self.config
        dt = cfg.dtype
        p = cfg.patch_size
        x = pixels_B_H_W_C.astype(dt)
        B, H, W, _ = x.shape
        # space-to-depth + matmul == the strided patch conv
        x = x.reshape(B, H // p, p, W // p, p, 3).transpose(0, 1, 3, 2, 4, 5).reshape(B, -1, p * p * 3)
        x = nn.Dense(cfg.dim, dtype=dt, name="patch")(x)
        pos = self.param("pos_emb", nn.initializers.normal(0.02), (cfg.num_patches, cfg.dim))
        x = x + pos.astype(dt)
        for i in range(cfg.num_layers):
            x = _Block(cfg, name=f"block_{i}")(x)
        post_w = self.param("post_ln_w", nn.initializers.ones, (cfg.dim,))
        post_b = self.param("post_ln_b", nn.initializers.zeros, (cfg.dim,))
        x = _ln(x, post_w, post_b, cfg.norm_eps)

        # MAP head: learned probe cross-attends all tokens
        probe = self.param("probe", nn.initializers.normal(0.02), (1, 1, cfg.dim))
        probe = jnp.broadcast_to(probe.astype(dt), (B, 1, cfg.dim))
        dense = lambda feats, name: nn.Dense(feats, dtype=dt, name=name)
        q = dense(cfg.dim, "head_q")(probe)
        k = dense(cfg.dim, "head_k")(x)
        v = dense(cfg.dim, "head_v")(x)
        h = dense(cfg.dim, "head_out")(_mha(q, k, v, cfg.num_heads))
        ln_w = self.param("head_ln_w", nn.initializers.ones, (cfg.dim,))
        ln_b = self.param("head_ln_b", nn.initializers.zeros, (cfg.dim,))
        res = h
        h = _ln(h, ln_w, ln_b, cfg.norm_eps)
        h = dense(cfg.mlp_dim, "head_fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = res + dense(cfg.dim, "head_fc2")(h)
        return h[:, 0].astype(jnp.float32)


def preprocess_siglip(frames_u8: np.ndarray, image_size: int = 384) -> jax.Array:
    """(N, H, W, 3) uint8 -> resized, [-1, 1] normalized (N, S, S, 3)."""
    from cosmos_predict2_tpu.utils.io import resize_frames

    resized = resize_frames(frames_u8, image_size, image_size).astype(np.float32) / 255.0
    return jnp.asarray((resized - SIGLIP_MEAN) / SIGLIP_STD)


def make_frame_embedder(params, config: SigLIPVisionConfig = SigLIPVisionConfig()):
    """Returns the ``embed_frames`` callable VideoContentSafetyFilter wants."""
    tower = SigLIPVisionTower(config)
    apply = jax.jit(lambda p, x: tower.apply(p, x))

    def embed(frames_u8: np.ndarray) -> np.ndarray:
        return np.asarray(apply(params, preprocess_siglip(frames_u8, config.image_size)))

    return embed


def convert_siglip_vision_state_dict(sd: dict, config: SigLIPVisionConfig = SigLIPVisionConfig()) -> dict:
    """HF SiglipVisionModel state_dict -> Flax params for SigLIPVisionTower."""

    def g(name):
        t = sd[name]
        return np.asarray(t.detach().cpu().float().numpy() if hasattr(t, "detach") else t)

    pre = "vision_model."
    p: dict = {}
    # patch conv (D, 3, p, p) -> dense kernel (p*p*3, D) matching the
    # space-to-depth layout (ph, pw, c) per patch
    w = g(pre + "embeddings.patch_embedding.weight")
    p["patch"] = {
        "kernel": w.transpose(2, 3, 1, 0).reshape(-1, w.shape[0]),
        "bias": g(pre + "embeddings.patch_embedding.bias"),
    }
    p["pos_emb"] = g(pre + "embeddings.position_embedding.weight")
    for i in range(config.num_layers):
        lp = f"{pre}encoder.layers.{i}."
        blk = {
            "ln1_w": g(lp + "layer_norm1.weight"),
            "ln1_b": g(lp + "layer_norm1.bias"),
            "ln2_w": g(lp + "layer_norm2.weight"),
            "ln2_b": g(lp + "layer_norm2.bias"),
        }
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"), ("out", "out_proj")):
            blk[ours] = {
                "kernel": g(f"{lp}self_attn.{theirs}.weight").T,
                "bias": g(f"{lp}self_attn.{theirs}.bias"),
            }
        blk["fc1"] = {"kernel": g(lp + "mlp.fc1.weight").T, "bias": g(lp + "mlp.fc1.bias")}
        blk["fc2"] = {"kernel": g(lp + "mlp.fc2.weight").T, "bias": g(lp + "mlp.fc2.bias")}
        p[f"block_{i}"] = blk
    p["post_ln_w"] = g(pre + "post_layernorm.weight")
    p["post_ln_b"] = g(pre + "post_layernorm.bias")
    # MAP head: torch MultiheadAttention packs qkv into in_proj
    p["probe"] = g(pre + "head.probe")
    in_w = g(pre + "head.attention.in_proj_weight")
    in_b = g(pre + "head.attention.in_proj_bias")
    d = config.dim
    for idx, name in enumerate(("head_q", "head_k", "head_v")):
        p[name] = {"kernel": in_w[idx * d : (idx + 1) * d].T, "bias": in_b[idx * d : (idx + 1) * d]}
    p["head_out"] = {
        "kernel": g(pre + "head.attention.out_proj.weight").T,
        "bias": g(pre + "head.attention.out_proj.bias"),
    }
    p["head_ln_w"] = g(pre + "head.layernorm.weight")
    p["head_ln_b"] = g(pre + "head.layernorm.bias")
    p["head_fc1"] = {"kernel": g(pre + "head.mlp.fc1.weight").T, "bias": g(pre + "head.mlp.fc1.bias")}
    p["head_fc2"] = {"kernel": g(pre + "head.mlp.fc2.weight").T, "bias": g(pre + "head.mlp.fc2.bias")}
    return {"params": p}
