"""CLIP ViT-H/14 vision tower (open-clip XLM-Roberta CLIP) for Wan i2v.

Capability parity with the reference's CLIP image branch
(cosmos_predict2/_src/predict2/networks/clip.py:195-282 VisionTransformer,
:453-478 clip_xlm_roberta_vit_h_14, :503-538 CLIPModel.visual, :541-588
Wan2pt1CLIPEmb): the Wan2.1 i2v pipeline encodes the first video frame with
the visual tower of ``open-clip-xlm-roberta-large-vit-huge-14`` and feeds
the 257-token hidden state (cls + 16x16 patches, 1280-d) into the WanModel's
dedicated image cross-attention branch (networks/wan_dit.py here).

TPU-first design notes
----------------------
* Channels-last patch embedding (a strided conv == one big matmul after
  space-to-depth; XLA lowers it onto the MXU directly).
* Attention over 257 tokens is a single batched matmul pair — no flash
  kernel needed; softmax in fp32.
* ``use_31_block`` semantics from the reference (clip.py:277-279): the Wan
  conditioning path runs only the first 31 of 32 transformer blocks and
  returns the raw hidden state (no final LayerNorm, no projection head).
  That is the default here (``run_head=False``).
* The text branch (XLM-Roberta) is intentionally NOT implemented: the
  Cosmos/Wan inference path only ever calls ``.visual`` (clip.py:529-538).
  Text conditioning is umT5 (text_encoders/t5.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# OpenAI CLIP normalization constants (reference clip.py:438-439).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """ViT-H/14 visual tower (reference clip.py:453-478 defaults)."""

    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: float = 4.0
    num_heads: int = 16
    num_layers: int = 32
    out_dim: int = 1024  # projection head width (unused on the Wan path)
    pre_norm: bool = True
    norm_eps: float = 1e-5
    dtype: Any = jnp.bfloat16

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def _layer_norm(x: jax.Array, eps: float, w: jax.Array, b: jax.Array) -> jax.Array:
    """fp32 LayerNorm cast back to input dtype (reference clip.py:44-46)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * w.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


class _CLIPBlock(nn.Module):
    """Pre-LN transformer block, GELU MLP (reference clip.py:101-144 with
    post_norm=False, activation='gelu' as in the ViT-H/14 config)."""

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        D, H = cfg.dim, cfg.num_heads
        hd = D // H

        ln1_w = self.param("ln1_w", nn.initializers.ones, (D,))
        ln1_b = self.param("ln1_b", nn.initializers.zeros, (D,))
        h = _layer_norm(x, cfg.norm_eps, ln1_w, ln1_b)
        qkv = nn.Dense(3 * D, dtype=cfg.dtype, name="to_qkv")(h)
        B, S, _ = qkv.shape
        q, k, v = jnp.split(qkv.reshape(B, S, 3, H, hd), 3, axis=2)
        q, k, v = q.squeeze(2), k.squeeze(2), v.squeeze(2)  # (B, S, H, hd)
        # 257 tokens: plain attention, fp32 softmax.
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32) / np.sqrt(hd)
        probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        o = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, S, D)
        x = x + nn.Dense(D, dtype=cfg.dtype, name="attn_proj")(o)

        ln2_w = self.param("ln2_w", nn.initializers.ones, (D,))
        ln2_b = self.param("ln2_b", nn.initializers.zeros, (D,))
        h = _layer_norm(x, cfg.norm_eps, ln2_w, ln2_b)
        h = nn.Dense(int(D * cfg.mlp_ratio), dtype=cfg.dtype, name="mlp_fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(D, dtype=cfg.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPVisionTower(nn.Module):
    """The ``visual`` sub-model of XLMRobertaCLIP (reference clip.py:195-282).

    Input: normalized pixels (B, H, W, 3) channels-last.
    Output (default, ``run_head=False``): hidden state after the first
    ``num_layers - 1`` blocks, shape (B, 1 + num_patches, dim) — the
    ``use_31_block=True`` path the Wan conditioner uses (clip.py:537).
    With ``run_head=True``: pooled + projected embedding (B, out_dim).
    """

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels_B_H_W_C: jax.Array, run_head: bool = False) -> jax.Array:
        cfg = self.cfg
        B = pixels_B_H_W_C.shape[0]
        p = cfg.patch_size
        # Strided conv patch embedding; bias disabled under pre_norm
        # (reference clip.py:233 ``bias=not pre_norm``).
        x = nn.Conv(
            cfg.dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            use_bias=not cfg.pre_norm,
            dtype=cfg.dtype,
            name="patch_embedding",
        )(pixels_B_H_W_C.astype(cfg.dtype))
        x = x.reshape(B, -1, cfg.dim)  # (B, gh*gw, D) row-major == torch flatten(2)

        gain = 1.0 / np.sqrt(cfg.dim)
        cls = self.param("cls_embedding", nn.initializers.normal(gain), (1, 1, cfg.dim))
        pos = self.param(
            "pos_embedding", nn.initializers.normal(gain), (1, cfg.num_patches + 1, cfg.dim)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(cfg.dtype), (B, 1, cfg.dim)), x], axis=1)
        x = x + pos.astype(cfg.dtype)

        if cfg.pre_norm:
            w = self.param("pre_norm_w", nn.initializers.ones, (cfg.dim,))
            b = self.param("pre_norm_b", nn.initializers.zeros, (cfg.dim,))
            x = _layer_norm(x, cfg.norm_eps, w, b)

        n_blocks = cfg.num_layers if run_head else cfg.num_layers - 1
        for i in range(n_blocks):
            x = _CLIPBlock(cfg, name=f"block_{i}")(x)

        if not run_head:
            return x

        w = self.param("post_norm_w", nn.initializers.ones, (cfg.dim,))
        b = self.param("post_norm_b", nn.initializers.zeros, (cfg.dim,))
        x = _layer_norm(x, cfg.norm_eps, w, b)
        head = self.param("head", nn.initializers.normal(gain), (cfg.dim, cfg.out_dim))
        return (x[:, 0].astype(jnp.float32) @ head.astype(jnp.float32))


def preprocess_clip(frames_pm1: jax.Array, image_size: int = 224) -> jax.Array:
    """[-1, 1] frames (B, H, W, 3) -> CLIP-normalized (B, 224, 224, 3).

    Mirrors CLIPModel.visual's preprocessing (reference clip.py:529-533):
    bicubic resize to the model resolution, then (x*0.5+0.5 - mean)/std.
    (jax.image cubic uses the Keys kernel a=-0.5 vs torch's a=-0.75; the
    sub-pixel difference is far below the conditioning signal level.)
    """
    B, H, W, C = frames_pm1.shape
    x = frames_pm1.astype(jnp.float32)
    if (H, W) != (image_size, image_size):
        x = jax.image.resize(x, (B, image_size, image_size, C), method="cubic")
    x = x * 0.5 + 0.5
    return (x - CLIP_MEAN) / CLIP_STD


def encode_first_frame(
    tower: CLIPVisionTower, params, video_pm1_B_T_H_W_C: jax.Array
) -> jax.Array:
    """Wan i2v conditioning: CLIP-encode frame 0 -> (B, 257, 1280)
    (reference clip.py:580-583)."""
    pixels = preprocess_clip(video_pm1_B_T_H_W_C[:, 0], tower.cfg.image_size)
    return tower.apply(params, pixels)


# --------------------- torch checkpoint conversion ---------------------


def convert_clip_vision_state_dict(
    state: dict, cfg: Optional[CLIPVisionConfig] = None, prefix: str = "visual."
) -> dict:
    """open-clip/Wan torch state dict (``visual.*`` keys, clip.py:195-259
    naming) -> flax params for CLIPVisionTower. Tensors may be torch or
    numpy; returns a {'params': ...} pytree of numpy arrays."""
    cfg = cfg or CLIPVisionConfig()

    def get(name):
        t = state[prefix + name]
        return np.asarray(t.float().cpu().numpy() if hasattr(t, "cpu") else t, dtype=np.float32)

    p: dict = {}
    # torch conv (D, 3, p, p) -> flax (p, p, 3, D)
    p["patch_embedding"] = {"kernel": get("patch_embedding.weight").transpose(2, 3, 1, 0)}
    if not cfg.pre_norm:
        p["patch_embedding"]["bias"] = get("patch_embedding.bias")
    p["cls_embedding"] = get("cls_embedding")
    p["pos_embedding"] = get("pos_embedding")
    if cfg.pre_norm:
        p["pre_norm_w"] = get("pre_norm.weight")
        p["pre_norm_b"] = get("pre_norm.bias")
    for i in range(cfg.num_layers - 1):  # use_31_block: last block never runs
        t = f"transformer.{i}."
        p[f"block_{i}"] = {
            "ln1_w": get(t + "norm1.weight"),
            "ln1_b": get(t + "norm1.bias"),
            "to_qkv": {"kernel": get(t + "attn.to_qkv.weight").T, "bias": get(t + "attn.to_qkv.bias")},
            "attn_proj": {"kernel": get(t + "attn.proj.weight").T, "bias": get(t + "attn.proj.bias")},
            "ln2_w": get(t + "norm2.weight"),
            "ln2_b": get(t + "norm2.bias"),
            "mlp_fc1": {"kernel": get(t + "mlp.0.weight").T, "bias": get(t + "mlp.0.bias")},
            "mlp_fc2": {"kernel": get(t + "mlp.2.weight").T, "bias": get(t + "mlp.2.bias")},
        }
    return {"params": p}
