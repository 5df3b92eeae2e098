"""Qwen2.5-VL vision tower in Flax (video/image prompts for Cosmos-Reason1).

Architecture parity with the reference reason1 vision encoder
(cosmos_predict2/_src/reason1/networks/qwen2_5_vl.py vision tower, which is
the Qwen2.5-VL ViT): Conv3d patch embed over (2, 14, 14) patches, 2D
rotary embeddings over the merge-reordered (h, w) grid, window attention
(112px windows) with full-attention blocks at fullatt_block_indexes, RMSNorm
+ SwiGLU blocks (biased qkv/proj and MLP), and the 2x2 patch merger MLP
projecting to the LLM width.

TPU design: grid_thw is host metadata, so the window permutation, rotary
tables, and attention segment ids are all precomputed in NumPy; attention
uses segment-id masking (block-diagonal over windows / images) — one jit
per grid shape, no ragged kernels.
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
class QwenVisionConfig:
    hidden_size: int = 1280
    out_hidden_size: int = 3584
    intermediate_size: int = 3420
    depth: int = 32
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: tuple[int, ...] = (7, 15, 23, 31)
    dtype: jnp.dtype = jnp.float32

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def tiny(cls) -> "QwenVisionConfig":
        return cls(
            hidden_size=64,
            out_hidden_size=48,
            intermediate_size=96,
            depth=4,
            num_heads=4,
            fullatt_block_indexes=(1, 3),
            window_size=56,  # 2 merged cells per window side
        )


# --------------------------- host-side metadata ---------------------------


def rot_pos_emb(cfg: QwenVisionConfig, grid_thw: np.ndarray) -> np.ndarray:
    """Per-patch (h, w) rotary angles, merge-group ordered: (S, head_dim//2)."""
    m = cfg.spatial_merge_size
    dim = cfg.head_dim // 2
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    pos_ids = []
    for t, h, w in grid_thw:
        hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
        hpos = hpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))
        wpos = wpos.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)
        pos_ids.append(np.tile(np.stack([hpos, wpos], axis=-1), (t, 1)))
    pos_ids = np.concatenate(pos_ids, axis=0)  # (S, 2)
    max_grid = int(np.max(grid_thw[:, 1:]))
    table = np.outer(np.arange(max_grid, dtype=np.float64), inv_freq)  # (max, dim//2)
    return table[pos_ids].reshape(pos_ids.shape[0], -1).astype(np.float32)  # (S, dim)


def get_window_index(cfg: QwenVisionConfig, grid_thw: np.ndarray):
    """Window permutation of merged cells + per-window/full segment ids.

    Returns (window_index (S/m^2,), seg_window (S,), seg_full (S,)) where
    seg arrays label each *permuted* patch with its attention segment.
    """
    m = cfg.spatial_merge_size
    unit = m * m
    vit_win = cfg.window_size // m // cfg.patch_size
    window_index = []
    window_seqlens = []
    full_seqlens = []
    idx0 = 0
    for t, h, w in grid_thw:
        lh, lw = h // m, w // m
        index = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = (-lh) % vit_win
        pad_w = (-lw) % vit_win
        nwh, nww = (lh + pad_h) // vit_win, (lw + pad_w) // vit_win
        padded = np.full((t, lh + pad_h, lw + pad_w), -100, dtype=np.int64)
        padded[:, :lh, :lw] = index
        padded = padded.reshape(t, nwh, vit_win, nww, vit_win).transpose(0, 1, 3, 2, 4)
        padded = padded.reshape(t, nwh * nww, vit_win, vit_win)
        seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)
        flat = padded.reshape(-1)
        window_index.append(flat[flat != -100] + idx0)
        window_seqlens.extend((seqlens * unit).tolist())
        full_seqlens.extend([int(h * w)] * int(t))
        idx0 += int(t * lh * lw)
    window_index = np.concatenate(window_index)

    def seg_from_lens(lens):
        seg = np.concatenate([np.full(int(l), i, dtype=np.int32) for i, l in enumerate(lens) if l > 0])
        return seg

    seg_window = seg_from_lens(window_seqlens)
    seg_full = seg_from_lens(full_seqlens)  # in ORIGINAL order; permute below
    # full-attention segments refer to images; after window permutation the
    # patches stay within their image, and since each permutation only
    # reorders within an image, permuting seg_full keeps it consistent:
    patch_perm = (window_index[:, None] * unit + np.arange(unit)[None, :]).reshape(-1)
    seg_full = seg_full[patch_perm]
    return window_index, seg_window, seg_full, patch_perm


# ------------------------------- modules -------------------------------


class VisionBlock(nn.Module):
    config: QwenVisionConfig

    @nn.compact
    def __call__(self, x, cos, sin, seg):
        cfg = self.config
        S, D = x.shape
        n, hd = cfg.num_heads, cfg.head_dim

        h = rms_norm(x, self.param("norm1", nn.initializers.ones, (D,)), 1e-6)
        qkv = nn.Dense(3 * D, use_bias=True, dtype=cfg.dtype, param_dtype=jnp.float32, name="qkv")(h)
        q, k, v = [a.reshape(S, n, hd) for a in jnp.split(qkv, 3, axis=-1)]

        def rope(t):
            tf = t.astype(jnp.float32)
            t1, t2 = tf[..., : hd // 2], tf[..., hd // 2 :]
            rot = jnp.concatenate([-t2, t1], axis=-1)
            return (tf * cos[:, None, :] + rot * sin[:, None, :]).astype(t.dtype)

        q, k = rope(q), rope(k)
        scale = 1.0 / np.sqrt(hd)
        logits = jnp.einsum("qhd,khd->hqk", q, k, preferred_element_type=jnp.float32) * scale
        mask = seg[:, None] == seg[None, :]
        logits = jnp.where(mask[None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("hqk,khd->qhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).reshape(S, D)
        out = nn.Dense(D, use_bias=True, dtype=cfg.dtype, param_dtype=jnp.float32, name="proj")(out)
        x = x + out

        h = rms_norm(x, self.param("norm2", nn.initializers.ones, (D,)), 1e-6)
        gate = nn.Dense(cfg.intermediate_size, use_bias=True, dtype=cfg.dtype, param_dtype=jnp.float32, name="gate_proj")(h)
        up = nn.Dense(cfg.intermediate_size, use_bias=True, dtype=cfg.dtype, param_dtype=jnp.float32, name="up_proj")(h)
        down = nn.Dense(D, use_bias=True, dtype=cfg.dtype, param_dtype=jnp.float32, name="down_proj")(
            jax.nn.silu(gate) * up
        )
        return x + down


class QwenVisionTower(nn.Module):
    """pixel_patches: (S, C*tp*P*P) -> merged features (S/m^2, out_hidden)."""

    config: QwenVisionConfig

    @nn.compact
    def __call__(self, pixel_patches, angles, seg_window, seg_full, patch_perm, inv_perm):
        cfg = self.config
        patch_dim = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size**2
        w = self.param("patch_embed", nn.initializers.lecun_normal(), (patch_dim, cfg.hidden_size))
        x = jnp.dot(pixel_patches.astype(cfg.dtype), w.astype(cfg.dtype))

        # window permutation (patch granularity)
        x = x[patch_perm]
        ang = angles[patch_perm]
        emb = jnp.concatenate([ang, ang], axis=-1)
        cos, sin = jnp.cos(emb), jnp.sin(emb)

        for i in range(cfg.depth):
            seg = seg_full if i in cfg.fullatt_block_indexes else seg_window
            x = VisionBlock(cfg, name=f"blocks_{i}")(x, cos, sin, seg)

        # merger: RMSNorm -> group m^2 patches -> MLP -> out_hidden
        unit = cfg.spatial_merge_size**2
        x = rms_norm(x, self.param("ln_q", nn.initializers.ones, (cfg.hidden_size,)), 1e-6)
        x = x.reshape(-1, unit * cfg.hidden_size)
        x = nn.Dense(unit * cfg.hidden_size, use_bias=True, dtype=cfg.dtype, param_dtype=jnp.float32, name="mlp_0")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(cfg.out_hidden_size, use_bias=True, dtype=cfg.dtype, param_dtype=jnp.float32, name="mlp_2")(x)
        # un-permute merged cells back to original order
        return x[inv_perm]


def encode_pixels(tower: QwenVisionTower, params, pixel_patches: np.ndarray, grid_thw: np.ndarray):
    """Host wrapper: computes metadata in NumPy, runs the jitted tower."""
    cfg = tower.config
    angles = rot_pos_emb(cfg, grid_thw)
    window_index, seg_window, seg_full, patch_perm = get_window_index(cfg, grid_thw)
    inv_perm = np.argsort(window_index)
    return tower.apply(
        params,
        jnp.asarray(pixel_patches),
        jnp.asarray(angles),
        jnp.asarray(seg_window),
        jnp.asarray(seg_full),
        jnp.asarray(patch_perm),
        jnp.asarray(inv_perm),
    )


def convert_qwen_vision_hf_state_dict(sd, depth: int) -> dict:
    """HF Qwen2_5_VisionTransformerPretrainedModel state dict -> flax params."""
    t = lambda a: np.ascontiguousarray(np.transpose(np.asarray(a)))
    p: dict = {
        # Conv3d (E, C, tp, P, P) -> (C*tp*P*P, E)
        "patch_embed": t(np.asarray(sd["patch_embed.proj.weight"]).reshape(
            sd["patch_embed.proj.weight"].shape[0], -1
        )),
        "ln_q": np.asarray(sd["merger.ln_q.weight"]),
        "mlp_0": {"kernel": t(sd["merger.mlp.0.weight"]), "bias": np.asarray(sd["merger.mlp.0.bias"])},
        "mlp_2": {"kernel": t(sd["merger.mlp.2.weight"]), "bias": np.asarray(sd["merger.mlp.2.bias"])},
    }
    for i in range(depth):
        p[f"blocks_{i}"] = {
            "norm1": np.asarray(sd[f"blocks.{i}.norm1.weight"]),
            "norm2": np.asarray(sd[f"blocks.{i}.norm2.weight"]),
            "qkv": {"kernel": t(sd[f"blocks.{i}.attn.qkv.weight"]), "bias": np.asarray(sd[f"blocks.{i}.attn.qkv.bias"])},
            "proj": {"kernel": t(sd[f"blocks.{i}.attn.proj.weight"]), "bias": np.asarray(sd[f"blocks.{i}.attn.proj.bias"])},
            "gate_proj": {"kernel": t(sd[f"blocks.{i}.mlp.gate_proj.weight"]), "bias": np.asarray(sd[f"blocks.{i}.mlp.gate_proj.bias"])},
            "up_proj": {"kernel": t(sd[f"blocks.{i}.mlp.up_proj.weight"]), "bias": np.asarray(sd[f"blocks.{i}.mlp.up_proj.bias"])},
            "down_proj": {"kernel": t(sd[f"blocks.{i}.mlp.down_proj.weight"]), "bias": np.asarray(sd[f"blocks.{i}.mlp.down_proj.bias"])},
        }
    return {"params": p}
