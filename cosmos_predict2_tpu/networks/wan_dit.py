"""Wan2.1 diffusion backbone (t2v / i2v), rebuilt in Flax.

Architecture parity with the reference ``WanModel``
(cosmos_predict2/_src/predict2/networks/wan2pt1.py:202-960):

* patch embed: Linear over (1, 2, 2) patches (+1 padding-mask channel);
  i2v concatenates the conditional video ``y`` (mask+latents, 20ch) first.
* time path: ``sinusoidal_embedding_1d`` (cos-first, fp64 internally,
  :202-211) -> Linear/SiLU/Linear -> e_B_D; ``time_projection`` SiLU+Linear
  -> 6 modulation vectors added to a learned per-block modulation table
  (:523, randn/sqrt(dim) init).
* blocks: affine-free LayerNorm; full-dim (not per-head) q/k RMSNorm;
  INTERLEAVED RoPE (pairs (2i, 2i+1); :214-243) with the [t|h|w] half-dim
  frequency bands; cross-attention to umT5 text (through a
  Linear-GELUtanh-Linear projection) and, for i2v, a CLIP image branch
  (k_img/v_img + MLPProj, :410-496,614-643).
* head: LayerNorm + Linear with its own 2-vector modulation table.
* fp32 modulation arithmetic throughout (use_wan_fp32_strategy).

2B/14B presets mirror configs/video2world/defaults/net.py:27-56.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cosmos_predict2_tpu.ops.attention import dot_product_attention
from cosmos_predict2_tpu.ops.normalization import layer_norm, rms_norm
from cosmos_predict2_tpu.ops.rope import RopeSpec

T5_CONTEXT_TOKEN_NUMBER = 512


@dataclasses.dataclass(frozen=True)
class WanConfig:
    model_type: str = "i2v"  # "t2v" | "i2v"
    patch_size: tuple[int, int, int] = (1, 2, 2)
    text_len: int = 512
    in_dim: int = 36  # 16 latent + 20 conditional (i2v)
    dim: int = 1536
    ffn_dim: int = 8960
    freq_dim: int = 256
    text_dim: int = 4096  # umT5-xxl
    out_dim: int = 16
    num_heads: int = 12
    num_layers: int = 30
    qk_norm: bool = True
    cross_attn_norm: bool = True
    eps: float = 1e-6
    concat_padding_mask: bool = True
    clip_dim: int = 1280
    dtype: jnp.dtype = jnp.bfloat16
    atten_backend: Optional[str] = None

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


WAN_PRESETS = {
    "1.3B": WanConfig(),
    "14B": WanConfig(dim=5120, ffn_dim=13824, num_heads=40, num_layers=40),
    "test": WanConfig(dim=96, ffn_dim=192, num_heads=2, num_layers=2, dtype=jnp.float32),
}


def sinusoidal_embedding_1d(dim: int, position: jax.Array) -> jax.Array:
    half = dim // 2
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    sinusoid = position.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=1)


def wan_rope_freqs(spec: RopeSpec, T: int, H: int, W: int) -> jax.Array:
    """Half-dim angle table (T*H*W, head_dim//2): [t | h | w] bands
    (wan2pt1.py:146-196; no fps modulation, no x2 duplication)."""
    dim_h, dim_t = spec.dim_h, spec.dim_t
    mk = lambda d, theta: 1.0 / (theta ** (np.arange(0, d, 2, dtype=np.float64)[: d // 2] / d))
    h_f = jnp.asarray(mk(dim_h, 10000.0 * spec.h_extrapolation_ratio ** (dim_h / (dim_h - 2))), jnp.float32)
    w_f = jnp.asarray(mk(dim_h, 10000.0 * spec.w_extrapolation_ratio ** (dim_h / (dim_h - 2))), jnp.float32)
    t_f = jnp.asarray(mk(dim_t, 10000.0 * spec.t_extrapolation_ratio ** (dim_t / (dim_t - 2))), jnp.float32)
    ft = jnp.einsum("t,d->td", jnp.arange(T, dtype=jnp.float32), t_f)
    fh = jnp.einsum("h,d->hd", jnp.arange(H, dtype=jnp.float32), h_f)
    fw = jnp.einsum("w,d->wd", jnp.arange(W, dtype=jnp.float32), w_f)
    full = jnp.concatenate(
        [
            jnp.broadcast_to(ft[:, None, None, :], (T, H, W, ft.shape[-1])),
            jnp.broadcast_to(fh[None, :, None, :], (T, H, W, fh.shape[-1])),
            jnp.broadcast_to(fw[None, None, :, :], (T, H, W, fw.shape[-1])),
        ],
        axis=-1,
    )
    return full.reshape(T * H * W, -1)


def rope_apply_interleaved(x: jax.Array, freqs: jax.Array) -> jax.Array:
    """Interleaved RoPE: pairs (2i, 2i+1) rotate by freqs[i]
    (flash_apply_rotary_emb(interleaved=True), wan2pt1.py:241)."""
    B, S, H, D = x.shape
    cos = jnp.cos(freqs)[None, :, None, :]
    sin = jnp.sin(freqs)[None, :, None, :]
    xf = x.astype(jnp.float32).reshape(B, S, H, D // 2, 2)
    x1, x2 = xf[..., 0], xf[..., 1]
    out = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.reshape(B, S, H, D).astype(x.dtype)


class WanLinear(nn.Module):
    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(), (x.shape[-1], self.features))
        y = jnp.dot(x.astype(self.dtype), k.astype(self.dtype), preferred_element_type=self.dtype)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,)).astype(self.dtype)
        return y


class WanRMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        return rms_norm(x, w, self.eps)


class WanSelfAttention(nn.Module):
    config: WanConfig

    @nn.compact
    def __call__(self, x, freqs):
        cfg = self.config
        B, S, _ = x.shape
        n, d = cfg.num_heads, cfg.head_dim
        q = WanLinear(cfg.dim, dtype=cfg.dtype, name="q")(x)
        k = WanLinear(cfg.dim, dtype=cfg.dtype, name="k")(x)
        v = WanLinear(cfg.dim, dtype=cfg.dtype, name="v")(x)
        if cfg.qk_norm:
            q = WanRMSNorm(cfg.dim, cfg.eps, name="norm_q")(q)
            k = WanRMSNorm(cfg.dim, cfg.eps, name="norm_k")(k)
        q = rope_apply_interleaved(q.reshape(B, S, n, d), freqs)
        k = rope_apply_interleaved(k.reshape(B, S, n, d), freqs)
        v = v.reshape(B, S, n, d)
        out = dot_product_attention(q, k, v, backend=cfg.atten_backend)
        return WanLinear(cfg.dim, dtype=cfg.dtype, name="o")(out.reshape(B, S, cfg.dim))


class WanCrossAttention(nn.Module):
    config: WanConfig
    i2v: bool = False

    @nn.compact
    def __call__(self, x, context):
        cfg = self.config
        B, S, _ = x.shape
        n, d = cfg.num_heads, cfg.head_dim
        if self.i2v:
            img_len = context.shape[1] - T5_CONTEXT_TOKEN_NUMBER
            context_img, context = context[:, :img_len], context[:, img_len:]
        q = WanLinear(cfg.dim, dtype=cfg.dtype, name="q")(x)
        k = WanLinear(cfg.dim, dtype=cfg.dtype, name="k")(context)
        v = WanLinear(cfg.dim, dtype=cfg.dtype, name="v")(context)
        if cfg.qk_norm:
            q = WanRMSNorm(cfg.dim, cfg.eps, name="norm_q")(q)
            k = WanRMSNorm(cfg.dim, cfg.eps, name="norm_k")(k)
        q = q.reshape(B, S, n, d)
        out = dot_product_attention(q, k.reshape(B, -1, n, d), v.reshape(B, -1, n, d), backend="reference")
        if self.i2v:
            k_img = WanLinear(cfg.dim, dtype=cfg.dtype, name="k_img")(context_img)
            v_img = WanLinear(cfg.dim, dtype=cfg.dtype, name="v_img")(context_img)
            if cfg.qk_norm:
                k_img = WanRMSNorm(cfg.dim, cfg.eps, name="norm_k_img")(k_img)
            out_img = dot_product_attention(
                q, k_img.reshape(B, -1, n, d), v_img.reshape(B, -1, n, d), backend="reference"
            )
            out = out + out_img
        return WanLinear(cfg.dim, dtype=cfg.dtype, name="o")(out.reshape(B, S, cfg.dim))


class WanAttentionBlock(nn.Module):
    config: WanConfig

    @nn.compact
    def __call__(self, x, e0_B_6_D, freqs, context):
        cfg = self.config
        mod = self.param("modulation", nn.initializers.normal(1.0 / np.sqrt(cfg.dim)), (1, 6, cfg.dim))
        e = (mod.astype(jnp.float32) + e0_B_6_D.astype(jnp.float32))  # (B, 6, D)
        e = [e[:, i][:, None, :] for i in range(6)]  # each (B, 1, D)

        y = layer_norm(x, cfg.eps).astype(jnp.float32) * (1 + e[1]) + e[0]
        y = WanSelfAttention(cfg, name="self_attn")(y.astype(cfg.dtype), freqs)
        x = (x.astype(jnp.float32) + y.astype(jnp.float32) * e[2]).astype(x.dtype)

        norm3 = (
            lambda t: layer_norm(t, cfg.eps) * self.param("norm3_weight", nn.initializers.ones, (cfg.dim,))
            + self.param("norm3_bias", nn.initializers.zeros, (cfg.dim,))
        ) if cfg.cross_attn_norm else (lambda t: t)
        x = x + WanCrossAttention(cfg, i2v=cfg.model_type in ("i2v", "flf2v"), name="cross_attn")(
            norm3(x).astype(cfg.dtype), context
        ).astype(x.dtype)

        y = layer_norm(x, cfg.eps).astype(jnp.float32) * (1 + e[4]) + e[3]
        h = WanLinear(cfg.ffn_dim, dtype=cfg.dtype, name="ffn_0")(y.astype(cfg.dtype))
        h = jax.nn.gelu(h, approximate=True)
        y = WanLinear(cfg.dim, dtype=cfg.dtype, name="ffn_2")(h)
        x = (x.astype(jnp.float32) + y.astype(jnp.float32) * e[5]).astype(x.dtype)
        return x


class WanModel(nn.Module):
    """x: (B, C, T, H, W); timesteps: (B,); crossattn_emb: (B, 512, text_dim)."""

    config: WanConfig

    @nn.compact
    def __call__(
        self,
        x_B_C_T_H_W: jax.Array,
        timesteps_B_T: jax.Array,
        crossattn_emb: jax.Array,
        y_B_C_T_H_W: Optional[jax.Array] = None,  # i2v conditional video
        frame_cond_crossattn_emb: Optional[jax.Array] = None,  # CLIP features (B, 257, 1280)
        padding_mask: Optional[jax.Array] = None,
        fps: Optional[jax.Array] = None,
    ) -> jax.Array:
        cfg = self.config
        if timesteps_B_T.ndim == 2:
            timesteps_B_T = timesteps_B_T[:, 0]
        if y_B_C_T_H_W is not None:
            x_B_C_T_H_W = jnp.concatenate([x_B_C_T_H_W, y_B_C_T_H_W.astype(x_B_C_T_H_W.dtype)], axis=1)
        B, C, T, H, W = x_B_C_T_H_W.shape
        if cfg.concat_padding_mask:
            if padding_mask is None:
                padding_mask = jnp.zeros((B, 1, H, W), dtype=x_B_C_T_H_W.dtype)
            mask = jnp.broadcast_to(padding_mask[:, :1, None], (B, 1, T, H, W)).astype(x_B_C_T_H_W.dtype)
            x_B_C_T_H_W = jnp.concatenate([x_B_C_T_H_W, mask], axis=1)
            C += 1

        kt, kh, kw = cfg.patch_size
        x = x_B_C_T_H_W.reshape(B, C, T // kt, kt, H // kh, kh, W // kw, kw)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(B, T // kt, H // kh, W // kw, C * kt * kh * kw)
        x = WanLinear(cfg.dim, dtype=cfg.dtype, name="patch_embedding")(x)
        Tt, Hp, Wp = x.shape[1:4]
        x = x.reshape(B, Tt * Hp * Wp, cfg.dim)

        # time path (fp32)
        e = sinusoidal_embedding_1d(cfg.freq_dim, timesteps_B_T)
        e = WanLinear(cfg.dim, dtype=jnp.float32, name="time_embedding_0")(e)
        e = jax.nn.silu(e)
        e_B_D = WanLinear(cfg.dim, dtype=jnp.float32, name="time_embedding_2")(e)
        e0 = WanLinear(6 * cfg.dim, dtype=jnp.float32, name="time_projection_1")(jax.nn.silu(e_B_D))
        e0_B_6_D = e0.reshape(B, 6, cfg.dim)

        # text path
        ctx = WanLinear(cfg.dim, dtype=cfg.dtype, name="text_embedding_0")(crossattn_emb.astype(cfg.dtype))
        ctx = jax.nn.gelu(ctx, approximate=True)
        ctx = WanLinear(cfg.dim, dtype=cfg.dtype, name="text_embedding_2")(ctx)
        if cfg.model_type in ("i2v", "flf2v"):
            if frame_cond_crossattn_emb is None:
                frame_cond_crossattn_emb = jnp.zeros((B, 257, cfg.clip_dim), dtype=cfg.dtype)
            img = frame_cond_crossattn_emb.astype(jnp.float32)
            img = layer_norm(img, 1e-5) * self.param("img_emb_ln0_w", nn.initializers.ones, (cfg.clip_dim,)) + self.param(
                "img_emb_ln0_b", nn.initializers.zeros, (cfg.clip_dim,)
            )
            img = WanLinear(cfg.clip_dim, dtype=cfg.dtype, name="img_emb_1")(img)
            img = jax.nn.gelu(img, approximate=False)
            img = WanLinear(cfg.dim, dtype=cfg.dtype, name="img_emb_3")(img)
            img = layer_norm(img.astype(jnp.float32), 1e-5) * self.param(
                "img_emb_ln4_w", nn.initializers.ones, (cfg.dim,)
            ) + self.param("img_emb_ln4_b", nn.initializers.zeros, (cfg.dim,))
            ctx = jnp.concatenate([img.astype(cfg.dtype), ctx], axis=1)

        freqs = wan_rope_freqs(RopeSpec(head_dim=cfg.head_dim, enable_fps_modulation=False), Tt, Hp, Wp)

        for i in range(cfg.num_layers):
            x = WanAttentionBlock(cfg, name=f"blocks_{i}")(x, e0_B_6_D, freqs, ctx)

        # head
        mod = self.param("head_modulation", nn.initializers.normal(1.0 / np.sqrt(cfg.dim)), (1, 2, cfg.dim))
        eh = mod.astype(jnp.float32) + e_B_D[:, None, :]
        y = layer_norm(x, cfg.eps).astype(jnp.float32) * (1 + eh[:, 1][:, None]) + eh[:, 0][:, None]
        out_dim = kt * kh * kw * cfg.out_dim
        x = WanLinear(out_dim, dtype=jnp.float32, name="head")(y)

        # unpatchify: b (t h w) (kt kh kw d) -> b d (t kt) (h kh) (w kw)
        x = x.reshape(B, Tt, Hp, Wp, kt, kh, kw, cfg.out_dim)
        x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)
        return x.reshape(B, cfg.out_dim, Tt * kt, Hp * kh, Wp * kw)
