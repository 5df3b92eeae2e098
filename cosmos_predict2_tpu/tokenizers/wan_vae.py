"""Wan2.1-style causal 3D-conv video VAE, rebuilt for TPU in JAX.

Capability parity with the reference WanVAE
(cosmos_predict2/_src/predict2/tokenizers/wan2pt1.py:44-1060): 8x spatial /
4x temporal compression, 16 latent channels, per-channel latent
normalization, and the 1 + 4k frame mapping (latent frames =
1 + (pixel_frames - 1) // 4).

TPU-first redesign: the reference implements temporal causality with an
imperative frame-cache streamed chunk-by-chunk (wan2pt1.py:504-592). The
cache is just causal padding carried across chunk boundaries, so here the
whole clip is processed in one shot with causally-padded convolutions —
large static-shape convs that XLA tiles straight onto the MXU. The
first-frame special cases of the streaming code are preserved exactly:

* encoder ``downsample3d`` (wan2pt1.py:151-162): pixel frame 0 bypasses the
  stride-2 temporal conv; output j>=1 convolves input frames
  (2j-2, 2j-1, 2j)  =>  concat([x[:1], valid_conv_stride2(x)]).
* decoder ``upsample3d`` (wan2pt1.py:117-144): latent frame 0 bypasses the
  temporal doubling conv (1 output frame); frames j>=1 produce 2 frames
  from a causal conv over (x~_{j-2}, x~_{j-1}, x_j) where x~_0 = 0 (the
  "Rep" zero-replication of the streaming cache).

Layout: channels-last (B, T, H, W, C) throughout — the natural TPU conv
layout. Weight import from the torch checkpoint transposes OIDHW -> DHWIO.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cosmos_predict2_tpu.ops.normalization import channel_l2_norm

# Per-channel latent statistics hardcoded in the reference (wan2pt1.py:726-762).
WAN_LATENT_MEAN = np.array(
    [-0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
     0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921],
    dtype=np.float32,
)
WAN_LATENT_STD = np.array(
    [2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
     3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160],
    dtype=np.float32,
)


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: tuple[bool, ...] = (False, True, True)
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def spatial_compression(self) -> int:
        return 8

    @property
    def temporal_compression(self) -> int:
        return 4


class CausalConv3d(nn.Module):
    """3D conv, temporally causal: pads 2*pad_t zeros at the clip start."""

    features: int
    kernel: tuple[int, int, int] = (3, 3, 3)
    stride: tuple[int, int, int] = (1, 1, 1)
    pad: tuple[int, int, int] = (1, 1, 1)  # (t, h, w); t pad applied 2x at front
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # x: (B, T, H, W, C)
        kt, kh, kw = self.kernel
        w = self.param("weight", nn.initializers.lecun_normal(), (kt, kh, kw, x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        pt, ph, pw = self.pad
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            w.astype(self.dtype),
            window_strides=self.stride,
            padding=((2 * pt, 0), (ph, ph), (pw, pw)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=self.dtype,
        )
        return out + b.astype(self.dtype)


class SpatialConv(nn.Module):
    """Per-frame 2D conv applied over (B*T, H, W, C)."""

    features: int
    kernel: tuple[int, int] = (3, 3)
    stride: tuple[int, int] = (1, 1)
    padding: Sequence[tuple[int, int]] = ((1, 1), (1, 1))
    dtype: jnp.dtype = jnp.bfloat16
    # apply the conv to a nearest-2x upsample of the input via the fused
    # 4-phase form (same params/semantics as upsample -> conv, 4/9 the MACs)
    fused_upsample: bool = False

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C)
        kh, kw = self.kernel
        w = self.param("weight", nn.initializers.lecun_normal(), (kh, kw, x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.fused_upsample:
            assert (kh, kw) == (3, 3) and self.stride == (1, 1)
            return _upsample2x_conv3x3(w, b, x, self.dtype)
        bsz, t = x.shape[0], x.shape[1]
        xf = x.reshape((bsz * t,) + x.shape[2:]).astype(self.dtype)
        out = jax.lax.conv_general_dilated(
            xf,
            w.astype(self.dtype),
            window_strides=self.stride,
            padding=tuple(self.padding),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype,
        )
        out = out + b.astype(self.dtype)
        return out.reshape((bsz, t) + out.shape[1:])


class ChannelRMSNorm(nn.Module):
    """Wan RMS_norm: L2 normalize over channels * sqrt(C) * gamma."""

    dim: int

    @nn.compact
    def __call__(self, x):  # channels last
        gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
        return channel_l2_norm(x, gamma, axis=-1)


class ResidualBlock(nn.Module):
    """norm->SiLU->conv3 -> norm->SiLU->conv3 + shortcut (wan2pt1.py:188-223)."""

    in_dim: int
    out_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = x
        if self.in_dim != self.out_dim:
            h = CausalConv3d(self.out_dim, (1, 1, 1), pad=(0, 0, 0), dtype=self.dtype, name="shortcut")(x)
        y = ChannelRMSNorm(self.in_dim, name="norm1")(x)
        y = jax.nn.silu(y)
        y = CausalConv3d(self.out_dim, dtype=self.dtype, name="conv1")(y)
        y = ChannelRMSNorm(self.out_dim, name="norm2")(y)
        y = jax.nn.silu(y)
        y = CausalConv3d(self.out_dim, dtype=self.dtype, name="conv2")(y)
        return y + h


class AttentionBlock(nn.Module):
    """Single-head per-frame spatial self-attention (wan2pt1.py:226-262)."""

    dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C)
        B, T, H, W, C = x.shape
        identity = x
        y = ChannelRMSNorm(self.dim, name="norm")(x)
        qkv = SpatialConv(3 * C, (1, 1), padding=((0, 0), (0, 0)), dtype=self.dtype, name="to_qkv")(y)
        qkv = qkv.reshape(B * T, H * W, 3 * C)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        scale = 1.0 / np.sqrt(C)
        logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
        out = out.astype(x.dtype).reshape(B, T, H, W, C)
        out = SpatialConv(C, (1, 1), padding=((0, 0), (0, 0)), dtype=self.dtype, name="proj")(out)
        return out + identity


def _nearest_upsample2x(x):
    """nearest-exact 2x spatial upsample on (B, T, H, W, C)."""
    B, T, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None, :], (B, T, H, 2, W, 2, C))
    return x.reshape(B, T, 2 * H, 2 * W, C)


def _upsample2x_conv3x3(w, b, x, dtype):
    """3x3 conv of a nearest-2x upsample, without materializing the upsample.

    Exactly ``conv3x3(pad=1, _nearest_upsample2x(x))``: around output pixel
    (2i+di, 2j+dj) the 3x3 window reads at most a 2x2 patch of SOURCE
    pixels (nearest duplication collapses adjacent taps pairwise), so the
    op decomposes into four 2x2 phase convolutions + a pixel interleave —
    4/9 the MACs and no 4x-sized intermediate in HBM. This is the decoder's
    dominant conv (it runs at the upsampled resolution in the reference:
    wan2pt1.py:89-116 Resample = Upsample(nearest) + Conv2d(3x3)).

    w: (3, 3, Cin, Cout) HWIO; x: (B, T, H, W, Cin).
    """
    B, T, H, W_, C = x.shape
    wf = w.astype(jnp.float32)  # tap sums in fp32, cast once
    xf = x.reshape(B * T, H, W_, C).astype(dtype)
    # row phase di: output row 2i+di reads source rows {i-1+di, i+di}
    rows = {0: jnp.stack([wf[0], wf[1] + wf[2]]), 1: jnp.stack([wf[0] + wf[1], wf[2]])}
    Co = w.shape[-1]
    interleaved_rows = []
    for di in (0, 1):
        wr = rows[di]  # (2, 3, Cin, Cout)
        cols = []
        for dj in (0, 1):
            if dj == 0:
                k = jnp.stack([wr[:, 0], wr[:, 1] + wr[:, 2]], axis=1)
            else:
                k = jnp.stack([wr[:, 0] + wr[:, 1], wr[:, 2]], axis=1)
            cols.append(
                jax.lax.conv_general_dilated(
                    xf, k.astype(dtype), (1, 1), ((1 - di, di), (1 - dj, dj)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=dtype,
                )
            )
        # column interleave is a pure concat + reshape (dj lands next to
        # channels in memory — no transpose, cheap for XLA to fuse)
        z = jnp.concatenate(cols, axis=-1).reshape(B * T, H, 2 * W_, Co)
        interleaved_rows.append(z)
    # row interleave likewise: stack on a new axis right after H + reshape
    y = jnp.stack(interleaved_rows, axis=2).reshape(B, T, 2 * H, 2 * W_, Co)
    return y + b.astype(dtype)


class Resample(nn.Module):
    """Spatial (and optionally temporal) up/down sampling (wan2pt1.py:89-162).

    Wan2.1 halves channels on upsample (conv dim -> dim//2); Wan2.2 keeps
    them (wan2pt2.py:104-114) — controlled by ``up_out_dim``.
    """

    dim: int
    mode: str  # none|upsample2d|upsample3d|downsample2d|downsample3d
    dtype: jnp.dtype = jnp.bfloat16
    up_out_dim: Optional[int] = None  # default dim // 2 (Wan2.1)

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, C)
        mode = self.mode
        if mode == "upsample3d":
            # temporal doubling: frame 0 bypasses; frames j>=1 -> 2 frames via
            # causal conv over (x~_{j-2}, x~_{j-1}, x_j) with x~_0 = 0.
            B, T, H, W, C = x.shape
            time_conv = CausalConv3d(2 * self.dim, (3, 1, 1), pad=(1, 0, 0), dtype=self.dtype, name="time_conv")
            if T > 1:
                xz = jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, 1:]], axis=1)
                z = time_conv(xz)
                z = z[:, 1:]  # outputs for input frames 1..T-1, channels 2C
                # torch output layout (b, 2c, t, ...) reshaped to (b,2,c,t,..):
                # channels 0..C-1 = even output frame, C..2C-1 = odd frame.
                z = z.reshape(B, T - 1, H, W, 2, C)
                inter = jnp.stack([z[..., 0, :], z[..., 1, :]], axis=2)  # (B, T-1, 2, H, W, C)
                inter = inter.reshape(B, 2 * (T - 1), H, W, C)
                x = jnp.concatenate([x[:, :1], inter], axis=1)
            elif self.is_initializing():
                # single frame bypasses the temporal conv ("Rep" case);
                # materialize its params at INIT ONLY so checkpoints load
                # identically for image batches — no dead compute in the
                # applied graph (safe under nn.remat/scan).
                _ = time_conv(x[:, :, :1, :1, :])
        if mode in ("upsample2d", "upsample3d"):
            out_dim = self.up_out_dim if self.up_out_dim is not None else self.dim // 2
            x = SpatialConv(out_dim, dtype=self.dtype, fused_upsample=True, name="conv")(x)
            return x
        if mode in ("downsample2d", "downsample3d"):
            # ZeroPad2d((0,1,0,1)): pad right and bottom by 1, stride-2 conv
            x = SpatialConv(
                self.dim, stride=(2, 2), padding=((0, 1), (0, 1)), dtype=self.dtype, name="conv"
            )(x)
            if mode == "downsample3d":
                B, T, H, W, C = x.shape
                time_conv = CausalConv3d(
                    self.dim, (3, 1, 1), stride=(2, 1, 1), pad=(0, 0, 0), dtype=self.dtype, name="time_conv"
                )
                if T > 1:
                    # frame 0 bypass; stride-2 valid conv over remaining frames:
                    # output j>=1 sees input frames (2j-2, 2j-1, 2j).
                    z = time_conv(x)
                    x = jnp.concatenate([x[:, :1], z], axis=1)
                elif self.is_initializing():
                    # image batches (T==1) bypass the temporal conv; touch it
                    # at INIT ONLY so the param tree (and checkpoint layout)
                    # is identical for image and video batches.
                    _ = time_conv(jnp.concatenate([x[:, :, :1, :1, :]] * 3, axis=1))
            return x
        if mode == "none":
            return x
        raise ValueError(f"unknown resample mode {mode}")


class Encoder3d(nn.Module):
    """wan2pt1.py:264-360. Outputs 2*z_dim channels (mu, logvar)."""

    config: WanVAEConfig

    @nn.compact
    def __call__(self, x):  # (B, T, H, W, 3)
        cfg = self.config
        dt = cfg.dtype
        dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
        x = CausalConv3d(dims[0], dtype=dt, name="conv1")(x)
        li = 0
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            for _ in range(cfg.num_res_blocks):
                x = ResidualBlock(in_dim, out_dim, dtype=dt, name=f"down_{li}")(x)
                in_dim = out_dim
                li += 1
            if i != len(cfg.dim_mult) - 1:
                mode = "downsample3d" if cfg.temporal_downsample[i] else "downsample2d"
                x = Resample(out_dim, mode, dtype=dt, name=f"down_{li}")(x)
                li += 1
        x = ResidualBlock(dims[-1], dims[-1], dtype=dt, name="mid_res1")(x)
        x = AttentionBlock(dims[-1], dtype=dt, name="mid_attn")(x)
        x = ResidualBlock(dims[-1], dims[-1], dtype=dt, name="mid_res2")(x)
        x = ChannelRMSNorm(dims[-1], name="head_norm")(x)
        x = jax.nn.silu(x)
        x = CausalConv3d(2 * cfg.z_dim, dtype=dt, name="head_conv")(x)
        return x


class Decoder3d(nn.Module):
    """wan2pt1.py:362-460."""

    config: WanVAEConfig

    @nn.compact
    def __call__(self, z):  # (B, T, H, W, z_dim)
        cfg = self.config
        dt = cfg.dtype
        mult = tuple(cfg.dim_mult)
        dims = [cfg.dim * u for u in (mult[-1],) + mult[::-1]]
        temporal_upsample = cfg.temporal_downsample[::-1]
        x = CausalConv3d(dims[0], dtype=dt, name="conv1")(z)
        x = ResidualBlock(dims[0], dims[0], dtype=dt, name="mid_res1")(x)
        x = AttentionBlock(dims[0], dtype=dt, name="mid_attn")(x)
        x = ResidualBlock(dims[0], dims[0], dtype=dt, name="mid_res2")(x)
        li = 0
        for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
            if i in (1, 2, 3):
                in_dim = in_dim // 2
            for _ in range(cfg.num_res_blocks + 1):
                x = ResidualBlock(in_dim, out_dim, dtype=dt, name=f"up_{li}")(x)
                in_dim = out_dim
                li += 1
            if i != len(mult) - 1:
                mode = "upsample3d" if temporal_upsample[i] else "upsample2d"
                x = Resample(out_dim, mode, dtype=dt, name=f"up_{li}")(x)
                li += 1
        x = ChannelRMSNorm(dims[-1], name="head_norm")(x)
        x = jax.nn.silu(x)
        x = CausalConv3d(3, dtype=dt, name="head_conv")(x)
        return x


class WanVAE(nn.Module):
    """Full VAE with the outer 1x1 convs and latent normalization.

    encode: (B, T, H, W, 3) pixels in [-1, 1] -> (B, t, h, w, 16) normalized
    latents, t = 1 + (T-1)//4. decode: inverse.
    """

    config: WanVAEConfig = WanVAEConfig()

    def setup(self):
        self.encoder = Encoder3d(self.config, name="encoder")
        self.decoder = Decoder3d(self.config, name="decoder")
        self.conv1 = CausalConv3d(2 * self.config.z_dim, (1, 1, 1), pad=(0, 0, 0), dtype=self.config.dtype, name="conv1")
        self.conv2 = CausalConv3d(self.config.z_dim, (1, 1, 1), pad=(0, 0, 0), dtype=self.config.dtype, name="conv2")

    def encode(self, x):
        out = self.encoder(x)
        out = self.conv1(out)
        mu = out[..., : self.config.z_dim]
        mean = jnp.asarray(WAN_LATENT_MEAN, dtype=jnp.float32)
        std = jnp.asarray(WAN_LATENT_STD, dtype=jnp.float32)
        return ((mu.astype(jnp.float32) - mean) / std).astype(x.dtype)

    def decode(self, z):
        mean = jnp.asarray(WAN_LATENT_MEAN, dtype=jnp.float32)
        std = jnp.asarray(WAN_LATENT_STD, dtype=jnp.float32)
        z = (z.astype(jnp.float32) * std + mean).astype(z.dtype)
        z = self.conv2(z)
        return self.decoder(z)

    def __call__(self, x):
        """encode -> decode round trip (for init/testing)."""
        z = self.encode(x)
        return self.decode(z), z


# Streaming (bounded-memory) encode/decode lives in wan_vae_streaming.py:
# exact cache-carrying chunked processing equivalent to the reference's
# feature-cache streaming (wan2pt1.py:504-592).
