"""Wan2.2 causal video VAE in Flax (the newer tokenizer variant).

Architecture parity with the reference Wan2.2 VAE
(cosmos_predict2/_src/predict2/tokenizers/wan2pt2.py): relative to Wan2.1 —
* the input is 2x2 spatially patchified first (3 -> 12 channels,
  :255-285), so total compression is 4x temporal / 16x spatial;
* encoder dim 160, decoder dim 256, z_dim 48 (:683-690);
* each down/up stage is a residual MACRO block: the conv path (res blocks
  + resample) plus an average-pool (AvgDown3D, :289-338) or
  repeat-upsample (DupUp3D, :342-384) shortcut across the whole stage;
* per-channel latent stats are 48-wide (:878+).

Built from the same primitives as tokenizers/wan_vae.py (causal convs with
the frame-0 bypass semantics of the streaming reference); the DupUp
shortcut drops its first factor_t-1 frames on the stream's first chunk,
which in full-clip form means the shortcut output is trimmed at the front.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cosmos_predict2_tpu.tokenizers.wan_vae import (
    AttentionBlock,
    CausalConv3d,
    ChannelRMSNorm,
    Resample,
    ResidualBlock,
)

WAN22_LATENT_MEAN = np.array([
    -0.2289, -0.0052, -0.1323, -0.2339, -0.2799, 0.0174, 0.1838, 0.1557,
    -0.1382, 0.0542, 0.2813, 0.0891, 0.157, -0.0098, 0.0375, -0.1825,
    -0.2246, -0.1207, -0.0698, 0.5109, 0.2665, -0.2108, -0.2158, 0.2502,
    -0.2055, -0.0322, 0.1109, 0.1567, -0.0729, 0.0899, -0.2799, -0.123,
    -0.0313, -0.1649, 0.0117, 0.0723, -0.2839, -0.2083, -0.052, 0.3748,
    0.0152, 0.1957, 0.1433, -0.2944, 0.3573, -0.0548, -0.1681, -0.0667,
], dtype=np.float32)
WAN22_LATENT_STD = np.array([
    0.4765, 1.0364, 0.4514, 1.1677, 0.5313, 0.499, 0.4818, 0.5013,
    0.8158, 1.0344, 0.5894, 1.0901, 0.6885, 0.6165, 0.8454, 0.4978,
    0.5759, 0.3523, 0.7135, 0.6804, 0.5833, 1.4146, 0.8986, 0.5659,
    0.7069, 0.5338, 0.4889, 0.4917, 0.4069, 0.4999, 0.6866, 0.4093,
    0.5709, 0.6065, 0.6415, 0.4944, 0.5726, 1.2042, 0.5458, 1.6887,
    0.3971, 1.06, 0.3943, 0.5537, 0.5444, 0.4089, 0.7468, 0.7744,
], dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class Wan22VAEConfig:
    dim: int = 160
    dec_dim: int = 256
    z_dim: int = 48
    dim_mult: tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: tuple[bool, ...] = (False, True, True)
    patch_size: int = 2
    dtype: jnp.dtype = jnp.bfloat16

    @property
    def spatial_compression(self) -> int:
        return 8 * self.patch_size  # conv 8x * patchify 2x = 16x

    @property
    def temporal_compression(self) -> int:
        return 4


def patchify(x: jax.Array, p: int) -> jax.Array:
    """(B, T, H, W, C) -> (B, T, H/p, W/p, C*p*p) with torch '(c r q)' channel
    order: out channel k = c*p*p + r*p + q (q = h-sub, r = w-sub)."""
    B, T, H, W, C = x.shape
    x = x.reshape(B, T, H // p, p, W // p, p, C)  # (.., hq=3, .., wr=5, c=6)
    x = x.transpose(0, 1, 2, 4, 6, 5, 3)  # b t h w c r q
    return x.reshape(B, T, H // p, W // p, C * p * p)


def unpatchify(x: jax.Array, p: int) -> jax.Array:
    B, T, H, W, K = x.shape
    C = K // (p * p)
    x = x.reshape(B, T, H, W, C, p, p)  # b t h w c r q
    x = x.transpose(0, 1, 2, 6, 3, 5, 4)  # b t h q w r c
    return x.reshape(B, T, H * p, W * p, C)


def avg_down_3d(x: jax.Array, out_channels: int, factor_t: int, factor_s: int) -> jax.Array:
    """AvgDown3D (wan2pt2.py:289-338): front-pad T to a multiple of factor_t,
    space-to-channel fold, then mean over channel groups. Channels-last."""
    B, T, H, W, C = x.shape
    pad_t = (-T) % factor_t
    if pad_t:
        x = jnp.concatenate([jnp.zeros((B, pad_t, H, W, C), x.dtype), x], axis=1)
        T = T + pad_t
    factor = factor_t * factor_s * factor_s
    x = x.reshape(B, T // factor_t, factor_t, H // factor_s, factor_s, W // factor_s, factor_s, C)
    # torch channel order: (C, ft, fh, fw) c-major -> channels-last tail (c, ft, fh, fw)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)  # b t h w c ft fh fw
    x = x.reshape(B, T // factor_t, H // factor_s, W // factor_s, C * factor)
    group = C * factor // out_channels
    x = x.reshape(x.shape[:-1] + (out_channels, group))
    return jnp.mean(x, axis=-1)


def dup_up_3d(x: jax.Array, out_channels: int, factor_t: int, factor_s: int, first_chunk: bool) -> jax.Array:
    """DupUp3D (wan2pt2.py:342-384): channel repeat then channel-to-space
    unfold; drops the first factor_t-1 frames for the stream's first chunk."""
    B, T, H, W, C = x.shape
    factor = factor_t * factor_s * factor_s
    repeats = out_channels * factor // C
    x = jnp.repeat(x, repeats, axis=-1)  # channel-interleaved like torch repeat_interleave
    x = x.reshape(B, T, H, W, out_channels, factor_t, factor_s, factor_s)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # b t ft h fh w fw c
    x = x.reshape(B, T * factor_t, H * factor_s, W * factor_s, out_channels)
    if first_chunk and factor_t > 1:
        x = x[:, factor_t - 1 :]
    return x


class DownResidualStage(nn.Module):
    """Down_ResidualBlock (wan2pt2.py:386-417)."""

    in_dim: int
    out_dim: int
    mult: int
    temporal_down: bool
    down_flag: bool
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x):
        shortcut = avg_down_3d(
            x, self.out_dim, factor_t=2 if self.temporal_down else 1, factor_s=2 if self.down_flag else 1
        )
        h = x
        d = self.in_dim
        for i in range(self.mult):
            h = ResidualBlock(d, self.out_dim, dtype=self.dtype, name=f"res_{i}")(h)
            d = self.out_dim
        if self.down_flag:
            mode = "downsample3d" if self.temporal_down else "downsample2d"
            h = Resample(self.out_dim, mode, dtype=self.dtype, name="resample")(h)
        return h + shortcut.astype(h.dtype)


class UpResidualStage(nn.Module):
    """Up_ResidualBlock (wan2pt2.py:419-455)."""

    in_dim: int
    out_dim: int
    mult: int
    temporal_up: bool
    up_flag: bool
    dtype: jnp.dtype
    first_chunk: bool = True  # full-clip mode == stream starting at frame 0

    @nn.compact
    def __call__(self, x):
        h = x
        d = self.in_dim
        for i in range(self.mult):
            h = ResidualBlock(d, self.out_dim, dtype=self.dtype, name=f"res_{i}")(h)
            d = self.out_dim
        if self.up_flag:
            mode = "upsample3d" if self.temporal_up else "upsample2d"
            # Wan2.2 Resample keeps channel width (up_out_dim = out_dim)
            h = Resample(self.out_dim, mode, dtype=self.dtype, up_out_dim=self.out_dim, name="resample")(h)
            shortcut = dup_up_3d(
                x, self.out_dim, factor_t=2 if self.temporal_up else 1, factor_s=2,
                first_chunk=self.first_chunk,
            )
            return h + shortcut.astype(h.dtype)
        return h


class Wan22Encoder(nn.Module):
    config: Wan22VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        dt = cfg.dtype
        x = patchify(x, cfg.patch_size)
        dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
        x = CausalConv3d(dims[0], dtype=dt, name="conv1")(x)
        for i, (in_d, out_d) in enumerate(zip(dims[:-1], dims[1:])):
            x = DownResidualStage(
                in_d, out_d, cfg.num_res_blocks,
                temporal_down=cfg.temporal_downsample[i] if i < len(cfg.temporal_downsample) else False,
                down_flag=i != len(cfg.dim_mult) - 1,
                dtype=dt, name=f"down_{i}",
            )(x)
        x = ResidualBlock(dims[-1], dims[-1], dtype=dt, name="mid_res1")(x)
        x = AttentionBlock(dims[-1], dtype=dt, name="mid_attn")(x)
        x = ResidualBlock(dims[-1], dims[-1], dtype=dt, name="mid_res2")(x)
        x = ChannelRMSNorm(dims[-1], name="head_norm")(x)
        x = jax.nn.silu(x)
        x = CausalConv3d(2 * cfg.z_dim, dtype=dt, name="head_conv")(x)
        return x


class Wan22Decoder(nn.Module):
    config: Wan22VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        dt = cfg.dtype
        mult = tuple(cfg.dim_mult)
        dims = [cfg.dec_dim * u for u in (mult[-1],) + mult[::-1]]
        temporal_up = cfg.temporal_downsample[::-1]
        x = CausalConv3d(dims[0], dtype=dt, name="conv1")(z)
        x = ResidualBlock(dims[0], dims[0], dtype=dt, name="mid_res1")(x)
        x = AttentionBlock(dims[0], dtype=dt, name="mid_attn")(x)
        x = ResidualBlock(dims[0], dims[0], dtype=dt, name="mid_res2")(x)
        for i, (in_d, out_d) in enumerate(zip(dims[:-1], dims[1:])):
            x = UpResidualStage(
                in_d, out_d, cfg.num_res_blocks + 1,
                temporal_up=temporal_up[i] if i < len(temporal_up) else False,
                up_flag=i != len(mult) - 1,
                dtype=dt, name=f"up_{i}",
            )(x)
        x = ChannelRMSNorm(dims[-1], name="head_norm")(x)
        x = jax.nn.silu(x)
        x = CausalConv3d(12, dtype=dt, name="head_conv")(x)
        return unpatchify(x, cfg.patch_size)


class Wan22VAE(nn.Module):
    """encode: (B, T, H, W, 3) -> (B, 1+(T-1)/4, H/16, W/16, 48)."""

    config: Wan22VAEConfig = Wan22VAEConfig()

    def setup(self):
        cfg = self.config
        self.encoder = Wan22Encoder(cfg, name="encoder")
        self.decoder = Wan22Decoder(cfg, name="decoder")
        self.conv1 = CausalConv3d(2 * cfg.z_dim, (1, 1, 1), pad=(0, 0, 0), dtype=cfg.dtype, name="conv1")
        self.conv2 = CausalConv3d(cfg.z_dim, (1, 1, 1), pad=(0, 0, 0), dtype=cfg.dtype, name="conv2")

    def encode(self, x):
        out = self.conv1(self.encoder(x))
        mu = out[..., : self.config.z_dim]
        mean = jnp.asarray(WAN22_LATENT_MEAN, jnp.float32)
        std = jnp.asarray(WAN22_LATENT_STD, jnp.float32)
        return ((mu.astype(jnp.float32) - mean) / std).astype(x.dtype)

    def decode(self, z):
        mean = jnp.asarray(WAN22_LATENT_MEAN, jnp.float32)
        std = jnp.asarray(WAN22_LATENT_STD, jnp.float32)
        z = (z.astype(jnp.float32) * std + mean).astype(self.config.dtype)
        return self.decoder(self.conv2(z))

    def __call__(self, x):
        z = self.encode(x)
        return self.decode(z), z
