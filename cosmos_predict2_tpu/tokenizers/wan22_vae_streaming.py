"""Streaming (cache-carrying) Wan2.2 VAE encode/decode with bounded memory.

Exact functional equivalent of the reference Wan2.2 feature-cache streaming
(wan2pt2.py:123-173 Resample caches, :193-209 ResidualBlock conv caches,
:711-780 chunked encode/decode): pixel chunks [1, 4, 4, ...] in, one latent
frame at a time out, each CausalConv3d carrying its last 2 input frames.

The chunk-local ops that look stateful in full-clip form are in fact
stateless per chunk:
 * AvgDown3D front-pads T to a multiple of factor_t (wan2pt2.py:307-317) —
   only the FIRST chunk (T=1) ever needs the pad; steady 4-frame chunks
   divide evenly, so the per-chunk op reproduces the full-clip op exactly.
 * DupUp3D drops factor_t-1 leading frames only when first_chunk
   (wan2pt2.py:381-383).

Shares the Flax param tree with tokenizers/wan22_vae.Wan22VAE; tested for
exact agreement with the full-clip path.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from cosmos_predict2_tpu.tokenizers.wan22_vae import (
    WAN22_LATENT_MEAN,
    WAN22_LATENT_STD,
    Wan22VAEConfig,
    avg_down_3d,
    dup_up_3d,
    patchify,
    unpatchify,
)
from cosmos_predict2_tpu.tokenizers.wan_vae import _upsample2x_conv3x3
from cosmos_predict2_tpu.tokenizers import wan_vae_streaming as _wvs
from cosmos_predict2_tpu.tokenizers.wan_vae_streaming import (
    CACHE_T,
    StreamState,
    _attn_block,
    _conv2d,
    _conv3d,
    _init_conv_cache,
    _norm,
    _stream_conv,
    _stream_resblock,
)


def _enc_dims(cfg: Wan22VAEConfig) -> list[int]:
    return [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]


def _dec_dims(cfg: Wan22VAEConfig) -> list[int]:
    mult = tuple(cfg.dim_mult)
    return [cfg.dec_dim * u for u in (mult[-1],) + mult[::-1]]


# ------------------------------- encoder -------------------------------


def init_encoder_state(cfg: Wan22VAEConfig, batch: int, height: int, width: int, dtype=None) -> StreamState:
    dtype = dtype or cfg.dtype
    dims = _enc_dims(cfg)
    h, w = height // cfg.patch_size, width // cfg.patch_size
    caches: dict[str, Any] = {}
    caches["conv1"] = _init_conv_cache(batch, h, w, 3 * cfg.patch_size**2, dtype)
    for s, (in_d, out_d) in enumerate(zip(dims[:-1], dims[1:])):
        d = in_d
        for j in range(cfg.num_res_blocks):
            caches[f"down_{s}.res_{j}.c1"] = _init_conv_cache(batch, h, w, d, dtype)
            caches[f"down_{s}.res_{j}.c2"] = _init_conv_cache(batch, h, w, out_d, dtype)
            d = out_d
        if s != len(cfg.dim_mult) - 1:
            h, w = h // 2, w // 2
            if cfg.temporal_downsample[s]:
                caches[f"down_{s}.t"] = jnp.zeros((batch, 1, h, w, out_d), dtype=dtype)
    for key in ("mid_res1", "mid_res2"):
        caches[f"{key}.c1"] = _init_conv_cache(batch, h, w, dims[-1], dtype)
        caches[f"{key}.c2"] = _init_conv_cache(batch, h, w, dims[-1], dtype)
    caches["head"] = _init_conv_cache(batch, h, w, dims[-1], dtype)
    return StreamState(caches=caches, first=True)


def encoder_chunk(cfg: Wan22VAEConfig, params, x_chunk, state: StreamState, conv_backend: str = "xla"):
    """x (B, 1 or 4k, H, W, 3) -> latents (B, k', H/16, W/16, 48)."""
    p = params["params"]
    enc = p["encoder"]
    dt = cfg.dtype
    caches = dict(state.caches)
    first = state.first
    dims = _enc_dims(cfg)

    x = patchify(x_chunk, cfg.patch_size)
    x, caches["conv1"] = _stream_conv(enc["conv1"], x, caches["conv1"], dt, conv_backend)
    for s in range(len(cfg.dim_mult)):
        sp = enc[f"down_{s}"]
        temporal = cfg.temporal_downsample[s] if s < len(cfg.temporal_downsample) else False
        down_flag = s != len(cfg.dim_mult) - 1
        # AvgDown3D shortcut across the whole stage. factor_t stays 2 even on
        # the first (T=1) chunk: avg_down's zero front-pad reproduces the
        # full-clip (0 + f0)/2 first output exactly (wan2pt2.py:307-317).
        shortcut = avg_down_3d(
            x, dims[s + 1],
            factor_t=2 if temporal else 1,
            factor_s=2 if down_flag else 1,
        )
        h = x
        for j in range(cfg.num_res_blocks):
            h = _stream_resblock(sp[f"res_{j}"], h, caches, f"down_{s}.res_{j}", dt, conv_backend)
        if down_flag:
            rp = sp["resample"]
            h = _conv2d(rp["conv"], h, stride=(2, 2), padding=((0, 1), (0, 1)), dtype=dt)
            if temporal:
                if first:
                    caches[f"down_{s}.t"] = h[:, -1:]
                else:
                    hin = jnp.concatenate([caches[f"down_{s}.t"].astype(h.dtype), h], axis=1)
                    caches[f"down_{s}.t"] = hin[:, -1:]
                    h = _conv3d(rp["time_conv"], hin, (0, 0), stride=(2, 1, 1), spatial_pad=0, dtype=dt)
        x = h + shortcut.astype(h.dtype)
    x = _stream_resblock(enc["mid_res1"], x, caches, "mid_res1", dt, conv_backend)
    x = _attn_block(enc["mid_attn"], x, dt)
    x = _stream_resblock(enc["mid_res2"], x, caches, "mid_res2", dt, conv_backend)
    y = jax.nn.silu(_norm(enc["head_norm"], x))
    y, caches["head"] = _stream_conv(enc["head_conv"], y, caches["head"], dt, conv_backend)
    out = _conv3d(p["conv1"], y, (0, 0), spatial_pad=0, dtype=dt)
    mu = out[..., : cfg.z_dim]
    mean = jnp.asarray(WAN22_LATENT_MEAN, jnp.float32)
    std = jnp.asarray(WAN22_LATENT_STD, jnp.float32)
    z = ((mu.astype(jnp.float32) - mean) / std).astype(x_chunk.dtype)
    return z, StreamState(caches=caches, first=False)


def encode_streaming(cfg: Wan22VAEConfig, params, x, chunk_frames: int = 4, conv_backend: str | None = None):
    """Full streaming encode of (B, 1+4k, H, W, 3); O(chunk) memory.

    Chunks run through cached ``jax.jit`` programs with DONATED caches —
    two compiled programs total (first + steady chunk), same design as the
    Wan2.1 streaming path."""
    assert chunk_frames % 4 == 0
    B, T, H, W, _ = x.shape
    state = init_encoder_state(cfg, B, H, W)
    outs = []
    be = _wvs._CONV_BACKEND if conv_backend is None else conv_backend
    z, caches = _jitted_chunk("enc", cfg, first=True, conv_backend=be)(params, x[:, :1], state.caches)
    outs.append(z)
    pos = 1
    steady = _jitted_chunk("enc", cfg, first=False, conv_backend=be)
    while pos < T:
        end = min(pos + chunk_frames, T)
        z, caches = steady(params, x[:, pos:end], caches)
        outs.append(z)
        pos = end
    return jnp.concatenate(outs, axis=1)


# ------------------------------- decoder -------------------------------


def init_decoder_state(cfg: Wan22VAEConfig, batch: int, latent_h: int, latent_w: int, dtype=None) -> StreamState:
    dtype = dtype or cfg.dtype
    dims = _dec_dims(cfg)
    mult = tuple(cfg.dim_mult)
    temporal_up = cfg.temporal_downsample[::-1]
    caches: dict[str, Any] = {}
    h, w = latent_h, latent_w
    caches["conv1"] = _init_conv_cache(batch, h, w, cfg.z_dim, dtype)
    for key in ("mid_res1", "mid_res2"):
        caches[f"{key}.c1"] = _init_conv_cache(batch, h, w, dims[0], dtype)
        caches[f"{key}.c2"] = _init_conv_cache(batch, h, w, dims[0], dtype)
    for s, (in_d, out_d) in enumerate(zip(dims[:-1], dims[1:])):
        d = in_d
        for j in range(cfg.num_res_blocks + 1):
            caches[f"up_{s}.res_{j}.c1"] = _init_conv_cache(batch, h, w, d, dtype)
            caches[f"up_{s}.res_{j}.c2"] = _init_conv_cache(batch, h, w, out_d, dtype)
            d = out_d
        if s != len(mult) - 1:
            if temporal_up[s] if s < len(temporal_up) else False:
                caches[f"up_{s}.t"] = jnp.zeros((batch, CACHE_T, h, w, out_d), dtype=dtype)
            h, w = h * 2, w * 2
    caches["head"] = _init_conv_cache(batch, h, w, dims[-1], dtype)
    return StreamState(caches=caches, first=True)


def decoder_chunk(cfg: Wan22VAEConfig, params, z_chunk, state: StreamState, conv_backend: str = "xla"):
    """z (B, k, h, w, 48) -> pixels; first chunk must be one latent frame."""
    p = params["params"]
    dec = p["decoder"]
    dt = cfg.dtype
    caches = dict(state.caches)
    first = state.first
    mult = tuple(cfg.dim_mult)
    dims = _dec_dims(cfg)
    temporal_up = cfg.temporal_downsample[::-1]

    mean = jnp.asarray(WAN22_LATENT_MEAN, jnp.float32)
    std = jnp.asarray(WAN22_LATENT_STD, jnp.float32)
    zin = (z_chunk.astype(jnp.float32) * std + mean).astype(dt)
    x = _conv3d(p["conv2"], zin, (0, 0), spatial_pad=0, dtype=dt)
    x, caches["conv1"] = _stream_conv(dec["conv1"], x, caches["conv1"], dt, conv_backend)
    x = _stream_resblock(dec["mid_res1"], x, caches, "mid_res1", dt, conv_backend)
    x = _attn_block(dec["mid_attn"], x, dt)
    x = _stream_resblock(dec["mid_res2"], x, caches, "mid_res2", dt, conv_backend)

    for s in range(len(mult)):
        sp = dec[f"up_{s}"]
        temporal = temporal_up[s] if s < len(temporal_up) else False
        up_flag = s != len(mult) - 1
        x_in = x
        h = x
        for j in range(cfg.num_res_blocks + 1):
            h = _stream_resblock(sp[f"res_{j}"], h, caches, f"up_{s}.res_{j}", dt, conv_backend)
        if up_flag:
            rp = sp["resample"]
            if temporal:
                B, T, Hh, Ww, C = h.shape
                if first:
                    assert T == 1, "first decode chunk must be one latent frame"
                else:
                    hin = jnp.concatenate([caches[f"up_{s}.t"].astype(h.dtype), h], axis=1)
                    caches[f"up_{s}.t"] = hin[:, -CACHE_T:]
                    zt = _conv3d(rp["time_conv"], hin, (0, 0), spatial_pad=0, dtype=dt)
                    zt = zt.reshape(B, T, Hh, Ww, 2, C)
                    h = jnp.stack([zt[..., 0, :], zt[..., 1, :]], axis=2).reshape(B, 2 * T, Hh, Ww, C)
            h = _upsample2x_conv3x3(rp["conv"]["weight"], rp["conv"]["bias"], h, dt)
            # DupUp drops its factor_t-1 leading frames only on the stream's
            # first chunk (wan2pt2.py:381-383), matching the conv path's
            # frame-0 bypass.
            shortcut = dup_up_3d(
                x_in, dims[s + 1],
                factor_t=2 if temporal else 1,
                factor_s=2, first_chunk=first,
            )
            x = h + shortcut.astype(h.dtype)
        else:
            x = h

    y = jax.nn.silu(_norm(dec["head_norm"], x))
    y, caches["head"] = _stream_conv(dec["head_conv"], y, caches["head"], dt, conv_backend)
    return unpatchify(y, cfg.patch_size), StreamState(caches=caches, first=False)


def decode_streaming(cfg: Wan22VAEConfig, params, z, chunk_latent_frames: int = 1, conv_backend: str | None = None):
    """Full streaming decode of (B, t, h, w, 48); O(chunk) memory.

    Chunks run through cached ``jax.jit`` programs with DONATED caches
    (first + steady), matching the Wan2.1 streaming design."""
    B, t, h, w, _ = z.shape
    state = init_decoder_state(cfg, B, h, w)
    outs = []
    be = _wvs._CONV_BACKEND if conv_backend is None else conv_backend
    px, caches = _jitted_chunk("dec", cfg, first=True, conv_backend=be)(params, z[:, :1], state.caches)
    outs.append(px)
    pos = 1
    steady = _jitted_chunk("dec", cfg, first=False, conv_backend=be)
    while pos < t:
        end = min(pos + chunk_latent_frames, t)
        px, caches = steady(params, z[:, pos:end], caches)
        outs.append(px)
        pos = end
    return jnp.concatenate(outs, axis=1)


# ---------------------- jit plumbing for the host loops ----------------------


_JIT_CACHE: dict[tuple, Any] = {}


def _cfg_key(cfg: Wan22VAEConfig) -> tuple:
    return (
        cfg.dim,
        cfg.dec_dim,
        cfg.z_dim,
        tuple(cfg.dim_mult),
        cfg.num_res_blocks,
        tuple(cfg.temporal_downsample),
        cfg.patch_size,
        jnp.dtype(cfg.dtype).name,
    )


def _jitted_chunk(kind: str, cfg: Wan22VAEConfig, *, first: bool, conv_backend: str | None = None):
    """Compiled (params, chunk, caches) -> (out, caches) for one stream
    chunk; ``first`` is a trace-time constant (frame-0 bypass is Python
    control flow). Donating the cache pytree lets XLA update the conv
    histories in place instead of double-buffering them. ``conv_backend``
    (default: the shared wan_vae_streaming global) is baked into the
    program + cache key, same design as the Wan2.1 path."""
    be = _wvs._CONV_BACKEND if conv_backend is None else conv_backend
    key = (kind, _cfg_key(cfg), first, be)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        base = encoder_chunk if kind == "enc" else decoder_chunk

        def flat(params, chunk, caches, _base=base, _cfg=cfg, _first=first, _be=be):
            out, st = _base(_cfg, params, chunk, StreamState(caches=caches, first=_first), conv_backend=_be)
            return out, st.caches

        fn = _JIT_CACHE[key] = jax.jit(flat, donate_argnums=(2,))
    return fn
