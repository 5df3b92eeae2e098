"""Streaming (cache-carrying) Wan VAE encode/decode with bounded memory.

Exact functional equivalent of the reference's feature-cache streaming
(wan2pt1.py:504-592: encode in pixel chunks [1, 4, 4, ...], decode one
latent frame at a time, each CausalConv3d carrying its last 2 input frames
across chunks, stride-2 temporal downsample carrying 1 frame, temporal
upsample carrying 2 "Rep"-substituted frames).

Here the cache is an explicit pytree threaded through pure functions that
read the same Flax param tree as tokenizers/wan_vae.WanVAE, so the
full-clip and streaming paths share weights and are tested for exact
agreement. Steady-state chunks all have the same shapes => exactly two
compiled programs (first chunk + steady chunk) per direction, and memory
is O(chunk) regardless of clip length.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from cosmos_predict2_tpu.ops import conv3d as pallas_conv3d
from cosmos_predict2_tpu.ops.normalization import channel_l2_norm
from cosmos_predict2_tpu.tokenizers.wan_vae import (
    WAN_LATENT_MEAN,
    WAN_LATENT_STD,
    WanVAEConfig,
    _upsample2x_conv3x3,
)

CACHE_T = 2

# Backend for the hot 3x3x3 causal convs (the bulk of decode FLOPs):
#   "auto"      — Pallas implicit-GEMM kernel (ops/conv3d.py) on TPU when the
#                 shape qualifies, XLA conv otherwise,
#   "xla"       — always the XLA conv,
#   "interpret" — Pallas kernel in interpreter mode (CPU parity tests).
#
# Measured on chip (docs/PERF.md "VAE" section): the Pallas kernel is the
# fastest steady chunk (551 vs 672 ms taps / 700 ms XLA). One interaction
# to know about: async D2H pulls serialize against the program that
# PRODUCES the transferred buffer when that program contains a
# pallas_call — the overlapped `out="host"` route therefore quantizes to
# uint8 in a separate tiny program (see decode_streaming) so the kernel's
# win survives the spool (16.0 s whole-clip vs 17.6 s taps / 25.0 s XLA).
_CONV_BACKEND = "auto"
# Below this channel count the kernel's pad-to-128 lanes waste more MACs
# than its layout win recovers (e.g. encoder conv1 Cin=3, decoder head
# Cout=3); those convs stay on XLA. Tests lower this to cover the Pallas
# path at toy widths.
_PALLAS_MIN_CH = 64


def set_conv_backend(mode: str) -> None:
    """Set the process-default conv backend. Per-call overrides: the
    ``conv_backend`` kwarg on encode_streaming/decode_streaming — the
    backend is resolved ONCE per call and threaded explicitly through the
    chunk programs, so concurrent encodes/decodes never observe each
    other's routing."""
    assert mode in ("auto", "xla", "taps", "kfold", "ring", "ptap", "interpret", "ring_interpret"), mode
    global _CONV_BACKEND
    _CONV_BACKEND = mode


def _use_xla_taps_conv(xin, w, backend: str) -> bool:
    """Pure-XLA tap-sum lowering (kt*9 shifted GEMMs) for the causal 3x3x3
    convs — explicit opt-in via backend="taps". Stays on the XLA conv for
    thin channels (the GEMM K dim would waste the MXU) and under a multi-
    device mesh (each shifted slice would need its own GSPMD halo exchange
    — 27 of them vs the conv's one)."""
    if backend != "taps" or w.shape[:3] != (3, 3, 3):
        return False
    if min(xin.shape[-1], w.shape[-1]) < _PALLAS_MIN_CH:
        return False
    return jax.sharding.get_abstract_mesh().size == 1


def _use_pallas_conv(xin, w, backend: str) -> bool:
    if backend in ("xla", "taps") or w.shape[:3] != (3, 3, 3):
        return False
    B, _, _, W, cin = xin.shape
    if B != 1 or W % 8 or min(cin, w.shape[-1]) < _PALLAS_MIN_CH:
        return False
    # The pallas_call has no GSPMD partitioning rule: under an ambient
    # multi-device mesh (the spatially-sharded decode) it would force the
    # full pixel grid onto every chip. Sharded decodes stay on the XLA
    # conv, whose halo exchanges GSPMD inserts automatically.
    if jax.sharding.get_abstract_mesh().size > 1:
        return False
    return backend in ("interpret", "ring_interpret") or jax.default_backend() == "tpu"


# ----------------------------- primitive ops -----------------------------


def _conv3d(p, x, t_pad: tuple[int, int], stride=(1, 1, 1), spatial_pad=1, dtype=jnp.bfloat16):
    w = p["weight"].astype(dtype)
    sp = spatial_pad
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), w,
        window_strides=stride,
        padding=(t_pad, (sp, sp), (sp, sp)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=dtype,
    )
    return out + p["bias"].astype(dtype)


def _conv2d(p, x, stride=(1, 1), padding=((1, 1), (1, 1)), dtype=jnp.bfloat16):
    B, T = x.shape[:2]
    xf = x.reshape((B * T,) + x.shape[2:]).astype(dtype)
    out = jax.lax.conv_general_dilated(
        xf, p["weight"].astype(dtype),
        window_strides=stride, padding=tuple(padding),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dtype,
    )
    out = out + p["bias"].astype(dtype)
    return out.reshape((B, T) + out.shape[1:])


def _norm(p, x):
    return channel_l2_norm(x, p["gamma"], axis=-1)


def _stream_conv(p, x, cache, dtype, backend: str = "xla"):
    """Causal k_t=3 conv with a 2-frame input cache (zeros at stream start)."""
    xin = jnp.concatenate([cache.astype(x.dtype), x], axis=1)
    if _use_xla_taps_conv(xin, p["weight"], backend):
        out = pallas_conv3d.conv3d_causal_taps_xla(
            xin.astype(dtype), p["weight"].astype(dtype), p["bias"], kt=3, out_dtype=dtype
        )
    elif _use_pallas_conv(xin, p["weight"], backend):
        # "kfold" = the K-folded kernel ((dt,dh) taps in the GEMM K dim);
        # "auto"/"ring"/"ring_interpret" = the frame-ring kernel (each
        # input frame-band DMA'd once per band, not kt times — the r5
        # answer to the input-DMA bound, chip-measured in vae_bench
        # convcmp); "interpret" = the per-tap kernel in interpreter mode.
        if backend == "kfold":
            kernel = pallas_conv3d.conv3d_causal_folded
        elif backend in ("auto", "ring", "ring_interpret"):
            kernel = pallas_conv3d.conv3d_causal_ring
        else:  # "ptap" (explicit per-tap kernel) / "interpret"
            kernel = pallas_conv3d.conv3d_causal_taps
        out = kernel(
            xin.astype(dtype),
            p["weight"].astype(dtype),
            p["bias"],
            kt=3,
            out_dtype=dtype,
            interpret=backend in ("interpret", "ring_interpret"),
        )
    else:
        out = _conv3d(p, xin, (0, 0), dtype=dtype)
    return out, xin[:, -CACHE_T:]


def _init_conv_cache(batch, h, w, c, dtype):
    return jnp.zeros((batch, CACHE_T, h, w, c), dtype=dtype)


# ----------------------------- res / attn -----------------------------


def _stream_resblock(p, x, caches: dict, key: str, dtype, backend: str = "xla"):
    h = x
    if "shortcut" in p:
        h = _conv3d(p["shortcut"], x, (0, 0), spatial_pad=0, dtype=dtype)
    y = jax.nn.silu(_norm(p["norm1"], x))
    y, caches[f"{key}.c1"] = _stream_conv(p["conv1"], y, caches[f"{key}.c1"], dtype, backend)
    y = jax.nn.silu(_norm(p["norm2"], y))
    y, caches[f"{key}.c2"] = _stream_conv(p["conv2"], y, caches[f"{key}.c2"], dtype, backend)
    return y + h


def _attn_block(p, x, dtype):
    B, T, H, W, C = x.shape
    y = _norm(p["norm"], x)
    qkv = _conv2d(p["to_qkv"], y, padding=((0, 0), (0, 0)), dtype=dtype).reshape(B * T, H * W, 3 * C)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    logits = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32) / (C**0.5)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bqk,bkc->bqc", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    out = out.astype(x.dtype).reshape(B, T, H, W, C)
    return x + _conv2d(p["proj"], out, padding=((0, 0), (0, 0)), dtype=dtype)


# ------------------------------- encoder -------------------------------


@dataclasses.dataclass
class StreamState:
    caches: dict[str, Any]
    first: bool  # is the next chunk the stream's first?


def init_encoder_state(cfg: WanVAEConfig, batch: int, height: int, width: int, dtype=jnp.bfloat16) -> StreamState:
    d = cfg.dim
    dims = [d * u for u in (1,) + tuple(cfg.dim_mult)]
    caches: dict[str, Any] = {}
    h, w = height, width
    caches["conv1"] = _init_conv_cache(batch, h, w, 3, dtype)
    li = 0
    for s, (i_d, o_d) in enumerate(zip(dims[:-1], dims[1:])):
        in_d = i_d
        for _ in range(cfg.num_res_blocks):
            caches[f"down_{li}.c1"] = _init_conv_cache(batch, h, w, in_d, dtype)
            caches[f"down_{li}.c2"] = _init_conv_cache(batch, h, w, o_d, dtype)
            in_d = o_d
            li += 1
        if s != len(cfg.dim_mult) - 1:
            h, w = h // 2, w // 2
            if cfg.temporal_downsample[s]:
                caches[f"down_{li}.t"] = jnp.zeros((batch, 1, h, w, o_d), dtype=dtype)
            li += 1
    for key, c in (("mid_res1", dims[-1]), ("mid_res2", dims[-1])):
        caches[f"{key}.c1"] = _init_conv_cache(batch, h, w, c, dtype)
        caches[f"{key}.c2"] = _init_conv_cache(batch, h, w, c, dtype)
    caches["head"] = _init_conv_cache(batch, h, w, dims[-1], dtype)
    return StreamState(caches=caches, first=True)


def encoder_chunk(cfg: WanVAEConfig, params, x_chunk, state: StreamState, conv_backend: str = "xla"):
    """One encode chunk: x (B, 1 or 4k, H, W, 3) -> latents (B, k', h, w, 16)."""
    p = params["params"]
    enc = p["encoder"]
    dt = cfg.dtype
    caches = dict(state.caches)
    first = state.first
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]

    x, caches["conv1"] = _stream_conv(enc["conv1"], x_chunk, caches["conv1"], dt, conv_backend)
    li = 0
    for s in range(len(cfg.dim_mult)):
        for _ in range(cfg.num_res_blocks):
            x = _stream_resblock(enc[f"down_{li}"], x, caches, f"down_{li}", dt, conv_backend)
            li += 1
        if s != len(cfg.dim_mult) - 1:
            rp = enc[f"down_{li}"]
            x = _conv2d(rp["conv"], x, stride=(2, 2), padding=((0, 1), (0, 1)), dtype=dt)
            if cfg.temporal_downsample[s]:
                if first:
                    # frame-0 bypass: cache the single frame, no downsample
                    caches[f"down_{li}.t"] = x[:, -1:]
                else:
                    xin = jnp.concatenate([caches[f"down_{li}.t"].astype(x.dtype), x], axis=1)
                    caches[f"down_{li}.t"] = xin[:, -1:]
                    x = _conv3d(rp["time_conv"], xin, (0, 0), stride=(2, 1, 1), spatial_pad=0, dtype=dt)
            li += 1
    x = _stream_resblock(enc["mid_res1"], x, caches, "mid_res1", dt, conv_backend)
    x = _attn_block(enc["mid_attn"], x, dt)
    x = _stream_resblock(enc["mid_res2"], x, caches, "mid_res2", dt, conv_backend)
    y = jax.nn.silu(_norm(enc["head_norm"], x))
    y, caches["head"] = _stream_conv(enc["head_conv"], y, caches["head"], dt, conv_backend)
    out = _conv3d(p["conv1"], y, (0, 0), spatial_pad=0, dtype=dt)
    mu = out[..., : cfg.z_dim]
    mean = jnp.asarray(WAN_LATENT_MEAN, dtype=jnp.float32)
    std = jnp.asarray(WAN_LATENT_STD, dtype=jnp.float32)
    z = ((mu.astype(jnp.float32) - mean) / std).astype(x_chunk.dtype)
    return z, StreamState(caches=caches, first=False)


def encode_streaming(
    vae_cfg: WanVAEConfig, params, x, chunk_frames: int = 4, conv_backend: str | None = None,
    pixel_format: str = "float",
):
    """Full streaming encode of (B, 1+4k, H, W, 3); O(chunk) memory.

    Chunks run through a cached ``jax.jit`` of :func:`encoder_chunk`:
    the first chunk and the steady-state chunk each compile once, every
    later chunk reuses the compiled program (same shapes).

    ``pixel_format="uint8"`` takes ``x`` as raw uint8 pixels and fuses the
    uint8 -> [-1, 1] normalize into the compiled chunk program — the input
    clip stays uint8 end-to-end (93f 704x1280 is 0.25 GB as uint8 vs
    0.5 GB as bf16 plus a full-clip normalize/transpose pass), mirroring
    the decode side's device-side quantization.
    """
    assert chunk_frames % 4 == 0
    assert pixel_format in ("float", "uint8"), pixel_format
    from_u8 = pixel_format == "uint8"
    if from_u8:
        assert x.dtype == jnp.uint8, x.dtype
    else:
        # loud failure for the inverse mistake: a raw uint8 clip fed on the
        # float route would silently encode 0-255 values into garbage latents
        assert jnp.issubdtype(x.dtype, jnp.floating), (
            f"pixel_format='float' expects float pixels in [-1, 1], got {x.dtype}; "
            "pass pixel_format='uint8' for raw uint8 clips"
        )
    be = _CONV_BACKEND if conv_backend is None else conv_backend
    B, T, H, W, _ = x.shape
    state = init_encoder_state(vae_cfg, B, H, W, dtype=vae_cfg.dtype)
    outs = []
    z, caches = _jitted_chunk("enc", vae_cfg, first=True, conv_backend=be, from_u8=from_u8)(
        params, x[:, :1], state.caches
    )
    outs.append(z)
    pos = 1
    steady = _jitted_chunk("enc", vae_cfg, first=False, conv_backend=be, from_u8=from_u8)
    while pos < T:
        end = min(pos + chunk_frames, T)
        z, caches = steady(params, x[:, pos:end], caches)
        outs.append(z)
        pos = end
    return jnp.concatenate(outs, axis=1)


# ------------------------------- decoder -------------------------------


def init_decoder_state(cfg: WanVAEConfig, batch: int, latent_h: int, latent_w: int, dtype=jnp.bfloat16) -> StreamState:
    d = cfg.dim
    mult = tuple(cfg.dim_mult)
    dims = [d * u for u in (mult[-1],) + mult[::-1]]
    temporal_upsample = cfg.temporal_downsample[::-1]
    caches: dict[str, Any] = {}
    h, w = latent_h, latent_w
    caches["conv1"] = _init_conv_cache(batch, h, w, cfg.z_dim, dtype)
    for key in ("mid_res1", "mid_res2"):
        caches[f"{key}.c1"] = _init_conv_cache(batch, h, w, dims[0], dtype)
        caches[f"{key}.c2"] = _init_conv_cache(batch, h, w, dims[0], dtype)
    li = 0
    for s, (i_d, o_d) in enumerate(zip(dims[:-1], dims[1:])):
        in_d = i_d // 2 if s in (1, 2, 3) else i_d
        for _ in range(cfg.num_res_blocks + 1):
            caches[f"up_{li}.c1"] = _init_conv_cache(batch, h, w, in_d, dtype)
            caches[f"up_{li}.c2"] = _init_conv_cache(batch, h, w, o_d, dtype)
            in_d = o_d
            li += 1
        if s != len(mult) - 1:
            if temporal_upsample[s]:
                caches[f"up_{li}.t"] = jnp.zeros((batch, CACHE_T, h, w, o_d), dtype=dtype)
            h, w = h * 2, w * 2
            li += 1
    caches["head"] = _init_conv_cache(batch, h, w, dims[-1], dtype)
    return StreamState(caches=caches, first=True)


def decoder_chunk(cfg: WanVAEConfig, params, z_chunk, state: StreamState, conv_backend: str = "xla"):
    """One decode chunk: z (B, k, h, w, 16) -> pixels.

    First chunk must be a single latent frame (the global frame-0 bypass).
    """
    p = params["params"]
    dec = p["decoder"]
    dt = cfg.dtype
    caches = dict(state.caches)
    first = state.first
    mult = tuple(cfg.dim_mult)
    dims = [cfg.dim * u for u in (mult[-1],) + mult[::-1]]
    temporal_upsample = cfg.temporal_downsample[::-1]

    mean = jnp.asarray(WAN_LATENT_MEAN, dtype=jnp.float32)
    std = jnp.asarray(WAN_LATENT_STD, dtype=jnp.float32)
    zin = (z_chunk.astype(jnp.float32) * std + mean).astype(dt)
    x = _conv3d(p["conv2"], zin, (0, 0), spatial_pad=0, dtype=dt)
    x, caches["conv1"] = _stream_conv(dec["conv1"], x, caches["conv1"], dt, conv_backend)
    x = _stream_resblock(dec["mid_res1"], x, caches, "mid_res1", dt, conv_backend)
    x = _attn_block(dec["mid_attn"], x, dt)
    x = _stream_resblock(dec["mid_res2"], x, caches, "mid_res2", dt, conv_backend)

    li = 0
    for s in range(len(mult)):
        for _ in range(cfg.num_res_blocks + 1):
            x = _stream_resblock(dec[f"up_{li}"], x, caches, f"up_{li}", dt, conv_backend)
            li += 1
        if s != len(mult) - 1:
            rp = dec[f"up_{li}"]
            if temporal_upsample[s]:
                B, T, Hh, Ww, C = x.shape
                if first:
                    # "Rep": frame 0 bypasses the doubling conv; its history
                    # stays zero (cache untouched)
                    assert T == 1, "first decode chunk must be one latent frame"
                else:
                    xin = jnp.concatenate([caches[f"up_{li}.t"].astype(x.dtype), x], axis=1)
                    caches[f"up_{li}.t"] = xin[:, -CACHE_T:]
                    zt = _conv3d(rp["time_conv"], xin, (0, 0), spatial_pad=0, dtype=dt)
                    zt = zt.reshape(B, T, Hh, Ww, 2, C)
                    inter = jnp.stack([zt[..., 0, :], zt[..., 1, :]], axis=2).reshape(B, 2 * T, Hh, Ww, C)
                    x = inter
            x = _upsample2x_conv3x3(rp["conv"]["weight"], rp["conv"]["bias"], x, dt)
            li += 1

    y = jax.nn.silu(_norm(dec["head_norm"], x))
    y, caches["head"] = _stream_conv(dec["head_conv"], y, caches["head"], dt, conv_backend)
    return y, StreamState(caches=caches, first=False)


def decode_streaming(
    vae_cfg: WanVAEConfig, params, z, chunk_latent_frames: int = 2, out: str = "device",
    pixel_format: str = "float", conv_backend: str | None = None,
):
    """Full streaming decode of (B, t, h, w, 16); O(chunk) memory.

    Chunks run through a cached ``jax.jit`` of :func:`decoder_chunk`
    (two compiled programs total: first chunk + steady chunk; a ragged
    final chunk adds a third). ``chunk_latent_frames=2`` is the measured
    full-scale sweet spot (r5 chip sweep, 93f 704x1280 u8 overlapped:
    chunk 1 = 14.4 s, chunk 2 = 13.2 s — deeper dispatches amortize the
    per-chunk host/queue overhead without exhausting VMEM/HBM).

    ``out="host"`` spools each decoded pixel chunk to host memory and
    returns a numpy array — required at full scale (93f x 704x1280
    accumulates ~0.5 GB of pixels; keeping every chunk resident on device
    next to the decoder working set exhausts a 16 GB chip). The spool is
    OVERLAPPED: chunk i+1 is dispatched (JAX async dispatch) before chunk
    i's device->host transfer is forced, so the copy rides under the next
    chunk's compute instead of serializing with it. ``out="host_sync"``
    keeps the old serialized behavior (for measurement).

    ``pixel_format="uint8"`` fuses the [-1,1] -> uint8 conversion into the
    compiled chunk program: the transfer shrinks 2x and the caller gets
    frames ready for video encoding (the save path quantizes anyway).
    """
    import numpy as np

    assert pixel_format in ("float", "uint8"), pixel_format
    B, t, h, w, _ = z.shape
    state = init_decoder_state(vae_cfg, B, h, w, dtype=vae_cfg.dtype)
    to_host = out in ("host", "host_sync")
    to_out = (lambda a: np.asarray(a)) if to_host else (lambda a: a)
    u8 = pixel_format == "uint8"
    # Resolve the backend ONCE here and thread it explicitly (trace-time
    # constant); pass conv_backend to override (e.g. scripts/vae_bench.py
    # A/B-ing backends on this route).
    be = _CONV_BACKEND if conv_backend is None else conv_backend
    # Host-route D2H overlap (measured on chip, docs/PERF.md round 4): the
    # async device->host pulls only serialize against the program that
    # PRODUCES the transferred buffer when that program contains a
    # pallas_call. Producing the uint8 transfer buffer in a separate tiny
    # quantize program restores full overlap, so the Pallas conv kernel
    # (fastest per chunk: 551 vs 672 ms steady) is usable on the
    # production route: 16.0 s whole-clip vs 17.6 s (taps, fused u8) and
    # 25.0 s (XLA conv) on the same tunnel.
    split_quant = u8 and out == "host"
    first_fn = _jitted_chunk("dec", vae_cfg, first=True, to_u8=u8 and not split_quant, conv_backend=be)
    steady = _jitted_chunk("dec", vae_cfg, first=False, to_u8=u8 and not split_quant, conv_backend=be)
    quant = _jitted_quant() if split_quant else (lambda a: a)
    outs = []
    px, caches = first_fn(params, z[:, :1], state.caches)
    if out == "host":
        # fully pipelined spool: dispatch EVERY chunk up front (async
        # dispatch; the device queue serializes compute) and start each
        # chunk's device->host copy as soon as it is produced, so D2H rides
        # under later chunks' compute. The whole uint8 clip held on device
        # is ~0.25 GB at 93f 704x1280 — far cheaper than serializing
        # transfers. np.asarray at the end then just waits.
        px = quant(px)
        if hasattr(px, "copy_to_host_async"):
            px.copy_to_host_async()
        pending = [px]
        pos = 1
        while pos < t:
            end = min(pos + chunk_latent_frames, t)
            px, caches = steady(params, z[:, pos:end], caches)  # async dispatch
            px = quant(px)
            if hasattr(px, "copy_to_host_async"):
                px.copy_to_host_async()
            pending.append(px)
            pos = end
        return np.concatenate([np.asarray(p) for p in pending], axis=1)
    outs.append(to_out(px))
    pos = 1
    while pos < t:
        end = min(pos + chunk_latent_frames, t)
        px, caches = steady(params, z[:, pos:end], caches)
        outs.append(to_out(px))
        pos = end
    if to_host:
        return np.concatenate(outs, axis=1)
    return jnp.concatenate(outs, axis=1)


# ---------------------- jit plumbing for the host loops ----------------------


_JIT_CACHE: dict[tuple, Any] = {}


def _jitted_quant():
    """[-1,1] float -> uint8, as its OWN program: the host route transfers
    this program's output, and keeping it pallas-free preserves D2H overlap
    (see decode_streaming)."""
    fn = _JIT_CACHE.get("quant_u8")
    if fn is None:
        fn = _JIT_CACHE["quant_u8"] = jax.jit(
            lambda px: jnp.round(
                (jnp.clip(px.astype(jnp.float32), -1.0, 1.0) + 1.0) * 127.5
            ).astype(jnp.uint8)
        )
    return fn


def _cfg_key(cfg: WanVAEConfig) -> tuple:
    return (
        cfg.dim,
        cfg.z_dim,
        tuple(cfg.dim_mult),
        cfg.num_res_blocks,
        tuple(cfg.temporal_downsample),
        jnp.dtype(cfg.dtype).name,
    )


def _jitted_chunk(
    kind: str, cfg: WanVAEConfig, *, first: bool, to_u8: bool = False,
    conv_backend: str | None = None, from_u8: bool = False,
):
    """Compiled (params, chunk, caches) -> (out, caches) for one stream
    chunk. ``first`` is a trace-time constant (the frame-0 "Rep" bypass is
    Python control flow), so first/steady chunks get separate programs.
    ``to_u8`` fuses [-1,1] -> uint8 quantization into the program (decode);
    ``from_u8`` fuses uint8 -> [-1,1] normalization in (encode).
    ``conv_backend`` is resolved here (defaults to the process global) and
    baked into the program + cache key as a trace-time constant."""
    be = _CONV_BACKEND if conv_backend is None else conv_backend
    key = (kind, _cfg_key(cfg), first, to_u8, be, from_u8)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        base = encoder_chunk if kind == "enc" else decoder_chunk

        def flat(
            params, chunk, caches,
            _base=base, _cfg=cfg, _first=first, _be=be, _from_u8=from_u8, _to_u8=to_u8,
        ):
            if _from_u8:
                # normalize in the config dtype (bf16 in every shipped config,
                # bit-compatible with the historical uint8 -> bf16 host pass);
                # keeps the uint8 and float routes dtype-consistent when a
                # non-bf16 VAE config is used.
                chunk = chunk.astype(_cfg.dtype) / 127.5 - 1.0
            out, st = _base(_cfg, params, chunk, StreamState(caches=caches, first=_first), conv_backend=_be)
            if _to_u8:
                out = jnp.round((jnp.clip(out.astype(jnp.float32), -1.0, 1.0) + 1.0) * 127.5).astype(jnp.uint8)
            return out, st.caches

        # donate the cache pytree: in/out cache shapes match, so XLA
        # updates them in place instead of double-buffering (~GBs at 720p)
        fn = _JIT_CACHE[key] = jax.jit(flat, donate_argnums=(2,))
    return fn
