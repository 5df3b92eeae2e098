"""3D neighborhood (sparse local) attention — the NATTEN replacement.

Capability parity with the reference's NATTEN-backed sparse attention
(cosmos_predict2/_src/predict2/modules/neighborhood_attn.py:57-248 and the
``replace_selfattn_op_with_sparse_attn_op`` DiT surgery,
minimal_v4_dit.py:1743-1813): each video token (t, h, w) attends keys
inside a per-axis window centered on the query with boundary clamping
(standard NA semantics), window -1 meaning full attention along that axis.

Two paths:
* :func:`neighborhood_attention_reference` — jnp mask + softmax (CPU tests,
  tiny shapes);
* :func:`neighborhood_attention` — Pallas flash-style kernel with the 3D
  window mask evaluated per tile from decomposed token coordinates and
  whole-tile skipping along the (token-major) temporal axis, which is where
  video sparsity lives.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


class VideoSize(NamedTuple):
    T: int
    H: int
    W: int


def _axis_window_ok(ci, cj, length: int, window: int):
    """NA membership along one axis with clamped window centers."""
    if window < 0 or window >= length:
        return None  # full attention on this axis
    r_lo = (window - 1) // 2
    r_hi = window - 1 - r_lo
    center = jnp.clip(ci, r_lo, length - 1 - r_hi)
    return (cj >= center - r_lo) & (cj <= center + r_hi)


def _decompose(idx, size: VideoSize):
    hw = size.H * size.W
    t = idx // hw
    rem = idx % hw
    return t, rem // size.W, rem % size.W


def _na_mask(rows, cols, size: VideoSize, window: tuple[int, int, int]):
    rt, rh, rw = _decompose(rows, size)
    ct, ch, cw = _decompose(cols, size)
    mask = None
    for (ci, cj, length, w) in ((rt, ct, size.T, window[0]), (rh, ch, size.H, window[1]), (rw, cw, size.W, window[2])):
        ok = _axis_window_ok(ci, cj, length, w)
        if ok is not None:
            mask = ok if mask is None else (mask & ok)
    return mask  # None => fully dense


def neighborhood_attention_reference(
    q: jax.Array, k: jax.Array, v: jax.Array, video_size: VideoSize, window: tuple[int, int, int]
) -> jax.Array:
    """q,k,v: (B, S, H, D) with S = T*H*W. fp32 softmax."""
    S = q.shape[1]
    d = q.shape[-1]
    scale = 1.0 / np.sqrt(d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    rows = jnp.arange(S)[:, None]
    cols = jnp.arange(S)[None, :]
    mask = _na_mask(rows, cols, video_size, window)
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _na_kernel(
    q_ref, k_ref, v_ref, o_ref, acc, m_scr, l_scr,
    *, scale, size: VideoSize, window, block_q, block_kv, seq_len,
):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    # tile skipping along the token-major axes: a q tile of contiguous
    # tokens spans a contiguous (t, h) coordinate range; a kv tile whose
    # t-range (and, within a single frame, h-range) is entirely outside the
    # clamp-widened window contributes nothing and is skipped wholesale.
    hw = size.H * size.W

    def axis_range_overlap(w, length, q_lo_c, q_hi_c, k_lo_c, k_hi_c):
        r_lo = (w - 1) // 2
        r_hi = w - 1 - r_lo
        lo = jnp.maximum(jnp.minimum(q_lo_c, length - 1 - r_hi), r_lo) - r_lo
        hi = jnp.minimum(jnp.maximum(q_hi_c, r_lo), length - 1 - r_hi) + r_hi
        return (k_hi_c >= lo) & (k_lo_c <= hi)

    run_block = True
    wt = window[0]
    q0, q1 = iq * block_q, iq * block_q + block_q - 1
    k0, k1 = ik * block_kv, ik * block_kv + block_kv - 1
    if 0 <= wt < size.T:
        run_block = run_block & axis_range_overlap(wt, size.T, q0 // hw, q1 // hw, k0 // hw, k1 // hw)
    wh = window[1]
    if 0 <= wh < size.H:
        # h-skip is exact only when both tiles sit inside ONE frame
        # (otherwise the h-range wraps); guard on that.
        same_frame = (q0 // hw == q1 // hw) & (k0 // hw == k1 // hw)
        h_ok = axis_range_overlap(
            wh, size.H, (q0 % hw) // size.W, (q1 % hw) // size.W, (k0 % hw) // size.W, (k1 % hw) // size.W
        )
        run_block = run_block & (h_ok | ~same_frame)

    @pl.when(run_block)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
        rows = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
        cols = ik * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        mask = _na_mask(rows, cols, size, window)
        valid = cols < seq_len
        mask = valid if mask is None else (mask & valid)
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        acc[:] = acc[:] * corr + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == n_kv - 1)
    def _finalize():
        l = jnp.maximum(l_scr[:, :1], 1e-20)
        o_ref[0, 0] = (acc[:] / l).astype(o_ref.dtype)


def neighborhood_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    video_size: VideoSize,
    window: tuple[int, int, int],
    block_q: int = 256,
    block_kv: int = 256,
) -> jax.Array:
    """Pallas 3D neighborhood attention. q,k,v: (B, S, H, D), S = T*H*W.

    Inference-oriented (forward); training sparse-attention gradients can
    use the reference path or a custom VJP later.
    """
    b, s_len, h, d = q.shape
    qt, kt, vt = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    scale = 1.0 / np.sqrt(d)
    # prefer tiles that divide one frame's tokens (H*W): then every tile
    # sits inside a single frame and the h-axis tile skip is always exact
    # (e.g. 720p hw=3520 -> 440). Fall back to the caller's blocks.
    hw = video_size.H * video_size.W
    frame_divisor = next((bb for bb in range(512, 127, -8) if hw % bb == 0), None)
    if s_len > 16384 and frame_divisor is not None and 0 <= window[1] < video_size.H:
        block_q = block_kv = frame_divisor
    bq = min(block_q, max(128, (s_len // 128) * 128) if s_len >= 128 else 128)
    bkv = min(block_kv, bq)

    def pad(x, blk):
        rem = x.shape[2] % blk
        return x if rem == 0 else jnp.pad(x, ((0, 0), (0, 0), (0, blk - rem), (0, 0)))

    qp, kp, vp = pad(qt, bq), pad(kt, bkv), pad(vt, bkv)
    sp = qp.shape[2]
    grid = (b, h, sp // bq, sp // bkv)
    out = pl.pallas_call(
        functools.partial(
            _na_kernel, scale=scale, size=video_size, window=tuple(window),
            block_q=bq, block_kv=bkv, seq_len=s_len,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i, j: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, bkv, d), lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, bkv, d), lambda b_, h_, i, j: (b_, h_, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i, j: (b_, h_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sp, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp)
    return out[:, :, :s_len].transpose(0, 2, 1, 3)
