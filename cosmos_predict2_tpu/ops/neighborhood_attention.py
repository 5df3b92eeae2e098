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


def _build_kv_tile_table(
    seq_len: int, bq: int, bkv: int, size: VideoSize, window: tuple[int, int, int]
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side block-sparsity table: for every q tile, the kv tiles that
    can contain in-window keys (conservative per-axis interval test, the
    same logic the old kernel evaluated per grid step). Returns
    (table (nq, max_cnt) int32 padded with the last valid tile, counts (nq,)).

    This is what turns the kernel from mask-and-skip (every (i, j) pair
    still costs a grid step + K/V HBM copy) into a gathered sparse kernel
    (grid and DMA sized to the work that exists) — the splash-attention
    scalar-prefetch pattern.
    """
    hw = size.H * size.W
    nq = -(-seq_len // bq)
    nk = -(-seq_len // bkv)

    def axis_overlap(w: int, length: int, q_lo: int, q_hi: int, k_lo: int, k_hi: int) -> bool:
        r_lo = (w - 1) // 2
        r_hi = w - 1 - r_lo
        lo = max(min(q_lo, length - 1 - r_hi), r_lo) - r_lo
        hi = min(max(q_hi, r_lo), length - 1 - r_hi) + r_hi
        return k_hi >= lo and k_lo <= hi

    wt, wh = window[0], window[1]
    rows: list[list[int]] = []
    for i in range(nq):
        q0, q1 = i * bq, min(seq_len, (i + 1) * bq) - 1
        keep: list[int] = []
        for j in range(nk):
            k0, k1 = j * bkv, min(seq_len, (j + 1) * bkv) - 1
            ok = True
            if 0 <= wt < size.T:
                ok = axis_overlap(wt, size.T, q0 // hw, q1 // hw, k0 // hw, k1 // hw)
            if ok and 0 <= wh < size.H and (q0 // hw == q1 // hw) and (k0 // hw == k1 // hw):
                ok = axis_overlap(
                    wh, size.H, (q0 % hw) // size.W, (q1 % hw) // size.W,
                    (k0 % hw) // size.W, (k1 % hw) // size.W,
                )
            if ok:
                keep.append(j)
        rows.append(keep)
    counts = np.asarray([len(r) for r in rows], dtype=np.int32)
    max_cnt = int(counts.max()) if nq else 1
    table = np.zeros((nq, max_cnt), dtype=np.int32)
    for i, r in enumerate(rows):
        table[i, : len(r)] = r
        if len(r) < max_cnt:  # pad with the last real tile (compute is gated off)
            table[i, len(r):] = r[-1] if r else 0
    return table, counts


def _na_kernel(
    tab_ref, cnt_ref, q_ref, k_ref, v_ref, o_ref, acc, m_scr, l_scr,
    *, scale, size: VideoSize, window, block_q, block_kv, seq_len,
):
    """Gathered block-sparse NA forward: grid (b, h, nq, max_cnt); the kv
    tile actually loaded at step (i, j) is tab[i, j] (scalar-prefetched, so
    the DMA pipeline gathers only in-window tiles)."""
    iq = pl.program_id(2)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    @pl.when(j < cnt_ref[iq])
    def _compute():
        ik = tab_ref[iq, j]
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

    @pl.when(j == pl.num_programs(3) - 1)
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
    bq = min(block_q, max(128, (s_len // 128) * 128) if s_len >= 128 else 128)
    bkv = min(block_kv, bq)

    def pad(x, blk):
        rem = x.shape[2] % blk
        return x if rem == 0 else jnp.pad(x, ((0, 0), (0, 0), (0, blk - rem), (0, 0)))

    qp, kp, vp = pad(qt, bq), pad(kt, bkv), pad(vt, bkv)
    sp = qp.shape[2]
    nq = sp // bq
    table_np, counts_np = _build_kv_tile_table(s_len, bq, bkv, video_size, tuple(window))
    # padded q tiles (beyond the real sequence) read tile 0 and skip compute
    if table_np.shape[0] < nq:
        pad_rows = nq - table_np.shape[0]
        table_np = np.concatenate([table_np, np.zeros((pad_rows, table_np.shape[1]), np.int32)])
        counts_np = np.concatenate([counts_np, np.zeros((pad_rows,), np.int32)])
    max_cnt = table_np.shape[1]

    grid = (b, h, nq, max_cnt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # (table, counts)
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i, j, tab, cnt: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, bkv, d), lambda b_, h_, i, j, tab, cnt: (b_, h_, tab[i, j], 0)),
            pl.BlockSpec((1, 1, bkv, d), lambda b_, h_, i, j, tab, cnt: (b_, h_, tab[i, j], 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i, j, tab, cnt: (b_, h_, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
            pltpu.VMEM((bq, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _na_kernel, scale=scale, size=video_size, window=tuple(window),
            block_q=bq, block_kv=bkv, seq_len=s_len,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, sp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(jnp.asarray(table_np), jnp.asarray(counts_np), qp, kp, vp)
    return out[:, :, :s_len].transpose(0, 2, 1, 3)
