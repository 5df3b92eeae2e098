"""3D neighborhood (sparse local) attention — the NATTEN replacement.

Capability parity with the reference's NATTEN-backed sparse attention
(cosmos_predict2/_src/predict2/modules/neighborhood_attn.py:57-248 and the
``replace_selfattn_op_with_sparse_attn_op`` DiT surgery,
minimal_v4_dit.py:1743-1813): each video token (t, h, w) attends keys
inside a per-axis window centered on the query with boundary clamping
(standard NA semantics), window -1 meaning full attention along that axis.

Three paths:
* :func:`neighborhood_attention_reference` — jnp mask + softmax (CPU tests,
  tiny shapes; materializes S^2 logits);
* :func:`neighborhood_attention` — tiled-layout gathered block-sparse
  Pallas kernel (below);
* :func:`neighborhood_attention_gathered` — the SAME gathered block-sparse
  structure (same plan/permutation/mask math) executed as pure XLA
  take + einsum under a checkpointed ``lax.map`` over query blocks:
  linear FLOPs and O(block x window) memory on ANY backend. This is what
  makes sparse attention at production sequence lengths runnable on the
  virtual CPU mesh (84k tokens would need 228 GB of dense logits) and on
  any future non-TPU deployment.

Kernel design (TPU-first, v3). The video's token-major (t, h, w) order
scatters each spatial neighborhood across every frame, so block-level
sparsity is poor (~50% of kv tiles overlap any window at the 720p
geometry) and the in-tile membership mask needs integer div/mod per
element — expensive on the VPU. Instead we **permute tokens into
spatial-tile-major order**: the (H, W) token grid is cut into (4, 16)
tiles and tokens are laid out as (tile_h, tile_w, t, intra_h, intra_w).
Consequences:

* a kv block (a run of t-slices of one spatial tile) has a single (h, w)
  footprint, so the host-built kv-block table prunes on ALL THREE axes
  (w included — impossible before) — block density at the 720p window
  (-1, 12, 24) drops to ~27% of dense;
* intra-block coordinates are pure bit math (64 = 2^6 tokens per t-slice,
  16 = 2^4 per row), so the in-kernel mask is shifts/ands/compares — no
  div/mod;
* the gathered kv blocks for one query block are mostly contiguous runs
  (consecutive t-slices of each neighboring tile), which the scalar-
  prefetched DMA pipeline overlaps like splash attention.

The permutation itself is a pure reshape/pad/transpose pair around the
kernel (<2% of the attention time at seq 84k, and no O(S) index-array
constants in the HLO — see _permute_in).
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

# spatial tile of the permuted layout; 4*16 = 64 = 2^6 tokens per t-slice
_TILE_H = 4
_TILE_W = 16
_PER_T = _TILE_H * _TILE_W


class VideoSize(NamedTuple):
    T: int
    H: int
    W: int


def _rep(ci, stride: int):
    """GNA stride: all queries in a stride group share the window of the
    group's representative (its center), so stride == window reduces to
    non-overlapping blocked attention and stride == 1 is standard NA
    (reference modules/neighborhood_attn.py:75, minimal_v4_dit.py:1298-1301)."""
    if stride <= 1:
        return ci
    if stride & (stride - 1) == 0:  # pow2: shift/and lower cheaply on the VPU
        sh = stride.bit_length() - 1
        return ((ci >> sh) << sh) + (stride - 1) // 2
    return (ci // stride) * stride + (stride - 1) // 2


def _axis_window_ok(ci, cj, length: int, window: int, stride: int = 1, dilation: int = 1):
    """NA membership along one axis with clamped window centers.

    dilation > 1 is NATTEN DiNA: attention runs within each of the
    ``dilation`` interleaved sub-grids (positions with equal index mod
    dilation), with the clamped window evaluated on sub-grid coordinates
    (reference modules/neighborhood_attn.py:75-87; NATTEN asserts
    length >= window * dilation, so every sub-grid holds >= window
    positions)."""
    if dilation > 1:
        cls_i = ci % dilation
        same = cls_i == (cj % dilation)
        sub_len = (length - cls_i + dilation - 1) // dilation  # per-class length
        if window < 0 or window >= (length + dilation - 1) // dilation:
            return same  # full attention within the sub-grid
        r_lo = (window - 1) // 2
        r_hi = window - 1 - r_lo
        center = jnp.clip(_rep(ci // dilation, stride), r_lo, sub_len - 1 - r_hi)
        cj_sub = cj // dilation
        return same & (cj_sub >= center - r_lo) & (cj_sub <= center + r_hi)
    if window < 0 or window >= length:
        return None  # full attention on this axis
    r_lo = (window - 1) // 2
    r_hi = window - 1 - r_lo
    center = jnp.clip(_rep(ci, stride), r_lo, length - 1 - r_hi)
    return (cj >= center - r_lo) & (cj <= center + r_hi)


def _decompose(idx, size: VideoSize):
    hw = size.H * size.W
    t = idx // hw
    rem = idx % hw
    return t, rem // size.W, rem % size.W


def _na_mask(
    rows, cols, size: VideoSize, window: tuple[int, int, int], stride=(1, 1, 1), dilation=(1, 1, 1)
):
    rt, rh, rw = _decompose(rows, size)
    ct, ch, cw = _decompose(cols, size)
    mask = None
    for (ci, cj, length, w, st, dl) in (
        (rt, ct, size.T, window[0], stride[0], dilation[0]),
        (rh, ch, size.H, window[1], stride[1], dilation[1]),
        (rw, cw, size.W, window[2], stride[2], dilation[2]),
    ):
        ok = _axis_window_ok(ci, cj, length, w, st, dl)
        if ok is not None:
            mask = ok if mask is None else (mask & ok)
    return mask  # None => fully dense


def neighborhood_attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    video_size: VideoSize,
    window: tuple[int, int, int],
    stride: tuple[int, int, int] = (1, 1, 1),
    dilation: tuple[int, int, int] = (1, 1, 1),
) -> jax.Array:
    """q,k,v: (B, S, H, D) with S = T*H*W. fp32 softmax."""
    S = q.shape[1]
    d = q.shape[-1]
    scale = 1.0 / np.sqrt(d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    rows = jnp.arange(S)[:, None]
    cols = jnp.arange(S)[None, :]
    mask = _na_mask(rows, cols, video_size, window, stride, dilation)
    if mask is not None:
        logits = jnp.where(mask, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _nearest_divisor(length: int, d: int) -> int:
    """Largest divisor of `length` that is <= d (d >= 1)."""
    d = max(1, min(d, length))
    while length % d:
        d -= 1
    return d


def adaptive_na_parameters(
    window: tuple[int, int, int],
    stride: tuple[int, int, int],
    input_shape: tuple[int, int, int],
    base_size: tuple[int, int, int] | None,
    dilation: tuple[int, int, int] = (1, 1, 1),
) -> tuple[tuple[int, int, int], tuple[int, int, int], tuple[int, int, int]]:
    """Scale the NA window/stride/dilation from a tuning geometry to the
    actual input geometry (reference modules/neighborhood_attn.py:140-168):
    a window tuned as (-1, 12, 24) at base (T, 44, 80) becomes (-1, 6, 12)
    at a 22x40 token grid. window <= 1 or base <= 0 entries mean "full
    axis"."""
    window = tuple(w if w > 1 else x for x, w in zip(input_shape, window))
    if base_size is not None:
        base = tuple(b if b > 0 else x for x, b in zip(input_shape, base_size))
        scale = tuple(x / b for x, b in zip(input_shape, base))
        window = tuple(min(max(2, round(w * s)), x) for w, s, x in zip(window, scale, input_shape))
        stride = tuple(min(max(1, round(st * s)), w) for w, s, st in zip(window, scale, stride))
        max_dil = tuple(x // w for x, w in zip(input_shape, window))
        dilation = tuple(min(max(1, round(d * s)), md) for d, s, md in zip(dilation, scale, max_dil))
        # Clamp each dilation down to the nearest divisor of the axis
        # length so the class-major reorder stays well-formed at any
        # geometry (e.g. 480p scaling gives dilation 6 on H=22 -> 2).
        dilation = tuple(_nearest_divisor(x, dl) for x, dl in zip(input_shape, dilation))
    assert all(w >= st for w, st in zip(window, stride)), (window, stride)
    assert all(x >= w * d for x, w, d in zip(input_shape, window, dilation)), (window, dilation)
    return window, stride, dilation


# ---------------------------------------------------------------------------
# tiled layout plan (host side)
# ---------------------------------------------------------------------------


class _Plan(NamedTuple):
    size: VideoSize  # true (T, H, W)
    dilation: tuple[int, int, int]
    t_pad: int  # T padded to a block-t multiple
    nth: int  # spatial tile grid (H axis)
    ntw: int  # spatial tile grid (W axis)
    block: int  # q/kv block size (multiple of _PER_T, divides a superblock)
    s_pad: int
    coords: np.ndarray  # (n_blocks, 3) int32: (t0, h0, w0) base of each block
    table: np.ndarray  # (n_blocks, max_cnt) kv block ids per q block
    counts: np.ndarray  # (n_blocks,)
    tableT: np.ndarray  # (n_blocks, max_cntT) q block ids per kv block (exact transpose)
    countsT: np.ndarray  # (n_blocks,)


def _axis_overlap(
    w: int, length: int, q_lo: int, q_hi: int, k_lo: int, k_hi: int, stride: int = 1
) -> bool:
    """Can any key row in [k_lo,k_hi] fall in the clamped window of any
    query row in [q_lo,q_hi]?  (exact for interval inputs; the stride
    group-representative transform is monotonic, so interval ends map to
    interval ends)"""
    if stride > 1:
        q_lo = (q_lo // stride) * stride + (stride - 1) // 2
        q_hi = (q_hi // stride) * stride + (stride - 1) // 2
    r_lo = (w - 1) // 2
    r_hi = w - 1 - r_lo
    lo = max(min(q_lo, length - 1 - r_hi), r_lo) - r_lo
    hi = min(max(q_hi, r_lo), length - 1 - r_hi) + r_hi
    return k_hi >= lo and k_lo <= hi


@functools.lru_cache(maxsize=32)
def _build_plan(
    size: VideoSize,
    window: tuple[int, int, int],
    stride: tuple[int, int, int],
    dilation: tuple[int, int, int],
    block_cap: int,
) -> _Plan:
    T, H, W = size
    nth = -(-H // _TILE_H)
    ntw = -(-W // _TILE_W)

    # block size: EVEN number of t-slices so block % 128 == 0 (required by
    # the (1,1,1,block) lse/delta layout of the backward pass, and keeps
    # MXU-friendly shapes). T is padded up to a multiple of bt; pad frames
    # are masked in-kernel and pruned from the table. Pick the candidate
    # minimizing padding, preferring larger blocks on ties.
    cap_bt = max(2, min(8, max(block_cap, _PER_T) // _PER_T))
    bt = min(
        (b_ for b_ in range(2, cap_bt + 1, 2)),
        key=lambda b_: (-(-T // b_) * b_, -b_),
    )
    t_pad = -(-T // bt) * bt
    block = _PER_T * bt
    sb = _PER_T * t_pad  # superblock = one spatial tile, all (padded) frames

    # The permutation to the (tile_h, tile_w, t, ih, iw) order — including
    # the CLASS-MAJOR dilation reorder (all positions with equal index mod
    # dilation form a contiguous run, so dilated attention becomes blocked
    # attention on the reordered axis; window/stride passed to this plan
    # are already the effective blocked parameters, see _effective_params)
    # — is applied as pure reshape/pad/transpose in _permute_in/_permute_out
    # from the geometry fields alone: index-array gathers would bake an
    # O(S) i32 constant into every NA call site's HLO (~340 KB each at 42k
    # tokens, one per scan segment per fwd/bwd pallas program), which
    # overflows this environment's compile helper at full scale.
    s_pad = nth * ntw * sb
    nblk = s_pad // block
    per_sb = sb // block  # kv/q blocks per superblock

    # block base coordinates
    m = np.arange(nblk)
    sb_idx = m // per_sb
    coords = np.stack(
        [
            (m % per_sb) * bt,  # t0
            (sb_idx // ntw) * _TILE_H,  # h0
            (sb_idx % ntw) * _TILE_W,  # w0
        ],
        axis=1,
    ).astype(np.int32)

    wt, wh, ww = window
    st_t, st_h, st_w = stride
    rows: list[list[int]] = []
    for i in range(nblk):
        qt0, qh0, qw0 = (int(x) for x in coords[i])
        if qt0 >= T or qh0 >= H or qw0 >= W:  # fully-pad query block: no work
            rows.append([])
            continue
        qt1 = min(qt0 + bt, T) - 1
        qh1 = min(qh0 + _TILE_H, H) - 1
        qw1 = min(qw0 + _TILE_W, W) - 1
        keep: list[int] = []
        for j in range(nblk):
            kt0, kh0, kw0 = (int(x) for x in coords[j])
            if kt0 >= T or kh0 >= H or kw0 >= W:  # fully-pad kv block: never attended
                continue
            ok = True
            if 0 <= wt < T:
                ok = _axis_overlap(wt, T, qt0, qt1, kt0, min(kt0 + bt, T) - 1, st_t)
            if ok and 0 <= wh < H:
                ok = _axis_overlap(wh, H, qh0, qh1, kh0, min(kh0 + _TILE_H, H) - 1, st_h)
            if ok and 0 <= ww < W:
                ok = _axis_overlap(ww, W, qw0, qw1, kw0, min(kw0 + _TILE_W, W) - 1, st_w)
            if ok:
                keep.append(j)
        rows.append(keep)

    def pack(row_lists: list[list[int]]) -> tuple[np.ndarray, np.ndarray]:
        cnt = np.asarray([len(r) for r in row_lists], dtype=np.int32)
        mx = max(int(cnt.max()), 1) if len(row_lists) else 1
        tab = np.zeros((len(row_lists), mx), dtype=np.int32)
        for i_, r in enumerate(row_lists):
            tab[i_, : len(r)] = r
            if len(r) < mx:  # pad with the last real id: same block index in
                tab[i_, len(r):] = r[-1] if r else 0  # consecutive steps => no re-DMA
        return tab, cnt

    table, counts = pack(rows)
    # exact transpose for the dK/dV pass: which q blocks attend kv block j.
    # (clamped NA is not symmetric, so this must be the transpose of the
    # forward table, not a window test from the kv side.)
    rows_t: list[list[int]] = [[] for _ in range(nblk)]
    for i, r in enumerate(rows):
        for j in r:
            rows_t[j].append(i)
    table_t, counts_t = pack(rows_t)
    return _Plan(
        VideoSize(T, H, W), tuple(dilation), t_pad, nth, ntw,
        block, s_pad, coords, table, counts, table_t, counts_t,
    )


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _pair_mask(co_ref, qi, ki, shape, qdim: int, kdim: int, size: VideoSize, window, stride):
    """Window-membership mask for a (q block, kv block) pair on the permuted
    layout. Intra-block coordinates are bit math (64 = 2^6 tokens per
    t-slice of a 4x16 tile): t = t0 + (idx >> 6), h = h0 + ((idx & 63) >> 4),
    w = w0 + (idx & 15). ``qdim``/``kdim`` say which iota axis runs over the
    q/k tokens (the dK/dV kernel uses the transposed orientation)."""
    qio = jax.lax.broadcasted_iota(jnp.int32, shape, qdim)
    kio = jax.lax.broadcasted_iota(jnp.int32, shape, kdim)
    t_q = co_ref[qi, 0] + (qio >> 6)
    h_q = co_ref[qi, 1] + ((qio & 63) >> 4)
    w_q = co_ref[qi, 2] + (qio & 15)
    t_k = co_ref[ki, 0] + (kio >> 6)
    h_k = co_ref[ki, 1] + ((kio & 63) >> 4)
    w_k = co_ref[ki, 2] + (kio & 15)
    # pad slots (t/h/w beyond the real video) are never keys — and never
    # queries either: window clamping would otherwise map an out-of-bounds
    # query center back onto real keys, which is harmless in the forward
    # (pad outputs are dropped) but would let the duplicated pad-slot dO
    # rows corrupt dK/dV in the backward pass.
    mask = (t_k < size.T) & (h_k < size.H) & (w_k < size.W)
    mask = mask & (t_q < size.T) & (h_q < size.H) & (w_q < size.W)
    for (ci, cj, length, w_, st_) in (
        (t_q, t_k, size.T, window[0], stride[0]),
        (h_q, h_k, size.H, window[1], stride[1]),
        (w_q, w_k, size.W, window[2], stride[2]),
    ):
        ok = _axis_window_ok(ci, cj, length, w_, st_)
        if ok is not None:
            mask = mask & ok
    return mask


def _na_fwd_kernel(
    tab_ref, cnt_ref, co_ref, q_ref, k_ref, v_ref, o_ref, *rest,
    scale, size: VideoSize, window, stride, with_lse: bool,
):
    """Gathered block-sparse NA forward: grid (b, h, nq, max_cnt); the kv
    block loaded at step (i, j) is tab[i, j] (scalar-prefetched, so the DMA
    pipeline gathers only in-window blocks)."""
    if with_lse:
        lse_ref, acc, m_scr, l_scr = rest
    else:
        acc, m_scr, l_scr = rest
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
        mask = _pair_mask(co_ref, iq, ik, s.shape, 0, 1, size, window, stride)
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
        if with_lse:
            lse_ref[0, 0] = (m_scr[:, 0] + jnp.log(l[:, 0]))[None, :]


def _na_dq_kernel(
    tab_ref, cnt_ref, co_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref, dq_ref, dq_acc,
    *, scale, size: VideoSize, window, stride,
):
    """dQ: same gathered iteration as the forward (grid (b, h, nq, max_cnt));
    p is recomputed from the saved logsumexp (flash-attention style)."""
    iq = pl.program_id(2)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    @pl.when(j < cnt_ref[iq])
    def _compute():
        ik = tab_ref[iq, j]
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
        mask = _pair_mask(co_ref, iq, ik, s.shape, 0, 1, size, window, stride)
        lse = lse_ref[0, 0][0][:, None]  # (bq, 1)
        p = jnp.where(mask, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        delta = dl_ref[0, 0][0][:, None]
        ds = p * (dp - delta)
        dq_acc[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale

    @pl.when(j == pl.num_programs(3) - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)


def _na_dkv_kernel(
    tab_ref, cnt_ref, co_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, dl_ref,
    dk_ref, dv_ref, dk_acc, dv_acc,
    *, scale, size: VideoSize, window, stride,
):
    """dK/dV: grid (b, h, nk, max_cntT) over the exact TRANSPOSE of the
    forward table (clamped NA is not symmetric, so the q blocks attending a
    kv block come from inverting the forward table, not a kv-side window
    test)."""
    ik = pl.program_id(2)
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    @pl.when(j < cnt_ref[ik])
    def _compute():
        iq = tab_ref[ik, j]
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
        mask = _pair_mask(co_ref, iq, ik, st.shape, 1, 0, size, window, stride)  # (bk, bq)
        lse = lse_ref[0, 0][0][None, :]  # (1, bq)
        pt = jnp.where(mask, jnp.exp(st - lse), 0.0)
        dv_acc[:] += jax.lax.dot_general(
            pt.astype(do.dtype), do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dpt = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        delta = dl_ref[0, 0][0][None, :]
        dst = pt * (dpt - delta)
        dk_acc[:] += jax.lax.dot_general(
            dst.astype(q.dtype), q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale

    @pl.when(j == pl.num_programs(3) - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _na_forward(qt, kt, vt, size: VideoSize, window, stride, plan: _Plan, with_lse: bool):
    """Run the forward kernel on permuted (B, H, S_pad, D) tensors."""
    b, h, s_pad, d = qt.shape
    blk = plan.block
    nq = s_pad // blk
    scale = 1.0 / np.sqrt(d)
    grid = (b, h, nq, plan.table.shape[1])
    idx_q = lambda b_, h_, i, j, tab, cnt, co: (b_, h_, i, 0)
    idx_kv = lambda b_, h_, i, j, tab, cnt, co: (b_, h_, tab[i, j], 0)
    out_specs = [pl.BlockSpec((1, 1, blk, d), idx_q)]
    out_shape = [jax.ShapeDtypeStruct((b, h, s_pad, d), qt.dtype)]
    if with_lse:
        out_specs.append(pl.BlockSpec((1, 1, 1, blk), lambda b_, h_, i, j, tab, cnt, co: (b_, h_, 0, i)))
        out_shape.append(jax.ShapeDtypeStruct((b, h, 1, s_pad), jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # (table, counts, block coords)
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blk, d), idx_q),
            pl.BlockSpec((1, 1, blk, d), idx_kv),
            pl.BlockSpec((1, 1, blk, d), idx_kv),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((blk, d), jnp.float32),
            pltpu.VMEM((blk, 128), jnp.float32),
            pltpu.VMEM((blk, 128), jnp.float32),
        ],
    )
    res = pl.pallas_call(
        functools.partial(
            _na_fwd_kernel, scale=scale, size=size, window=tuple(window), stride=tuple(stride), with_lse=with_lse,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(jnp.asarray(plan.table), jnp.asarray(plan.counts), jnp.asarray(plan.coords), qt, kt, vt)
    return res if with_lse else (res[0], None)


def _dilation_reorder(x, axis: int, dl: int, inverse: bool = False):
    """Class-major reorder of one axis (source i = m*dl + c  <->  permuted
    n = c*sub + m): a reshape/swap/reshape, never an index-array gather."""
    if dl <= 1:
        return x
    L = x.shape[axis]
    sub = L // dl
    shape = x.shape[:axis] + ((dl, sub) if inverse else (sub, dl)) + x.shape[axis + 1 :]
    x = jnp.swapaxes(x.reshape(shape), axis, axis + 1)
    return x.reshape(x.shape[:axis] + (L,) + x.shape[axis + 2 :])


def _permute_in(x, plan: _Plan):
    """(B, S, heads, D) token-major -> (B, heads, S_pad, D) tiled layout.

    Pure layout transform (dilation reorder, pad to the tile grid, split
    into (tile_h, tile_w, t, ih, iw) order). Pad slots are zero vectors —
    the kernel masks every pad position by COORDS (out-of-bounds t/h/w),
    so pad content is never read through softmax."""
    B, S, Hh, D = x.shape
    T, H, W = plan.size
    x = x.reshape(B, T, H, W, Hh, D)
    for axis, dl in zip((1, 2, 3), plan.dilation):
        x = _dilation_reorder(x, axis, dl)
    x = jnp.pad(
        x,
        (
            (0, 0),
            (0, plan.t_pad - T),
            (0, plan.nth * _TILE_H - H),
            (0, plan.ntw * _TILE_W - W),
            (0, 0),
            (0, 0),
        ),
    )
    x = x.reshape(B, plan.t_pad, plan.nth, _TILE_H, plan.ntw, _TILE_W, Hh, D)
    x = x.transpose(0, 6, 2, 4, 1, 3, 5, 7)  # (B, heads, a, b, t, ih, iw, D)
    return x.reshape(B, Hh, plan.s_pad, D)


def _permute_out(xt, plan: _Plan):
    """(B, heads, S_pad, D) tiled layout -> (B, S, heads, D) token-major
    (exact inverse of _permute_in; pad slots are sliced away)."""
    B, Hh, _, D = xt.shape
    T, H, W = plan.size
    x = xt.reshape(B, Hh, plan.nth, plan.ntw, plan.t_pad, _TILE_H, _TILE_W, D)
    x = x.transpose(0, 4, 2, 5, 3, 6, 1, 7)  # (B, t, a, ih, b, iw, heads, D)
    x = x.reshape(B, plan.t_pad, plan.nth * _TILE_H, plan.ntw * _TILE_W, Hh, D)
    x = x[:, :T, :H, :W]
    for axis, dl in zip((1, 2, 3), plan.dilation):
        x = _dilation_reorder(x, axis, dl, inverse=True)
    return x.reshape(B, T * H * W, Hh, D)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _na(q, k, v, size: VideoSize, window, stride, dilation, block_cap: int):
    plan = _build_plan(size, window, stride, dilation, block_cap)
    qt, kt, vt = (_permute_in(t, plan) for t in (q, k, v))
    out, _ = _na_forward(qt, kt, vt, size, window, stride, plan, with_lse=False)
    return _permute_out(out, plan)


def _na_fwd_rule(q, k, v, size, window, stride, dilation, block_cap):
    plan = _build_plan(size, window, stride, dilation, block_cap)
    qt, kt, vt = (_permute_in(t, plan) for t in (q, k, v))
    out_t, lse = _na_forward(qt, kt, vt, size, window, stride, plan, with_lse=True)
    return _permute_out(out_t, plan), (qt, kt, vt, out_t, lse)


def _na_bwd_rule(size, window, stride, dilation, block_cap, res, g):
    qt, kt, vt, out_t, lse = res
    plan = _build_plan(size, window, stride, dilation, block_cap)
    b, h, s_pad, d = qt.shape
    blk = plan.block
    nblk = s_pad // blk
    scale = 1.0 / np.sqrt(d)

    do_t = _permute_in(g, plan)
    # delta_i = sum_d dO_i * O_i (flash-attention bwd preprocessing)
    delta = jnp.sum(do_t.astype(jnp.float32) * out_t.astype(jnp.float32), axis=-1)[:, :, None, :]

    idx_q = lambda b_, h_, i, j, tab, cnt, co: (b_, h_, i, 0)
    idx_kv = lambda b_, h_, i, j, tab, cnt, co: (b_, h_, tab[i, j], 0)
    idx_row_q = lambda b_, h_, i, j, tab, cnt, co: (b_, h_, 0, i)

    dq_t = pl.pallas_call(
        functools.partial(_na_dq_kernel, scale=scale, size=size, window=tuple(window), stride=tuple(stride)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, h, nblk, plan.table.shape[1]),
            in_specs=[
                pl.BlockSpec((1, 1, blk, d), idx_q),
                pl.BlockSpec((1, 1, blk, d), idx_kv),
                pl.BlockSpec((1, 1, blk, d), idx_kv),
                pl.BlockSpec((1, 1, blk, d), idx_q),
                pl.BlockSpec((1, 1, 1, blk), idx_row_q),
                pl.BlockSpec((1, 1, 1, blk), idx_row_q),
            ],
            out_specs=pl.BlockSpec((1, 1, blk, d), idx_q),
            scratch_shapes=[pltpu.VMEM((blk, d), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s_pad, d), qt.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(
        jnp.asarray(plan.table), jnp.asarray(plan.counts), jnp.asarray(plan.coords),
        qt, kt, vt, do_t, lse, delta,
    )

    idx_kv_direct = lambda b_, h_, i, j, tab, cnt, co: (b_, h_, i, 0)
    idx_q_tab = lambda b_, h_, i, j, tab, cnt, co: (b_, h_, tab[i, j], 0)
    idx_row_q_tab = lambda b_, h_, i, j, tab, cnt, co: (b_, h_, 0, tab[i, j])
    dk_t, dv_t = pl.pallas_call(
        functools.partial(_na_dkv_kernel, scale=scale, size=size, window=tuple(window), stride=tuple(stride)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(b, h, nblk, plan.tableT.shape[1]),
            in_specs=[
                pl.BlockSpec((1, 1, blk, d), idx_q_tab),
                pl.BlockSpec((1, 1, blk, d), idx_kv_direct),
                pl.BlockSpec((1, 1, blk, d), idx_kv_direct),
                pl.BlockSpec((1, 1, blk, d), idx_q_tab),
                pl.BlockSpec((1, 1, 1, blk), idx_row_q_tab),
                pl.BlockSpec((1, 1, 1, blk), idx_row_q_tab),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, blk, d), idx_kv_direct),
                pl.BlockSpec((1, 1, blk, d), idx_kv_direct),
            ],
            scratch_shapes=[pltpu.VMEM((blk, d), jnp.float32), pltpu.VMEM((blk, d), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, h, s_pad, d), kt.dtype),
            jax.ShapeDtypeStruct((b, h, s_pad, d), vt.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(
        jnp.asarray(plan.tableT), jnp.asarray(plan.countsT), jnp.asarray(plan.coords),
        qt, kt, vt, do_t, lse, delta,
    )

    # pad slots carry no true gradient (their compute is fully masked), so
    # the inverse layout transform over the real slots is the exact input
    # gradient.
    return _permute_out(dq_t, plan), _permute_out(dk_t, plan), _permute_out(dv_t, plan)


_na.defvjp(_na_fwd_rule, _na_bwd_rule)


def _na_forward_gathered_xla(qt, kt, vt, size: VideoSize, window, stride, plan: _Plan):
    """Gathered block-sparse NA on permuted (B, H, S_pad, D) tensors as
    pure XLA: for each query block, gather its kv blocks from the
    host-built table and run a masked dense attention over just those.

    Same structure the Pallas kernel executes (same plan/table/coords,
    same ``_axis_window_ok`` membership math on the same bit-decomposed
    intra-block coordinates), but lowered as take + einsum inside a
    ``lax.map`` over query blocks. Each block is ``jax.checkpoint``ed so
    the backward pass recomputes its gathered kv and probabilities
    instead of saving them — memory stays O(block x gathered_window) for
    fwd AND bwd. dK/dV accumulate through the VJP of ``jnp.take``
    (scatter-add), replacing the Pallas path's transposed-table kernel.
    """
    b, h, s_pad, d = qt.shape
    blk = plan.block
    nblk = s_pad // blk
    max_cnt = plan.table.shape[1]
    scale = 1.0 / np.sqrt(d)
    table = jnp.asarray(plan.table)
    counts = jnp.asarray(plan.counts)
    coords = jnp.asarray(plan.coords)

    qb = qt.reshape(b, h, nblk, blk, d)
    kb = kt.reshape(b, h, nblk, blk, d)
    vb = vt.reshape(b, h, nblk, blk, d)

    # intra-block coordinate bit math (same as _pair_mask: 64 = 2^6 tokens
    # per t-slice of a 4x16 tile)
    intra = jnp.arange(blk, dtype=jnp.int32)
    it, ih_, iw_ = intra >> 6, (intra & 63) >> 4, intra & 15

    @jax.checkpoint
    def one_block(i):
        tab = table[i]  # (max_cnt,)
        gk = jnp.take(kb, tab, axis=2)  # (b, h, max_cnt, blk, d)
        gv = jnp.take(vb, tab, axis=2)
        s = jnp.einsum("bhqd,bhmkd->bhqmk", qb[:, :, i], gk, preferred_element_type=jnp.float32) * scale

        cq = coords[i]  # (3,)
        tq, hq, wq = cq[0] + it, cq[1] + ih_, cq[2] + iw_  # (blk,)
        ck = coords[tab]  # (max_cnt, 3)
        tk = ck[:, 0:1] + it[None, :]  # (max_cnt, blk)
        hk = ck[:, 1:2] + ih_[None, :]
        wk = ck[:, 2:3] + iw_[None, :]
        # pad slots (beyond the real video) are never keys; duplicate
        # table padding entries (j >= counts[i]) are dropped the same way
        # the kernel's @pl.when(j < cnt) guard drops them.
        valid = (tk < size.T) & (hk < size.H) & (wk < size.W)
        valid = valid & (jnp.arange(max_cnt, dtype=jnp.int32)[:, None] < counts[i])
        mask = jnp.broadcast_to(valid[None, :, :], (blk, max_cnt, blk))
        for (ci, cj, length, w_, st_) in (
            (tq, tk, size.T, window[0], stride[0]),
            (hq, hk, size.H, window[1], stride[1]),
            (wq, wk, size.W, window[2], stride[2]),
        ):
            ok = _axis_window_ok(ci[:, None, None], cj[None, :, :], length, w_, st_)
            if ok is not None:
                mask = mask & ok
        # fully-masked rows (pad query blocks) stay FINITE (-1e30, not
        # -inf): softmax degrades to uniform garbage that _permute_out
        # slices away, and the zero-padded dO keeps it out of gradients.
        s = jnp.where(mask, s, _NEG_INF)
        p = jax.nn.softmax(s.reshape(b, h, blk, max_cnt * blk), axis=-1)
        out = jnp.einsum(
            "bhqk,bhkd->bhqd",
            p.astype(gv.dtype),
            gv.reshape(b, h, max_cnt * blk, d),
            preferred_element_type=jnp.float32,
        )
        return out.astype(qt.dtype)  # (b, h, blk, d)

    outs = jax.lax.map(one_block, jnp.arange(nblk, dtype=jnp.int32))  # (nblk, b, h, blk, d)
    return outs.transpose(1, 2, 0, 3, 4).reshape(b, h, s_pad, d)


def neighborhood_attention_gathered(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    video_size: VideoSize,
    window: tuple[int, int, int],
    block_q: int = 512,
    stride: tuple[int, int, int] = (1, 1, 1),
    dilation: tuple[int, int, int] = (1, 1, 1),
) -> jax.Array:
    """Backend-portable gathered block-sparse NA. q,k,v: (B, S, H, D).

    Numerics and supported geometry match :func:`neighborhood_attention`
    (they share the plan, permutation, and membership math); execution is
    pure XLA, so it runs on CPU/GPU and under the virtual mesh where the
    Pallas kernel cannot. Linear FLOPs in S — at the 720p production
    geometry (84,480 tokens) the dense reference path would materialize
    228 GB of logits; this path peaks at tens of MB per query block.
    Differentiable via per-block rematerialization.
    """
    b, s_len, h, d = q.shape
    size = VideoSize(*video_size)
    assert s_len == size.T * size.H * size.W, (s_len, size)
    for w_, st_, ln in zip(window, stride, size):
        assert st_ >= 1 and (w_ < 0 or st_ <= w_ or st_ <= 1), (
            f"stride {stride} must be <= window {window}")
    try:
        eff_window, eff_stride = _effective_params(size, tuple(window), tuple(stride), tuple(dilation))
    except NotImplementedError:
        logits_gib = b * h * s_len * s_len * 4 / 2**30
        if logits_gib > 2.0:
            raise
        return neighborhood_attention_reference(q, k, v, size, window, stride, dilation)
    plan = _build_plan(size, tuple(eff_window), tuple(eff_stride), tuple(dilation), int(block_q))
    qt, kt, vt = (_permute_in(t, plan) for t in (q, k, v))
    out = _na_forward_gathered_xla(qt, kt, vt, size, eff_window, eff_stride, plan)
    return _permute_out(out, plan)


def neighborhood_attention_auto(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    video_size: VideoSize,
    window: tuple[int, int, int],
    stride: tuple[int, int, int] = (1, 1, 1),
    dilation: tuple[int, int, int] = (1, 1, 1),
) -> jax.Array:
    """Backend dispatch for NA — the single entry call sites should use.

    TPU -> the Pallas kernel; elsewhere big shapes (>2^27 logit elements,
    the same threshold as ops/attention's auto dispatch) -> the gathered
    block-sparse XLA executor, small shapes -> the dense masked reference
    (exact, and cheaper than plan construction at toy sizes).
    """
    size = VideoSize(*video_size)
    if jax.default_backend() == "tpu":
        return neighborhood_attention(q, k, v, size, window, stride=stride, dilation=dilation)
    if q.shape[1] * k.shape[1] * q.shape[2] > (1 << 27):
        return neighborhood_attention_gathered(q, k, v, size, window, stride=stride, dilation=dilation)
    return neighborhood_attention_reference(q, k, v, size, window, stride, dilation)


def _effective_params(size: VideoSize, window, stride, dilation):
    """Map dilated parameters onto the class-major reordered axes.

    The kernel supports the case every reference dilated config uses
    (sparse_14B.py:30-41 after adaptive scaling): dilation divides the
    axis and the window covers the whole sub-grid, which makes attention
    block-diagonal over dilation classes — expressed as stride==window
    blocked GNA on the reordered axis. General small-window dilation runs
    through the reference path."""
    ew, es = [], []
    for L, w_, st_, dl in zip(size, window, stride, dilation):
        if dl <= 1:
            ew.append(w_)
            es.append(st_)
            continue
        if L % dl != 0:
            raise NotImplementedError(f"dilation {dl} must divide axis length {L}")
        sub = L // dl
        if 0 <= w_ < sub:
            raise NotImplementedError(
                f"dilated window {w_} < sub-grid {sub}: use neighborhood_attention_reference"
            )
        ew.append(sub)
        es.append(sub)
    return tuple(ew), tuple(es)


def neighborhood_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    video_size: VideoSize,
    window: tuple[int, int, int],
    block_q: int = 512,
    block_kv: int = 512,  # kept for API compat; blocks are symmetric
    stride: tuple[int, int, int] = (1, 1, 1),
    dilation: tuple[int, int, int] = (1, 1, 1),
) -> jax.Array:
    """Pallas 3D neighborhood attention. q,k,v: (B, S, H, D), S = T*H*W.

    Differentiable: a custom VJP recomputes probabilities from the saved
    logsumexp over the same gathered block-sparse structure (dK/dV iterate
    the exact transpose of the forward table), so sparse attention works in
    training like the reference's NATTEN path
    (minimal_v4_dit.py:1743-1813)."""
    del block_kv
    b, s_len, h, d = q.shape
    size = VideoSize(*video_size)
    assert s_len == size.T * size.H * size.W, (s_len, size)
    for w_, st_, ln in zip(window, stride, size):
        assert st_ >= 1 and (w_ < 0 or st_ <= w_ or st_ <= 1), (
            f"stride {stride} must be <= window {window} (reference "
            f"neighborhood_attn.py:168 asserts w >= s)")
    try:
        eff_window, eff_stride = _effective_params(size, tuple(window), tuple(stride), tuple(dilation))
    except NotImplementedError as e:
        # Unsupported dilation geometry (non-divisor dilation or a dilated
        # window smaller than the sub-grid): degrade gracefully to the
        # dense masked reference implementation — correct at any geometry,
        # but it materializes (B, H, S, S) f32 logits, so it is only a
        # *graceful* degradation while that buffer is small. At production
        # sequence lengths the fallback would be a guaranteed OOM minutes
        # into compilation; surface the clear error up front instead.
        logits_gib = b * h * s_len * s_len * 4 / 2**30
        if logits_gib > 2.0:
            raise NotImplementedError(
                f"{e} — and the dense fallback would need {logits_gib:.1f} GiB "
                f"of masked logits at S={s_len}; adjust natten window/dilation "
                f"to a supported geometry (divisor dilation, window >= sub-grid)"
            ) from e
        return neighborhood_attention_reference(q, k, v, size, window, stride, dilation)
    return _na(q, k, v, size, eff_window, eff_stride, tuple(dilation), int(block_q))
