"""Pallas TPU flash attention (forward + backward), written for the Cosmos
video DiT: non-causal, no attention mask, head_dim 128, sequence lengths in
the 10k-100k range (720p video => 24*44*80 ~ 84k tokens).

Replaces the reference's flash-attn-2/3 + TransformerEngine DotProductAttention
CUDA path (cosmos_predict2/_src/predict2/networks/attention.py:90-181,
minimal_v4_dit.py:355-369). Online-softmax tiling keeps the S x S score
matrix out of HBM; fp32 accumulation on the MXU; bf16 inputs.

Layout: kernels work in BHSD; the public wrapper takes BSHD (the DiT's
native layout) and transposes, which XLA fuses with neighbouring reshapes.

Backward follows the FlashAttention-2 scheme: a dq kernel (grid over q
blocks, reduction over kv blocks) and a dkv kernel (grid over kv blocks,
reduction over q blocks), both recomputing probabilities from the saved
row-wise logsumexp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# swept on v5e at seq 8320 (see scripts/fa_sweep2.py): padding waste
# dominates block choice — 8320 pads to 9216 at block 1024 (23% wasted MXU
# work). Auto-picked divisor blocks 640/1664 reach 91.3 TF/s vs 79.7 at
# 1024/1024; 2048/2048 overflows VMEM. Pass block_q/block_kv explicitly to
# override the auto pick.
DEFAULT_BLOCK_Q = None  # auto: minimal padding, target ~640
DEFAULT_BLOCK_KV = None  # auto: minimal padding, target ~1664
_NEG_INF = -1e30


def _pick_block(seq: int, preferred: int | None) -> int:
    """Resolve a block size. ``preferred=None`` auto-picks the multiple of
    128 that minimizes sequence padding (ties -> closest to the swept
    sweet spot); an explicit int is honored (clamped for short seqs)."""
    if seq < 128:
        return 128
    if preferred is not None:
        return preferred if seq >= preferred else max(128, (seq // 128) * 128)
    return _auto_block(seq, target=640, hi=1024)


def _auto_block(seq: int, target: int, hi: int) -> int:
    cands = range(256, min(hi, max(256, (seq // 128) * 128)) + 1, 128)
    return min(cands, key=lambda b: (-(-seq // b) * b, abs(b - target)))


def _auto_blocks(sq: int, skv: int, block_q: int | None, block_kv: int | None) -> tuple[int, int]:
    """Resolve the (block_q, block_kv) pair, keeping the fp32 score tile
    under ~6 MB of VMEM."""
    # short-kv (cross-attention): fewer, larger q steps amortize the per-
    # grid-step overhead (512-kv sweep: bq 1664 beats 640 by ~4%)
    q_target, q_hi = (1664, 2048) if skv <= 1024 else (640, 1024)
    bq = _auto_block(sq, target=q_target, hi=q_hi) if block_q is None and sq >= 256 else _pick_block(sq, block_q)
    bkv = _auto_block(skv, target=1664, hi=2048) if block_kv is None and skv >= 256 else _pick_block(skv, block_kv)
    while bq * bkv > 1_572_864:
        if bkv >= bq:
            bkv = max(256, (bkv // 2 // 128) * 128)
        else:
            bq = max(256, (bq // 2 // 128) * 128)
    return bq, bkv


def _pad_seq(x: jax.Array, block: int, axis: int) -> jax.Array:
    seq = x.shape[axis]
    rem = seq % block
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, block - rem)
    return jnp.pad(x, pad)


# ------------------------------- forward -------------------------------


def _frame_block_mask(s_shape, iq, ik, block_q, block_kv, frame_group: int):
    """Additive-style boolean mask for frame-block causality: token j may
    attend token i iff (i // frame_group) <= (j // frame_group)."""
    row = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, s_shape, 0)
    col = ik * block_kv + jax.lax.broadcasted_iota(jnp.int32, s_shape, 1)
    return (col // frame_group) <= (row // frame_group)


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, acc, m_scr, l_scr,
    *, scale: float, kv_len: int, block_q: int, block_kv: int, frame_group: int,
):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    # frame-causal: skip kv blocks that lie entirely after the last frame
    # group visible to any row of this q block.
    if frame_group > 0:
        q_last = iq * block_q + block_q - 1
        max_visible = (q_last // frame_group) * frame_group + frame_group  # exclusive
        run_block = (ik * block_kv) < max_visible
    else:
        run_block = True

    @pl.when(run_block)
    def _compute():
        q = q_ref[0, 0]  # (bq, d)
        k = k_ref[0, 0]  # (bk, d)
        v = v_ref[0, 0]  # (bk, d)

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, bk)
        s = s * scale

        if kv_len % block_kv != 0:
            col = ik * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        if frame_group > 0:
            s = jnp.where(_frame_block_mask(s.shape, iq, ik, block_q, block_kv, frame_group), s, _NEG_INF)

        m_prev = m_scr[:, :1]  # (bq, 1)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # (bq, bk) f32
        corr = jnp.exp(m_prev - m_new)  # (bq, 1)
        l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)

        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # (bq, d)
        acc[:] = acc[:] * corr + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == n_kv - 1)
    def _finalize():
        l = l_scr[:, :1]
        o_ref[0, 0] = (acc[:] / l).astype(o_ref.dtype)
        lse_ref[0, 0] = (m_scr[:, 0] + jnp.log(l[:, 0]))[None, :]


def _fwd(
    q: jax.Array, k: jax.Array, v: jax.Array, block_q: int, block_kv: int, frame_group: int = 0
) -> tuple[jax.Array, jax.Array]:
    """q,k,v: (B, H, S, D) -> (out (B,H,Sq,D), lse (B,H,Sq))."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    scale = 1.0 / (d**0.5)
    block_q, block_kv = _auto_blocks(sq, skv, block_q, block_kv)

    qp = _pad_seq(q, block_q, 2)
    kp = _pad_seq(k, block_kv, 2)
    vp = _pad_seq(v, block_kv, 2)
    sq_p, skv_p = qp.shape[2], kp.shape[2]
    n_q, n_kv = sq_p // block_q, skv_p // block_kv

    grid = (b, h, n_q, n_kv)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, kv_len=skv, block_q=block_q, block_kv=block_kv, frame_group=frame_group
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, iq, ik: (b_, h_, 0, iq)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, 1, sq_p), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_p * skv_p * d,
            bytes_accessed=(qp.size + kp.size + vp.size + out_sz(b, h, sq_p, d)) * 2,
            transcendentals=b * h * sq_p * skv_p,
        ),
    )(qp, kp, vp)
    return out[:, :, :sq], lse[:, :, 0, :sq]


def out_sz(b, h, s, d):
    return b * h * s * d


# ------------------------- kv-cache forward (decode) -------------------------


def _fwd_cache_kernel(
    kv_valid_ref, q_ref, k_ref, v_ref, o_ref, acc, m_scr, l_scr,
    *, scale: float, block_kv: int,
):
    """Streaming-decode attention over a ring buffer: only the first
    ``kv_valid`` (dynamic, SMEM) kv positions are visible. Blocks past the
    frontier are skipped entirely — steady-state cost tracks the fill level,
    not the buffer capacity."""
    ik = pl.program_id(3)
    n_kv = pl.num_programs(3)
    kv_valid = kv_valid_ref[0]

    @pl.when(ik == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    @pl.when(ik * block_kv < kv_valid)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
        col = ik * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_valid, s, _NEG_INF)

        m_prev = m_scr[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        acc[:] = acc[:] * corr + pv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == n_kv - 1)
    def _finalize():
        o_ref[0, 0] = (acc[:] / l_scr[:, :1]).astype(o_ref.dtype)


def _kv_cache_reference(q, k_buf, v_buf, kv_valid):
    """Differentiable masked-softmax reference for the kv-cache kernel.
    q is BSHD; the ring buffers are HEAD-MAJOR (B, H, S_max, D) — see
    flash_attention_kv_cache. Materializes the (B, H, Sq, S_max) score
    matrix — fine at the self-forcing TRAINING geometries, which is the
    only consumer of its gradient; inference uses the Pallas forward."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bqhd,bhkd->bhqk", q, k_buf, preferred_element_type=jnp.float32) * scale
    visible = jnp.arange(k_buf.shape[2])[None, None, None, :] < kv_valid
    logits = jnp.where(visible, logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bqhd", probs.astype(v_buf.dtype), v_buf, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


@jax.custom_vjp
def flash_attention_kv_cache(q, k_buf, v_buf, kv_valid):
    """Flash attention for KV-cache streaming decode.

    q: (B, Sq, H, D) new-block queries; k_buf/v_buf: (B, H, S_max, D)
    HEAD-MAJOR ring buffers; kv_valid: dynamic count of filled kv positions
    (<= S_max). The buffers are stored head-major so the kernel consumes
    them with NO relayout — the former (B, S, H, D) layout forced XLA to
    materialize a transposed copy of the FULL cache on every call (~0.5 ms
    at 720p cache-16, 112 calls per interactive block step); the appended
    new block is the only thing transposed now (small).
    Replaces the materialized masked-softmax einsum the cache path would
    otherwise need (at 720p cache-16 that einsum's f32 score matrix is
    6.66 GB — bigger than the whole 2B model). Differentiable: the VJP
    recomputes through the masked-softmax reference, so the self-forcing
    rollout (which differentiates forward_with_cache) trains on TPU; only
    the backward materializes scores, and only at training geometries.
    """
    return _flash_kv_cache_impl(q, k_buf, v_buf, kv_valid)


def _flash_kv_cache_fwd(q, k_buf, v_buf, kv_valid):
    return _flash_kv_cache_impl(q, k_buf, v_buf, kv_valid), (q, k_buf, v_buf, kv_valid)


def _flash_kv_cache_bwd(res, do):
    q, k_buf, v_buf, kv_valid = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _kv_cache_reference(q_, k_, v_, kv_valid), q, k_buf, v_buf)
    dq, dk, dv = vjp(do)
    return dq, dk, dv, None


flash_attention_kv_cache.defvjp(_flash_kv_cache_fwd, _flash_kv_cache_bwd)


# ---------------- row-banded windowed kv-cache forward (decode) ----------------
#
# Sparse cache-window attention for the interactive causal student: each
# query attends, in EVERY cached frame (full temporal context), only to kv
# tokens whose spatial ROW lies in a NATTEN-style clamped window of
# ``window_rows`` rows around the query's own row. A TPU-native analogue of
# running the production GNA sparsity inside the streaming KV-cache loop
# (VERDICT r4 #5; reference sparse recipe sparse_2B.py:326 + the streaming
# ActionStreamingInference cache loop action_video2world_streaming.py:90-297
# compose this way on TPU). Cuts cache-attention FLOPs by ~gh/window_rows
# (3.1x at 352x640 with the production-scaled 7-row window) — a supported
# beyond-parity config for the distilled student, like DMD2+sparse.


def _window_start(y, wh: int, gh: int):
    """First visible row for query row y: clamped, exactly wh rows visible."""
    return jnp.clip(y - (wh - 1) // 2, 0, gh - wh)


def _kv_cache_window_reference(q, k_buf, v_buf, kv_valid, grid_hw, window_rows: int):
    """Masked-dense reference (and the VJP recompute path) for
    flash_attention_kv_cache_window. q: (B, Sq, H, D) with Sq = nb*gh*gw
    row-major (frame, row, col); k_buf/v_buf: (B, H, S_max, D) head-major,
    S_max a multiple of gh*gw."""
    gh, gw = grid_hw
    F = gh * gw
    sq, s_max = q.shape[1], k_buf.shape[2]
    assert sq % F == 0 and s_max % F == 0, (sq, s_max, F)
    wh = min(window_rows, gh)
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bqhd,bhkd->bhqk", q, k_buf, preferred_element_type=jnp.float32) * scale
    s_idx = jnp.arange(s_max)
    yk = (s_idx % F) // gw
    yq = (jnp.arange(sq) % F) // gw
    start = _window_start(yq, wh, gh)
    vis = (
        (yk[None, :] >= start[:, None])
        & (yk[None, :] < (start + wh)[:, None])
        & (s_idx[None, :] < kv_valid)
    )
    logits = jnp.where(vis[None, None], logits, _NEG_INF)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bqhd", probs.astype(v_buf.dtype), v_buf, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _window_bands(gh: int, wh: int, band_rows: int) -> tuple[int, list[int], int]:
    """(rows per band rb, slab start row per band, slab rows): static band
    geometry. Each band of rb consecutive query rows reads one contiguous
    slab of ``slab`` kv rows per frame that covers the clamped wh-row
    window of every row in the band (start is 1-Lipschitz, so the union of
    the band's windows spans at most wh + rb - 1 rows).

    Bands are fully unrolled in the kernel body, so rb is raised (to a
    divisor of gh) until there are at most ~12 bands per frame — 22
    unrolled bands at the 720p grid (gh=44) overran the environment's
    remote compile helper, measured live; the compute-ratio cost of the
    wider band is small (slab grows by rb-1 rows)."""
    rb = band_rows if gh % band_rows == 0 else 1
    while gh // rb > 12:
        rb = next((r for r in range(rb + 1, gh + 1) if gh % r == 0), gh)
    slab = min(gh, wh + rb - 1)
    sbs = []
    for r0 in range(0, gh, rb):
        s0 = min(max(r0 - (wh - 1) // 2, 0), gh - wh)  # start(r0)
        sbs.append(min(s0, gh - slab))
    return rb, sbs, slab


def _fwd_cache_window_kernel(
    kv_valid_ref, q_ref, k_hbm, v_hbm, o_ref, acc, m_scr, l_scr, kbuf, vbuf, sems,
    *, scale: float, F: int, gh: int, gw: int, wh: int, rb: int, sbs: tuple, slab: int, nb: int,
):
    """grid (B, H, T_max): for one (batch, head), stream the cache frame by
    frame (each frame's (F, D) kv slice DMA'd once, double-buffered) and
    run every query band's online-softmax update against its static row
    slab of the frame. Query bands / kv slabs are static slices, so the
    MXU sees (rb*gw, D) x (D, slab*gw) matmuls with no gather."""
    b = pl.program_id(0)
    h = pl.program_id(1)
    f = pl.program_id(2)
    n_f = pl.num_programs(2)
    kv_valid = kv_valid_ref[0]

    def copies(f_, slot):
        return (
            pltpu.make_async_copy(k_hbm.at[b, h, pl.ds(f_ * F, F)], kbuf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(v_hbm.at[b, h, pl.ds(f_ * F, F)], vbuf.at[slot], sems.at[slot, 1]),
        )

    @pl.when(f == 0)
    def _():
        for c in copies(0, 0):
            c.start()

    @pl.when(f + 1 < n_f)
    def _():
        for c in copies(f + 1, (f + 1) % 2):
            c.start()

    for c in copies(f, f % 2):
        c.wait()

    @pl.when(f == 0)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    @pl.when(f * F < kv_valid)
    def _compute():
        kf = kbuf[f % 2]  # (F, D)
        vf = vbuf[f % 2]
        bq = rb * gw
        st = slab * gw
        bands_per_frame = gh // rb
        for band in range(nb * bands_per_frame):
            r0 = (band % bands_per_frame) * rb
            sb = sbs[band % bands_per_frame]
            q_band = q_ref[0, 0, band * bq : (band + 1) * bq, :]  # (bq, D)
            k_slab = kf[sb * gw : sb * gw + st, :]  # (st, D)
            v_slab = vf[sb * gw : sb * gw + st, :]
            s = (
                jax.lax.dot_general(
                    q_band, k_slab, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
                * scale
            )  # (bq, st)
            yq = r0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) // gw
            start_q = jnp.clip(yq - (wh - 1) // 2, 0, gh - wh)
            jj = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            yk = sb + jj // gw
            vis = (yk >= start_q) & (yk < start_q + wh) & (f * F + sb * gw + jj < kv_valid)
            s = jnp.where(vis, s, _NEG_INF)

            m_prev = m_scr[band * bq : (band + 1) * bq, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m_prev - m_new)
            l_new = l_scr[band * bq : (band + 1) * bq, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_slab.dtype), v_slab, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            acc[band * bq : (band + 1) * bq, :] = acc[band * bq : (band + 1) * bq, :] * corr + pv
            m_scr[band * bq : (band + 1) * bq, :] = jnp.broadcast_to(m_new, (bq, m_scr.shape[1]))
            l_scr[band * bq : (band + 1) * bq, :] = jnp.broadcast_to(l_new, (bq, l_scr.shape[1]))

    @pl.when(f == n_f - 1)
    def _finalize():
        o_ref[0, 0] = (acc[:] / l_scr[:, :1]).astype(o_ref.dtype)


def _flash_kv_cache_window_impl(q, k_buf, v_buf, kv_valid, grid_hw, window_rows: int, band_rows: int):
    gh, gw = grid_hw
    F = gh * gw
    b, sq, h, d = q.shape
    s_max = k_buf.shape[2]
    assert sq % F == 0 and s_max % F == 0, (sq, s_max, F)
    assert gw % 8 == 0, f"token-grid width {gw} must be sublane-aligned"
    nb = sq // F
    wh = min(window_rows, gh)
    rb, sbs, slab = _window_bands(gh, wh, band_rows)
    qt = q.transpose(0, 2, 1, 3)  # (B, H, Sq, D) — small
    valid = jnp.asarray(kv_valid, jnp.int32).reshape((1,))
    t_max = s_max // F

    out = pl.pallas_call(
        functools.partial(
            _fwd_cache_window_kernel,
            scale=1.0 / (d**0.5), F=F, gh=gh, gw=gw, wh=wh, rb=rb, sbs=tuple(sbs), slab=slab, nb=nb,
        ),
        grid=(b, h, t_max),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, sq, d), lambda b_, h_, f_: (b_, h_, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # k_buf stays in HBM, manual frame DMA
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, sq, d), lambda b_, h_, f_: (b_, h_, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((sq, d), jnp.float32),
            pltpu.VMEM((sq, 128), jnp.float32),
            pltpu.VMEM((sq, 128), jnp.float32),
            pltpu.VMEM((2, F, d), k_buf.dtype),
            pltpu.VMEM((2, F, d), v_buf.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            # the 720p geometry's scratch (acc/m/l at Sq=3520 + the frame
            # ring + unrolled band temporaries) needs ~25 MB of scoped
            # VMEM — the 16 MB default rejects it at compile time
            vmem_limit_bytes=64 * 2**20,
        ),
    )(valid, qt, k_buf, v_buf)
    return out.transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention_kv_cache_window(
    q, k_buf, v_buf, kv_valid, grid_hw: tuple[int, int], window_rows: int, band_rows: int = 2
):
    """Row-banded sparse KV-cache attention (see section comment above).

    q: (B, Sq, H, D), Sq = nb*gh*gw row-major (frame, row, col);
    k_buf/v_buf: (B, H, S_max, D) head-major ring buffers whose S axis is
    whole (gh*gw)-token frames; kv_valid: filled tokens (frame-granular).
    grid_hw = (gh, gw) token grid per frame; window_rows = visible kv rows
    per query (NATTEN-clamped around the query's row, full columns, all
    cached frames). Differentiable via the masked-dense reference (the
    self-forcing student trains with the same sparsity it streams with).
    """
    if jax.default_backend() == "tpu":
        return _flash_kv_cache_window_impl(q, k_buf, v_buf, kv_valid, grid_hw, window_rows, band_rows)
    return _kv_cache_window_reference(q, k_buf, v_buf, kv_valid, grid_hw, window_rows)


def _flash_kv_cache_window_fwd(q, k_buf, v_buf, kv_valid, grid_hw, window_rows, band_rows):
    out = flash_attention_kv_cache_window(q, k_buf, v_buf, kv_valid, grid_hw, window_rows, band_rows)
    return out, (q, k_buf, v_buf, kv_valid)


def _flash_kv_cache_window_bwd(grid_hw, window_rows, band_rows, res, do):
    q, k_buf, v_buf, kv_valid = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _kv_cache_window_reference(q_, k_, v_, kv_valid, grid_hw, window_rows),
        q, k_buf, v_buf,
    )
    dq, dk, dv = vjp(do)
    return dq, dk, dv, None


flash_attention_kv_cache_window.defvjp(_flash_kv_cache_window_fwd, _flash_kv_cache_window_bwd)


def _flash_kv_cache_impl(
    q: jax.Array, k_buf: jax.Array, v_buf: jax.Array, kv_valid: jax.Array | int
) -> jax.Array:
    qt = q.transpose(0, 2, 1, 3)
    kt = k_buf  # head-major (B, H, S_max, D): consumed with no relayout
    vt = v_buf
    b, h, sq, d = qt.shape
    skv = kt.shape[2]
    scale = 1.0 / (d**0.5)
    block_q, block_kv = _auto_blocks(sq, skv, None, None)

    qp = _pad_seq(qt, block_q, 2)
    kp = _pad_seq(kt, block_kv, 2)
    vp = _pad_seq(vt, block_kv, 2)
    sq_p, skv_p = qp.shape[2], kp.shape[2]
    grid = (b, h, sq_p // block_q, skv_p // block_kv)
    valid = jnp.asarray(kv_valid, jnp.int32).reshape((1,))

    out = pl.pallas_call(
        functools.partial(_fwd_cache_kernel, scale=scale, block_kv=block_kv),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(valid, qp, kp, vp)
    return out[:, :, :sq].transpose(0, 2, 1, 3)


# ------------------------------- backward -------------------------------


def _dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, dq_acc,
    *, scale, kv_len, block_q, block_kv, frame_group,
):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    if frame_group > 0:
        q_last = iq * block_q + block_q - 1
        max_visible = (q_last // frame_group) * frame_group + frame_group
        run_block = (ik * block_kv) < max_visible
    else:
        run_block = True

    @pl.when(run_block)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]  # (1, bq)
        delta = delta_ref[0, 0]  # (1, bq)

        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
        if kv_len % block_kv != 0:
            col = ik * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        if frame_group > 0:
            s = jnp.where(_frame_block_mask(s.shape, iq, ik, block_q, block_kv, frame_group), s, _NEG_INF)
        p = jnp.exp(s - lse[0][:, None])  # (bq, bk)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta[0][:, None])  # (bq, bk) f32
        dq_acc[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(ik == n_kv - 1)
    def _finalize():
        dq_ref[0, 0] = (dq_acc[:] * scale).astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, dk_acc, dv_acc,
    *, scale, kv_len, block_q, block_kv, frame_group,
):
    ikv = pl.program_id(2)
    iq = pl.program_id(3)
    n_q = pl.num_programs(3)

    @pl.when(iq == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    # frame-causal: q blocks entirely before this kv block see none of it
    if frame_group > 0:
        kv_first = ikv * block_kv
        min_q = (kv_first // frame_group) * frame_group  # first q that can see kv_first
        run_block = (iq * block_q + block_q - 1) >= min_q
    else:
        run_block = True

    @pl.when(run_block)
    def _compute():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]
        delta = delta_ref[0, 0]

        # s^T computed directly as (bk, bq)
        st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
        if kv_len % block_kv != 0:
            row = ikv * block_kv + jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
            st = jnp.where(row < kv_len, st, _NEG_INF)
        if frame_group > 0:
            row = ikv * block_kv + jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)  # kv idx
            col = iq * block_q + jax.lax.broadcasted_iota(jnp.int32, st.shape, 1)  # q idx
            st = jnp.where((row // frame_group) <= (col // frame_group), st, _NEG_INF)
        pt = jnp.exp(st - lse[0][None, :])  # (bk, bq)
        dv_acc[:] += jax.lax.dot_general(
            pt.astype(do.dtype), do, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dpt = jax.lax.dot_general(v, do, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)  # (bk, bq)
        dst = pt * (dpt - delta[0][None, :])
        dk_acc[:] += jax.lax.dot_general(
            dst.astype(q.dtype), q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    @pl.when(iq == n_q - 1)
    def _finalize():
        dk_ref[0, 0] = (dk_acc[:] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    out: jax.Array,
    lse: jax.Array,
    do: jax.Array,
    block_q: int,
    block_kv: int,
    frame_group: int = 0,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    b, h, sq, d = q.shape
    skv = k.shape[2]
    scale = 1.0 / (d**0.5)
    block_q, block_kv = _auto_blocks(sq, skv, block_q, block_kv)

    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (B,H,S)

    qp = _pad_seq(q, block_q, 2)
    kp = _pad_seq(k, block_kv, 2)
    vp = _pad_seq(v, block_kv, 2)
    dop = _pad_seq(do, block_q, 2)
    sq_p, skv_p = qp.shape[2], kp.shape[2]
    # pad lse with +inf so padded q rows give p=exp(-inf)=0
    lsep = jnp.pad(lse, ((0, 0), (0, 0), (0, sq_p - sq)), constant_values=jnp.inf)[:, :, None, :]
    deltap = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_p - sq)))[:, :, None, :]
    n_q, n_kv = sq_p // block_q, skv_p // block_kv

    dq = pl.pallas_call(
        functools.partial(
            _dq_kernel, scale=scale, kv_len=skv, block_q=block_q, block_kv=block_kv, frame_group=frame_group
        ),
        grid=(b, h, n_q, n_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, iq, ik: (b_, h_, 0, iq)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, iq, ik: (b_, h_, 0, iq)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp, dop, lsep, deltap)

    dk, dv = pl.pallas_call(
        functools.partial(
            _dkv_kernel, scale=scale, kv_len=skv, block_q=block_q, block_kv=block_kv, frame_group=frame_group
        ),
        grid=(b, h, n_kv, n_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, ik, iq: (b_, h_, iq, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_, ik, iq: (b_, h_, ik, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_, ik, iq: (b_, h_, ik, 0)),
            pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, ik, iq: (b_, h_, iq, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, ik, iq: (b_, h_, 0, iq)),
            pl.BlockSpec((1, 1, 1, block_q), lambda b_, h_, ik, iq: (b_, h_, 0, iq)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_, ik, iq: (b_, h_, ik, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_, ik, iq: (b_, h_, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, skv_p, d), k.dtype),
            jax.ShapeDtypeStruct((b, h, skv_p, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
    )(qp, kp, vp, dop, lsep, deltap)

    return dq[:, :, :sq], dk[:, :, :skv], dv[:, :, :skv]


# ------------------------------- public API -------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_bhsd(q, k, v, block_q=DEFAULT_BLOCK_Q, block_kv=DEFAULT_BLOCK_KV, frame_group=0):
    out, _ = _fwd(q, k, v, block_q, block_kv, frame_group)
    return out


def _flash_bhsd_fwd(q, k, v, block_q, block_kv, frame_group):
    out, lse = _fwd(q, k, v, block_q, block_kv, frame_group)
    return out, (q, k, v, out, lse)


def _flash_bhsd_bwd(block_q, block_kv, frame_group, res, do):
    q, k, v, out, lse = res
    dq, dk, dv = _bwd(q, k, v, out, lse, do, block_q, block_kv, frame_group)
    return dq, dk, dv


_flash_bhsd.defvjp(_flash_bhsd_fwd, _flash_bhsd_bwd)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int | None = DEFAULT_BLOCK_Q,
    block_kv: int | None = DEFAULT_BLOCK_KV,
    frame_group: int = 0,
) -> jax.Array:
    """Flash attention in BSHD layout: q,k,v (B, S, H, D) -> (B, Sq, H, D).

    frame_group > 0 enables frame-block causal masking (the interactive
    CausalDIT mask, interactive/networks/blockmask.py:54-118): token j
    attends token i iff i//frame_group <= j//frame_group. Fully-masked kv
    tiles are skipped, halving compute for long causal sequences.
    """
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    out = _flash_bhsd(qt, kt, vt, block_q, block_kv, frame_group)
    return out.transpose(0, 2, 1, 3)
