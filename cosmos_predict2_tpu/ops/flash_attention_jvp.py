"""Pallas TPU flash attention with fused JVP (forward-mode derivative).

TPU-native replacement for the reference's Triton JVP flash-attention
(cosmos_predict2/_src/predict2/utils/flash_attention_jvp_triton.py:1-821),
used by distillation losses that need forward-mode gradients through the
network (sCM-style consistency training; models/distillation.py here).

Math. With s = scale * q k^T, p = softmax(s), o = p v and input tangents
(dq, dk, dv):

    ds = scale * (dq k^T + q dk^T)
    dp = p * (ds - rowsum(p * ds))            # softmax JVP
    do = dp v + p dv
       = [sum_j p_j ds_j v_j + sum_j p_j dv_j] / l  -  r * o,
    r  = rowsum(p * ds) / l

so one pass over K/V blocks with the usual online-softmax rescaling can
accumulate all three sums next to the primal output: the tangent costs two
extra MXU matmuls per block (ds needs q dk^T + dq k^T, and (p*ds) v + p dv)
— ~2.5x the primal forward, same memory traffic shape.

The public wrapper ``flash_attention_fwdmode`` is a ``jax.custom_jvp``
function in BSHD layout; use it in networks that sit under ``jax.jvp`` /
``jax.jacfwd``. (Reverse-mode uses the FA2 backward in flash_attention.py —
mirroring the reference, which reuses FA2 for VJP.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosmos_predict2_tpu.ops.flash_attention import (
    _NEG_INF,
    _auto_blocks,
    _frame_block_mask,
    _pad_seq,
)


def _jvp_kernel(
    q_ref, k_ref, v_ref, dq_ref, dk_ref, dv_ref, o_ref, do_ref,
    acc_o, acc_t, m_scr, l_scr, r_scr,
    *, scale: float, kv_len: int, block_q: int, block_kv: int, frame_group: int,
):
    iq = pl.program_id(2)
    ik = pl.program_id(3)
    n_kv = pl.num_programs(3)

    @pl.when(ik == 0)
    def _init():
        acc_o[:] = jnp.zeros_like(acc_o)
        acc_t[:] = jnp.zeros_like(acc_t)
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        r_scr[:] = jnp.zeros_like(r_scr)

    if frame_group > 0:
        q_last = iq * block_q + block_q - 1
        max_visible = (q_last // frame_group) * frame_group + frame_group
        run_block = (ik * block_kv) < max_visible
    else:
        run_block = True

    @pl.when(run_block)
    def _compute():
        q, k, v = q_ref[0, 0], k_ref[0, 0], v_ref[0, 0]
        dq, dk, dv = dq_ref[0, 0], dk_ref[0, 0], dv_ref[0, 0]

        dot = functools.partial(
            jax.lax.dot_general, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = dot(q, k) * scale
        ds = (dot(dq, k) + dot(q, dk)) * scale  # (bq, bk) f32

        if kv_len % block_kv != 0:
            col = ik * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(col < kv_len, s, _NEG_INF)
        if frame_group > 0:
            mask = _frame_block_mask(s.shape, iq, ik, block_q, block_kv, frame_group)
            s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scr[:, :1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)  # masked cols: exp(-inf) = 0, kills ds too
        corr = jnp.exp(m_prev - m_new)
        l_new = l_scr[:, :1] * corr + jnp.sum(p, axis=1, keepdims=True)
        pds = p * ds
        r_new = r_scr[:, :1] * corr + jnp.sum(pds, axis=1, keepdims=True)

        mm = functools.partial(
            jax.lax.dot_general, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        pv = mm(p.astype(v.dtype), v)
        # tangent numerator: (p*ds) v + p dv
        tv = mm(pds.astype(v.dtype), v) + mm(p.astype(dv.dtype), dv)
        acc_o[:] = acc_o[:] * corr + pv
        acc_t[:] = acc_t[:] * corr + tv
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
        r_scr[:] = jnp.broadcast_to(r_new, r_scr.shape)

    @pl.when(ik == n_kv - 1)
    def _finalize():
        l = l_scr[:, :1]
        o = acc_o[:] / l
        r = r_scr[:, :1] / l
        o_ref[0, 0] = o.astype(o_ref.dtype)
        do_ref[0, 0] = (acc_t[:] / l - r * o).astype(do_ref.dtype)


def _jvp_bhsd(q, k, v, dq, dk, dv, block_q=None, block_kv=None, frame_group: int = 0):
    """q..dv: (B, H, S, D) -> (o, do), both (B, H, Sq, D)."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    scale = 1.0 / (d**0.5)
    # two fp32 score tiles live at once (s and ds): halve the VMEM budget
    # by resolving blocks for a doubled virtual tile.
    block_q, block_kv = _auto_blocks(sq, skv, block_q, block_kv)
    while block_q * block_kv > 786_432:
        if block_kv >= block_q:
            block_kv = max(256, (block_kv // 2 // 128) * 128)
        else:
            block_q = max(256, (block_q // 2 // 128) * 128)

    qp, dqp = _pad_seq(q, block_q, 2), _pad_seq(dq, block_q, 2)
    kp, dkp = _pad_seq(k, block_kv, 2), _pad_seq(dk, block_kv, 2)
    vp, dvp = _pad_seq(v, block_kv, 2), _pad_seq(dv, block_kv, 2)
    sq_p, skv_p = qp.shape[2], kp.shape[2]
    grid = (b, h, sq_p // block_q, skv_p // block_kv)

    kernel = functools.partial(
        _jvp_kernel, scale=scale, kv_len=skv, block_q=block_q, block_kv=block_kv,
        frame_group=frame_group,
    )
    q_spec = pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, iq, ik: (b_, h_, iq, 0))
    kv_spec = pl.BlockSpec((1, 1, block_kv, d), lambda b_, h_, iq, ik: (b_, h_, ik, 0))
    o, do = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, kv_spec, kv_spec],
        out_specs=[q_spec, q_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * sq_p * skv_p * d,
            bytes_accessed=(2 * (qp.size + kp.size + vp.size) + 2 * qp.size) * 2,
            transcendentals=b * h * sq_p * skv_p,
        ),
    )(qp, kp, vp, dqp, dkp, dvp)
    return o[:, :, :sq], do[:, :, :sq]


@functools.partial(jax.custom_jvp, nondiff_argnums=(3,))
def flash_attention_fwdmode(q, k, v, frame_group: int = 0):
    """Flash attention in BSHD layout with a fused forward-mode derivative.

    Use this attention inside networks evaluated under ``jax.jvp`` /
    ``jax.jacfwd`` (sCM distillation). The primal call runs the standard
    flash kernel; under jvp the fused kernel computes (o, do) in one pass.
    Reverse-mode: use ``flash_attention`` (FA2 backward) instead.
    """
    from cosmos_predict2_tpu.ops.flash_attention import flash_attention

    return flash_attention(q, k, v, frame_group=frame_group)


@flash_attention_fwdmode.defjvp
def _flash_fwdmode_jvp(frame_group, primals, tangents):
    q, k, v = primals
    dq, dk, dv = (
        jnp.zeros_like(p) if isinstance(t, jax.custom_derivatives.SymbolicZero) else t.astype(p.dtype)
        for p, t in zip(primals, tangents)
    )
    tr = lambda t: t.transpose(0, 2, 1, 3)  # noqa: E731  BSHD -> BHSD
    o, do = _jvp_bhsd(tr(q), tr(k), tr(v), tr(dq), tr(dk), tr(dv), frame_group=frame_group)
    return tr(o), tr(do)


def reference_attention_jvp(q, k, v, dq, dk, dv, frame_group: int = 0):
    """Einsum reference for (o, do) in BSHD, fp32 — test oracle."""

    def attn(q, k, v):
        d = q.shape[-1]
        s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)) / d**0.5
        if frame_group > 0:
            S, Skv = q.shape[1], k.shape[1]
            row = jnp.arange(S)[:, None] // frame_group
            col = jnp.arange(Skv)[None, :] // frame_group
            s = jnp.where(col <= row, s, -jnp.inf)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))

    return jax.jvp(attn, (q, k, v), (dq, dk, dv))
