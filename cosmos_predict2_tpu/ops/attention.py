"""Attention dispatch: XLA reference path + Pallas flash-attention path.

Replaces the reference's attention() backend dispatch
(cosmos_predict2/_src/predict2/networks/attention.py:90-181: FA3 -> cuDNN ->
FA2 -> xformers) with a TPU dispatch: a Pallas flash-attention kernel for
long self-attention sequences on TPU, and a plain fp32-softmax einsum
(fused by XLA) otherwise (short cross-attention over 512 text tokens, CPU
tests, tiny shapes).

All functions use the BSHD layout: (batch, seq, heads, head_dim), the
native layout of the DiT (reference qkv_format="bshd").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Sequence length above which the Pallas kernel is used on TPU.
_FLASH_MIN_SEQ = 1024


def reference_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, frame_group: int = 0
) -> jax.Array:
    """Plain attention with fp32 softmax. q,k,v: (B, S, H, D) -> (B, Sq, H, D).

    Matches torch F.scaled_dot_product_attention numerics (scale 1/sqrt(D),
    softmax in fp32). ``frame_group`` > 0 applies frame-block causal
    masking: key i visible to query j iff i//g <= j//g.
    """
    d = q.shape[-1]
    scale = 1.0 / (d**0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    if frame_group > 0:
        row = jnp.arange(q.shape[1])[:, None] // frame_group
        col = jnp.arange(k.shape[1])[None, :] // frame_group
        logits = jnp.where(col <= row, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def blockwise_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    frame_group: int = 0,
    block_kv: int = 2048,
) -> jax.Array:
    """Memory-bounded dense attention: ``lax.scan`` over K/V blocks with
    the online-softmax merge, O(Sq x block_kv) transient memory instead of
    O(Sq x Skv) logits. Each scanned block is ``jax.checkpoint``ed so the
    backward pass recomputes block logits rather than saving them — this
    makes FULL-sequence (84k-token) attention runnable where neither the
    Pallas flash kernel (TPU-only) nor the dense einsum (S^2 logits) can
    go: the virtual CPU mesh, and as a fallback for shapes the flash
    kernel's tiling rejects. Same math as the flash kernel's recurrence
    (ops/flash_attention.py)."""
    B, Sq, H, D = q.shape
    Skv = k.shape[1]
    scale = 1.0 / (D**0.5)
    nb = -(-Skv // block_kv)
    pad = nb * block_kv - Skv
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
    kb = kp.reshape(B, nb, block_kv, H, D).transpose(1, 0, 2, 3, 4)
    vb = vp.reshape(B, nb, block_kv, H, D).transpose(1, 0, 2, 3, 4)
    kv_index = jnp.arange(nb) * block_kv

    q_row = jnp.arange(Sq)

    @jax.checkpoint
    def step(carry, blk):
        o_acc, m_run, l_run = carry
        kc, vc, base = blk
        s = jnp.einsum("bqhd,bkhd->bhqk", q, kc, preferred_element_type=jnp.float32) * scale
        col = base + jnp.arange(block_kv)
        valid = col < Skv
        if frame_group > 0:
            valid = valid[None, :] & ((col[None, :] // frame_group) <= (q_row[:, None] // frame_group))
            s = jnp.where(valid, s, -1e30)
        else:
            s = jnp.where(valid[None, :], s, -1e30)
        m_i = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_run, m_i)
        p = jnp.exp(s - m_new[..., None])
        l_i = jnp.sum(p, axis=-1)
        o_i = jnp.einsum("bhqk,bkhd->bqhd", p.astype(vc.dtype), vc, preferred_element_type=jnp.float32)
        a = jnp.exp(m_run - m_new)
        o_acc = o_acc * a.transpose(0, 2, 1)[..., None] + o_i
        l_run = l_run * a + l_i
        return (o_acc, m_new, l_run), None

    # derive carries from q so they inherit its varying-axes (vma) when
    # this runs inside a shard_map (e.g. under ulysses_attention) —
    # literal zeros would make the scan carry types disagree (jax>=0.7)
    o0 = q.astype(jnp.float32) * 0.0
    row0 = q[..., 0].transpose(0, 2, 1).astype(jnp.float32) * 0.0  # (B,H,Sq)
    m0 = row0 - 1e30
    l0 = row0
    kv_index = kv_index + (kb[0, 0, 0, 0, 0] * 0).astype(kv_index.dtype)
    (o, _, l), _ = jax.lax.scan(step, (o0, m0, l0), (kb, vb, kv_index))
    out = o / jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    backend: str | None = None,
    frame_group: int = 0,
) -> jax.Array:
    """Dispatching attention entry point. q,k,v: (B, S, H, D).

    backend: None (auto), "flash" (force Pallas), "reference" (force
    einsum), "blockwise" (online-softmax KV-block scan — memory-bounded
    dense attention for long sequences off-TPU).
    frame_group > 0 enables frame-block causal masking.
    """
    if backend is None:
        on_tpu = jax.default_backend() == "tpu"
        # the q length drives the memory/compute blow-up of the dense path;
        # short-kv cross-attention (512 text tokens) still wants the flash
        # kernel to avoid materializing (B, H, Sq, Skv) fp32 logits in HBM.
        long_seq = q.shape[1] >= _FLASH_MIN_SEQ and k.shape[1] >= 128
        if on_tpu:
            backend = "flash" if long_seq else "reference"
        else:
            # off-TPU (virtual CPU mesh / tests): the dense einsum needs
            # B*H*Sq*Skv fp32 logits — 228 GB at the full-scale 84k-token
            # clip. Route anything whose logits exceed ~0.5 GB per batch
            # element to the memory-bounded KV-block scan instead.
            logits_elems = q.shape[1] * k.shape[1] * q.shape[2]
            backend = "blockwise" if logits_elems > (1 << 27) else "reference"
    if backend == "flash":
        from cosmos_predict2_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, frame_group=frame_group)
    if backend == "reference":
        return reference_attention(q, k, v, frame_group=frame_group)
    if backend == "blockwise":
        return blockwise_attention(q, k, v, frame_group=frame_group)
    raise ValueError(f"Unknown attention backend: {backend}")
