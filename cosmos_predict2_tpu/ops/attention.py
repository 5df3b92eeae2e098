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


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    backend: str | None = None,
    frame_group: int = 0,
) -> jax.Array:
    """Dispatching attention entry point. q,k,v: (B, S, H, D).

    backend: None (auto), "flash" (force Pallas), "reference" (force einsum).
    frame_group > 0 enables frame-block causal masking.
    """
    if backend is None:
        on_tpu = jax.default_backend() == "tpu"
        # the q length drives the memory/compute blow-up of the dense path;
        # short-kv cross-attention (512 text tokens) still wants the flash
        # kernel to avoid materializing (B, H, Sq, Skv) fp32 logits in HBM.
        long_seq = q.shape[1] >= _FLASH_MIN_SEQ and k.shape[1] >= 128
        backend = "flash" if (on_tpu and long_seq) else "reference"
    if backend == "flash":
        from cosmos_predict2_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, frame_group=frame_group)
    if backend == "reference":
        return reference_attention(q, k, v, frame_group=frame_group)
    raise ValueError(f"Unknown attention backend: {backend}")
