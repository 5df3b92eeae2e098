"""Normalization ops, numerics-matched to the reference DiT.

* :func:`rms_norm` — RMSNorm computed in fp32 then cast back, matching
  TransformerEngine's RMSNorm as used for q/k-norm and t-embedding-norm
  (reference minimal_v4_dit.py:209-224,355-358,1421; eps 1e-6).
* :func:`layer_norm` — affine-free LayerNorm (elementwise_affine=False,
  eps 1e-6) used before every attention/MLP sub-layer (minimal_v4_dit.py:1030).
* :func:`channel_l2_norm` — the Wan VAE "RMS_norm": F.normalize along the
  channel axis * sqrt(dim) * gamma (+ bias) (tokenizers/wan2pt1.py:66-78).

XLA fuses these elementwise chains into neighbouring matmuls; a Pallas
fusion only pays off when combined with RoPE application (see ops/rope.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array | None = None, eps: float = 1e-6) -> jax.Array:
    """RMSNorm over the last axis in fp32, result cast back to x.dtype."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    out = (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    if weight is not None:
        out = out * weight.astype(x.dtype)
    return out


def layer_norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Affine-free LayerNorm over the last axis, computed in fp32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def channel_l2_norm(
    x: jax.Array,
    gamma: jax.Array,
    bias: jax.Array | None = None,
    axis: int = 1,
    eps: float = 1e-12,
) -> jax.Array:
    """Wan-VAE RMS_norm: L2-normalize along ``axis``, scale by sqrt(dim)*gamma.

    torch.nn.functional.normalize uses x / max(||x||, eps); gamma broadcasts
    over the remaining axes (caller supplies it already shaped).
    """
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(xf), axis=axis, keepdims=True))
    scale = x.shape[axis] ** 0.5
    out = xf / jnp.maximum(norm, eps) * scale
    out = out.astype(x.dtype) * gamma.astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out
