"""GAN discriminator head on DiT intermediate features (DMD2 option).

Capability parity with the reference discriminator
(cosmos_predict2/_src/predict2/distill/networks/discriminator.py, wired via
``intermediate_feature_ids`` -> minimal_v4_dit.py:1646 and the GAN terms in
video2world_model_distill_dmd2.py:258-345): a small head consuming
intermediate DiT block activations of the fake-score net and emitting one
realness logit per sample.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class DiscriminatorHead(nn.Module):
    """Per-feature MLP -> mean-pool over tokens -> concat -> linear logit."""

    hidden_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: list[jax.Array]) -> jax.Array:
        """features: list of (B, L, D) intermediate activations -> (B, 1)."""
        pooled = []
        for i, f in enumerate(features):
            h = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"proj_{i}")(f.astype(self.dtype))
            h = jax.nn.silu(h)
            pooled.append(jnp.mean(h, axis=1))  # (B, hidden)
        h = jnp.concatenate(pooled, axis=-1)
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="mix")(h)
        h = jax.nn.silu(h)
        return nn.Dense(1, dtype=self.dtype, name="logit")(h)


def bce_with_logits(logits: jax.Array, target: float) -> jax.Array:
    """Numerically-stable binary cross-entropy with constant targets."""
    t = jnp.full_like(logits, target)
    return jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def generator_gan_loss(logits_fake: jax.Array) -> jax.Array:
    """BCE(fake, 1): push the generator toward 'real'."""
    return jnp.mean(jnp.nan_to_num(bce_with_logits(logits_fake, 1.0)))


def discriminator_gan_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    """BCE(real, 1) + BCE(fake, 0)."""
    return jnp.mean(jnp.nan_to_num(bce_with_logits(logits_real, 1.0) + bce_with_logits(logits_fake, 0.0)))
