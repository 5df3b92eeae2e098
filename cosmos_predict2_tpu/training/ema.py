"""EMA weights as a pytree lerp.

Replaces the reference ``FastEmaModelUpdater`` (imaginaire/utils/ema.py:37,
in-place lerp between twin nn.Modules) and its DTensor variant with a pure
``jax.tree.map`` — under jit the lerp fuses into a single elementwise pass,
sharded identically to the params.

``power_ema_beta`` reproduces the EDM2 power-EMA beta schedule used by the
model (text2world_model_rectified_flow.py:246-247,806-820):
  gamma = max real root of x^3 + 7x^2 + (16 - s^-2)x + (12 - s^-2)
  beta(i) = (1 - 1/(i+1)) ** (gamma + 1)
"""

from __future__ import annotations

import functools

import jax
import numpy as np


@functools.lru_cache(maxsize=None)
def power_ema_gamma(s: float) -> float:
    return float(np.roots([1, 7, 16 - s**-2, 12 - s**-2]).real.max())


def power_ema_beta(iteration, s: float = 0.1, iteration_shift: int = 0):
    """Per-iteration EMA decay (jit-safe: iteration may be traced)."""
    import jax.numpy as jnp

    gamma = power_ema_gamma(s)
    i = jnp.asarray(iteration) + iteration_shift
    beta = (1.0 - 1.0 / (i + 1.0)) ** (gamma + 1.0)
    return jnp.where(i < 1, 0.0, beta)


def ema_update(ema_params, params, beta):
    """ema <- ema*beta + (1-beta)*params, elementwise over the pytree."""
    return jax.tree.map(lambda e, p: e * beta + (1.0 - beta) * p.astype(e.dtype), ema_params, params)
