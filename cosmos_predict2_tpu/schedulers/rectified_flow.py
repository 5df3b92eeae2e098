"""Rectified-flow training-time schedule (TPU-native rebuild).

Capability parity with the reference ``RectifiedFlow`` wrapper
(cosmos_predict2/_src/predict2/schedulers/rectified_flow.py:76-178), without
the diffusers dependency: the flow-match Euler discrete schedule it wraps is
just ``sigma(i) = shift*s / (1 + (shift-1)*s)`` over a descending linspace,
which we compute directly.

Conventions (identical to the reference / rectified-flow community):
  * ``x_0`` is **noise**, ``x_1`` is clean data.
  * interpolation: ``x_t = x_0 * t + x_1 * (1 - t)``, velocity target
    ``dx_t = x_0 - x_1`` (reference ``get_interpolation``, :142).
  * train time ``u ~ U[0,1]`` or logit-normal; mapped to a discrete
    timestep ``timesteps[floor(u * N)]`` of the *shifted* schedule.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def shift_sigmas(sigmas: np.ndarray, shift: float) -> np.ndarray:
    """Resolution shift of flow-matching noise levels: s' = k*s/(1+(k-1)s)."""
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


@dataclasses.dataclass(frozen=True)
class RectifiedFlowConfig:
    num_train_timesteps: int = 1000
    shift: float = 3.0
    train_time_distribution: str = "uniform"  # "uniform" | "logitnormal"
    train_time_weight: str = "uniform"


class RectifiedFlow:
    """Training-time rectified-flow schedule.

    The discrete schedule matches diffusers' FlowMatchEulerDiscreteScheduler
    with ``shift``: base sigmas = linspace(1, 1/N, N), then the shift map.
    ``timesteps = sigmas * N``.
    """

    def __init__(self, config: RectifiedFlowConfig = RectifiedFlowConfig()):
        self.config = config
        n = config.num_train_timesteps
        base = np.linspace(1.0, 1.0 / n, n)  # descending, sigma_max=1 first
        sigmas = shift_sigmas(base, config.shift)
        self.sigmas = jnp.asarray(sigmas, dtype=jnp.float32)  # (N,) descending
        self.timesteps = jnp.asarray(sigmas * n, dtype=jnp.float32)  # (N,)

    def sample_train_time(self, rng: jax.Array, batch_size: int) -> jax.Array:
        """u in [0, 1), shape (B,)."""
        dist = self.config.train_time_distribution
        if dist == "uniform":
            return jax.random.uniform(rng, (batch_size,), dtype=jnp.float32)
        if dist == "logitnormal":
            return jax.nn.sigmoid(jax.random.normal(rng, (batch_size,), dtype=jnp.float32))
        raise NotImplementedError(f"Time distribution '{dist}' is not implemented.")

    def discretize(self, u: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Map continuous u in [0,1) to (timesteps, sigmas) of the discrete schedule.

        Matches reference ``get_discrete_timestamp`` (:127) + ``get_sigmas``
        (:135): index = floor(u * N).
        """
        n = self.config.num_train_timesteps
        idx = jnp.clip((u * n).astype(jnp.int32), 0, n - 1)
        return self.timesteps[idx], self.sigmas[idx]

    @staticmethod
    def get_interpolation(x_0: jax.Array, x_1: jax.Array, t: jax.Array) -> tuple[jax.Array, jax.Array]:
        """x_t = x_0*t + x_1*(1-t); dot_x_t = x_0 - x_1.

        ``t`` has shape (B,) or broadcastable (B, 1...); x_0 is noise,
        x_1 clean data (reference :142-178).
        """
        t = t.reshape(t.shape[0], *([1] * (x_1.ndim - 1)))
        x_t = x_0 * t + x_1 * (1.0 - t)
        dot_x_t = x_0 - x_1
        return x_t, dot_x_t

    def apply_high_sigma(
        self,
        rng: jax.Array,
        timesteps: jax.Array,
        sigmas: jax.Array,
        ratio: float,
        timesteps_min: int = 980,
        timesteps_max: int = 1000,
    ) -> tuple[jax.Array, jax.Array]:
        """High-sigma strategy: with probability ``ratio`` per sample,
        replace the drawn timestep with one sampled uniformly from the
        schedule's timesteps in [timesteps_min, timesteps_max] — biasing
        training toward the near-pure-noise region (reference
        text2world_model_rectified_flow.py:375-390).
        """
        ts_np = np.asarray(self.timesteps)
        cand = np.nonzero((ts_np >= timesteps_min) & (ts_np <= timesteps_max))[0]
        if cand.size == 0:
            raise ValueError("No candidate timesteps found for high sigma strategy")
        rng_mask, rng_pick = jax.random.split(rng)
        mask = jax.random.uniform(rng_mask, timesteps.shape) < ratio
        picks = jnp.asarray(cand)[jax.random.randint(rng_pick, timesteps.shape, 0, cand.size)]
        return (
            jnp.where(mask, self.timesteps[picks], timesteps),
            jnp.where(mask, self.sigmas[picks], sigmas),
        )

    def time_weight(self, t: jax.Array) -> jax.Array:
        if self.config.train_time_weight in ("uniform", "reweighting"):
            return jnp.ones_like(t)
        raise NotImplementedError(f"Time weight '{self.config.train_time_weight}' is not implemented.")
