"""Optimizer + LR schedules.

Replaces the reference's apex FusedAdam (imaginaire/utils/fused_adam.py:26 —
a CUDA multi-tensor kernel) with ``optax.adamw``: XLA fuses the update into
a handful of kernels on TPU, so no custom kernel is needed, and the update
runs sharded over the fsdp axis for free.

``lambda_linear_schedule`` reproduces imaginaire's ``LambdaLinearScheduler``
(imaginaire/functional/lr_scheduler.py:160-178): per-cycle linear warm-up
from f_start to f_max, then linear decay to f_min over the cycle. The
returned multiplier scales the base lr, exactly like torch's LambdaLR.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np
import optax


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 2 ** (-14.5)
    weight_decay: float = 0.001
    betas: tuple[float, float] = (0.9, 0.99)
    eps: float = 1e-8
    grad_clip_norm: float | None = 10.0
    # LambdaLinear schedule (per cycle)
    warm_up_steps: tuple[int, ...] = (2_000,)
    f_start: tuple[float, ...] = (1e-6,)
    f_max: tuple[float, ...] = (0.5,)
    f_min: tuple[float, ...] = (0.2,)
    cycle_lengths: tuple[int, ...] = (100_000,)


def lambda_linear_schedule(
    warm_up_steps: Sequence[int],
    f_start: Sequence[float],
    f_max: Sequence[float],
    f_min: Sequence[float],
    cycle_lengths: Sequence[int],
) -> optax.Schedule:
    cum = np.cumsum([0] + list(cycle_lengths))

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        f = jnp.asarray(f_min[-1], dtype=jnp.float32)
        # evaluate cycles back to front so earlier cycles override
        for c in reversed(range(len(cycle_lengths))):
            n = step - cum[c]
            warm = (f_max[c] - f_start[c]) / max(warm_up_steps[c], 1) * n + f_start[c]
            decay = f_min[c] + (f_max[c] - f_min[c]) * (cycle_lengths[c] - n) / (
                cycle_lengths[c] - warm_up_steps[c]
            )
            in_cycle = n <= cycle_lengths[c]
            val = jnp.where(n < warm_up_steps[c], warm, decay)
            f = jnp.where(in_cycle & (n >= 0), val, f)
        return f

    return schedule


def make_optimizer(config: OptimizerConfig) -> optax.GradientTransformation:
    schedule = lambda_linear_schedule(
        config.warm_up_steps, config.f_start, config.f_max, config.f_min, config.cycle_lengths
    )
    chain = []
    if config.grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(config.grad_clip_norm))
    chain.append(
        optax.adamw(
            learning_rate=lambda step: config.lr * schedule(step),
            b1=config.betas[0],
            b2=config.betas[1],
            eps=config.eps,
            weight_decay=config.weight_decay,
        )
    )
    return optax.chain(*chain)
