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
from typing import NamedTuple, Sequence

import jax
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
    # Optimizer-state memory mode: "float32" (default) keeps fp32 Adam
    # moments; "bfloat16" stores BOTH moments in bf16 with stochastic
    # rounding on every state write — halves optimizer HBM (8 -> 4
    # bytes/param), the single biggest lever for raising the full-fine-tune
    # ceiling on a 16 GB chip. A TPU-native answer to the problem the
    # reference never had on 80 GB GPUs (its apex FusedAdam is fp32-state,
    # imaginaire/utils/fused_adam.py:26).
    moments_dtype: str = "float32"
    moments_seed: int = 0
    # Offload the persistent Adam moment tensors to pinned HOST memory
    # (memory_kind="pinned_host"): the jitted step streams them through the
    # device for the update and writes them back, so HBM holds only
    # params + grads + activations. Chip-measured (scripts/full_ft_ceiling.py,
    # 2B DiT, bf16 moments): enables FULL fine-tune with optimizer state on
    # one 16 GB chip at seq 8320/13312/19968 (2.94/4.46/7.45 s/step,
    # 23.9/30.4/33.5% MFU) where the device-resident state cannot fit at
    # all. Combine with moments_dtype="bfloat16" to halve the host traffic.
    moments_offload: bool = False


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


def stochastic_round_to_bf16(x: jax.Array, key: jax.Array) -> jax.Array:
    """Unbiased f32 -> bf16 rounding: E[result] == x.

    bf16 is f32 with the low 16 mantissa bits dropped, so adding a uniform
    16-bit integer to the f32 bit pattern and truncating implements exact
    stochastic rounding (round-up probability == the truncated fraction).
    Works in sign-magnitude space, so negative values round unbiasedly
    toward/away from zero as well; a mantissa carry into the exponent is
    precisely the correct round-up to the next binade.
    """
    assert x.dtype == jnp.float32, x.dtype
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    r = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    rounded = (bits + r) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(jnp.bfloat16)


class ScaleByAdamBF16State(NamedTuple):
    count: jax.Array
    mu: optax.Updates  # bf16 first moment
    nu: optax.Updates  # bf16 second moment
    key: jax.Array  # PRNG carry for the stochastic-rounding state writes


def scale_by_adam_bf16(
    b1: float = 0.9, b2: float = 0.99, eps: float = 1e-8, seed: int = 0
) -> optax.GradientTransformation:
    """Adam whose moment STATE lives in bf16 (stochastic-rounded writes);
    all arithmetic (moment update, bias correction, the returned update)
    stays in f32. Halves optimizer HBM vs optax.adam. SGD-style drift from
    the low-precision state is avoided because rounding is unbiased —
    the moments are noisy but centered, and the noise is far below the
    gradient noise at any practical batch size.
    """

    def init_fn(params):
        zeros = lambda p: jnp.zeros(jnp.shape(p), jnp.bfloat16)
        return ScaleByAdamBF16State(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
            key=jax.random.PRNGKey(seed),
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_increment(state.count)
        key, sub = jax.random.split(state.key)
        leaves, treedef = jax.tree.flatten(updates)
        keys = jax.random.split(sub, 2 * max(len(leaves), 1))
        kmu = jax.tree.unflatten(treedef, keys[: len(leaves)])
        knu = jax.tree.unflatten(treedef, keys[len(leaves) : 2 * len(leaves)])

        mu32 = jax.tree.map(
            lambda m, g: b1 * m.astype(jnp.float32) + (1.0 - b1) * g.astype(jnp.float32),
            state.mu, updates,
        )
        nu32 = jax.tree.map(
            lambda v, g: b2 * v.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            state.nu, updates,
        )
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)
        new_updates = jax.tree.map(
            lambda m, v: (m / c1) / (jnp.sqrt(v / c2) + eps), mu32, nu32
        )
        new_state = ScaleByAdamBF16State(
            count=count,
            mu=jax.tree.map(stochastic_round_to_bf16, mu32, kmu),
            nu=jax.tree.map(stochastic_round_to_bf16, nu32, knu),
            key=key,
        )
        return new_updates, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(config: OptimizerConfig) -> optax.GradientTransformation:
    schedule = lambda_linear_schedule(
        config.warm_up_steps, config.f_start, config.f_max, config.f_min, config.cycle_lengths
    )
    lr = lambda step: config.lr * schedule(step)
    chain = []
    if config.grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(config.grad_clip_norm))
    if config.moments_dtype == "bfloat16":
        # adamw decomposition with the bf16-state scaler: adam scale ->
        # decoupled weight decay -> -lr (matches optax.adamw ordering)
        chain.extend(
            [
                scale_by_adam_bf16(
                    b1=config.betas[0], b2=config.betas[1], eps=config.eps,
                    seed=config.moments_seed,
                ),
                optax.add_decayed_weights(config.weight_decay),
                optax.scale_by_learning_rate(lr),
            ]
        )
    elif config.moments_dtype == "float32":
        chain.append(
            optax.adamw(
                learning_rate=lr,
                b1=config.betas[0],
                b2=config.betas[1],
                eps=config.eps,
                weight_decay=config.weight_decay,
            )
        )
    else:
        raise ValueError(f"moments_dtype must be 'float32' or 'bfloat16', got {config.moments_dtype!r}")
    return optax.chain(*chain)
