"""Misc utilities: seeded noise, parameter counting, timers.

``arch_invariant_rand`` mirrors the reference's device-architecture-invariant
noise (cosmos_predict2/_src/imaginaire/utils/misc.py:540, used for inference
noise at text2world_model_rectified_flow.py:556): noise is drawn on host
with torch's CPU Philox generator so a given seed produces bit-identical
noise to the CUDA reference, then shipped to device.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax
import jax.numpy as jnp
import numpy as np


def arch_invariant_rand(shape: tuple[int, ...], seed: int, dtype=jnp.float32) -> jax.Array:
    """Seeded normal noise, bit-matching torch.randn on CPU for parity."""
    try:
        import torch

        gen = torch.Generator(device="cpu")
        gen.manual_seed(seed)
        arr = torch.randn(*shape, generator=gen, dtype=torch.float32).numpy()
    except ImportError:
        arr = np.random.RandomState(seed).randn(*shape).astype(np.float32)
    return jnp.asarray(arr, dtype=dtype)


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))


@contextmanager
def timer(name: str, results: dict | None = None):
    start = time.perf_counter()
    yield
    elapsed = time.perf_counter() - start
    if results is not None:
        results[name] = elapsed
