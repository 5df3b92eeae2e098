"""Shared timing helpers for the bench harness and scripts/.

The one convention every bench in this repo must follow, in one place:
``jax.block_until_ready`` does NOT synchronize through the axon TPU
tunnel, so timing loops force completion by materializing a tiny scalar
on the host instead (an O(1) D2H pull of the first lane). Timings are
min-of-N: a single tunnel hiccup must not poison the sample.

Counterpart of the reference's benchmarking utilities
(predict2/utils/tokenizer_benchmarking.py, wan2pt1.py BenchmarkTimes).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def sync(out) -> float:
    """Force device completion of ``out`` (an array or pytree).

    Pulls a single-lane scalar of the first leaf to the host — the only
    reliable synchronization point through the tunnel.
    """
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf[..., :1].astype(jnp.float32)))


def timed(fn, *args, iters: int = 3) -> float:
    """min-of-``iters`` wall-clock seconds of ``fn(*args)``.

    One un-timed warmup call first (compile + cache), each timed lap
    synchronized via :func:`sync`.
    """
    sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)
