"""Profiling: trace capture + section timers.

Replaces the reference's torch.profiler/kineto + CUDA memory snapshot
wrappers (imaginaire/utils/profiling.py:36-120) with ``jax.profiler``:
TensorBoard-compatible traces with XLA HLO + TPU hardware counters, plus a
live memory introspection helper. Host-side section timing mirrors
``misc.TrainingTimer``.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import time
from collections import defaultdict
from typing import Optional

import jax

from cosmos_predict2_tpu.utils import log


@dataclasses.dataclass(frozen=True)
class ProfilingConfig:
    enabled: bool = False
    first_n_iterations: int = 5
    skip_first_n: int = 2
    trace_dir: str = "outputs/profile"


@contextlib.contextmanager
def maybe_enable_profiling(config: ProfilingConfig, iteration: int = 0):
    """Capture a device trace for the configured iteration window."""
    active = config.enabled and config.skip_first_n <= iteration < config.skip_first_n + config.first_n_iterations
    if active:
        os.makedirs(config.trace_dir, exist_ok=True)
        jax.profiler.start_trace(config.trace_dir)
    try:
        yield active
    finally:
        if active:
            jax.profiler.stop_trace()
            log.info(f"profile trace written to {config.trace_dir}")


def device_memory_report() -> dict[int, dict]:
    out = {}
    for dev in jax.local_devices():
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats:
            out[dev.id] = {k: v for k, v in stats.items() if "bytes" in k}
    return out


class TrainingTimer:
    """Named section timers (reference misc.TrainingTimer): accumulates
    wall time per section across iterations."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        start = time.perf_counter()
        yield
        self.totals[name] += time.perf_counter() - start
        self.counts[name] += 1

    def summary(self) -> dict[str, float]:
        return {k: self.totals[k] / max(1, self.counts[k]) for k in self.totals}

    def reset(self):
        self.totals.clear()
        self.counts.clear()
