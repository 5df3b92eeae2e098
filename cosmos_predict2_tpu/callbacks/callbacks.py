"""Built-in training callbacks: observability, liveness, health.

Capability parity with the reference callback suite
(imaginaire/utils/callback.py:46-440 + predict2/callbacks/: IterSpeed,
HeartBeat, DeviceMonitor, ManualGC, EveryN, GradClip logging, WandB) —
rebuilt around JAX: device health comes from jax.local_devices() memory
stats instead of pynvml; straggler detection compares per-host step times
instead of CUPTI kernel profiles.
"""

from __future__ import annotations

import gc
import json
import os
import time
from collections import deque
from typing import Optional

import jax
import numpy as np

from cosmos_predict2_tpu.training.trainer import Callback
from cosmos_predict2_tpu.utils import log


class EveryN(Callback):
    """Base class: fires ``every_n_impl`` every N training steps
    (reference imaginaire/callbacks/every_n.py)."""

    def __init__(self, every_n: int, step_size: int = 1):
        self.every_n = every_n
        self.step_size = step_size

    def on_training_step_end(self, trainer, state, metrics, iteration):
        if iteration % (self.every_n * self.step_size) == 0:
            self.every_n_impl(trainer, state, metrics, iteration)

    def every_n_impl(self, trainer, state, metrics, iteration):
        raise NotImplementedError


class HeartBeat(EveryN):
    """Writes a liveness timestamp file (predict2/callbacks/heart_beat.py:29)."""

    def __init__(self, path: str = "outputs/heartbeat.json", every_n: int = 10):
        super().__init__(every_n)
        self.path = path

    def every_n_impl(self, trainer, state, metrics, iteration):
        os.makedirs(os.path.dirname(os.path.abspath(self.path)), exist_ok=True)
        with open(self.path, "w") as f:
            json.dump({"iteration": iteration, "timestamp": time.time()}, f)


class DeviceMonitor(EveryN):
    """Logs per-device HBM usage (predict2/callbacks/device_monitor.py:80)."""

    def __init__(self, every_n: int = 100):
        super().__init__(every_n)

    def every_n_impl(self, trainer, state, metrics, iteration):
        for dev in jax.local_devices():
            stats = getattr(dev, "memory_stats", lambda: None)()
            if stats:
                used = stats.get("bytes_in_use", 0) / 1e9
                limit = stats.get("bytes_limit", 0) / 1e9
                log.info(f"[device {dev.id}] HBM {used:.2f}/{limit:.2f} GB")


class ManualGC(EveryN):
    """Synchronized manual garbage collection (imaginaire/callbacks/manual_gc.py)."""

    def __init__(self, every_n: int = 1000):
        super().__init__(every_n)
        gc.disable()

    def every_n_impl(self, trainer, state, metrics, iteration):
        gc.collect()


class GradNormLogger(EveryN):
    def every_n_impl(self, trainer, state, metrics, iteration):
        if "grad_norm" in metrics:
            log.info(f"Iteration {iteration}: grad_norm {float(metrics['grad_norm']):.4f}")


class StragglerDetection(Callback):
    """Step-time based straggler detection.

    Reference StragglerDetectorV2 (imaginaire/utils/misc.py:540) profiles
    CUPTI kernel times per rank; on TPU SPMD there is one process per host,
    so the signal is the host's step wall-time vs its own trailing median.
    After ``threshold_count`` consecutive steps slower than
    ``max_ratio`` x median, raises (converting persistent slowness into a
    hard failure, like the reference's BufferCnt raise).
    """

    def __init__(self, window: int = 50, max_ratio: float = 2.0, threshold_count: int = 10, enabled: bool = True):
        self.window = deque(maxlen=window)
        self.max_ratio = max_ratio
        self.threshold_count = threshold_count
        self.enabled = enabled
        self._last = None
        self._count = 0

    def on_training_step_start(self, trainer, state, batch, iteration):
        self._last = time.perf_counter()

    def on_training_step_end(self, trainer, state, metrics, iteration):
        if self._last is None:
            return
        dt = time.perf_counter() - self._last
        if len(self.window) >= 10:
            median = float(np.median(self.window))
            if dt > self.max_ratio * median:
                self._count += 1
                log.warning(f"slow step {iteration}: {dt:.2f}s vs median {median:.2f}s ({self._count})")
                if self.enabled and self._count >= self.threshold_count:
                    raise RuntimeError(
                        f"straggler detected: {self._count} consecutive steps > {self.max_ratio}x median"
                    )
            else:
                self._count = 0
        self.window.append(dt)


class WandbLogger(Callback):
    """Metric logging to Weights & Biases when available, else jsonl file
    (imaginaire/utils/callback.py:417 WandBCallback)."""

    def __init__(self, every_n: int = 10, jsonl_path: str = "outputs/metrics.jsonl", project: str = "cosmos_tpu"):
        self.every_n = every_n
        self.jsonl_path = jsonl_path
        self._wandb = None
        try:
            import wandb  # noqa

            if os.environ.get("WANDB_API_KEY"):
                self._wandb = wandb
                self._wandb.init(project=project)
        except ImportError:
            pass

    def on_training_step_end(self, trainer, state, metrics, iteration):
        if iteration % self.every_n != 0:
            return
        scalars = {k: float(np.asarray(v)) for k, v in metrics.items() if np.asarray(v).ndim == 0}
        scalars["iteration"] = iteration
        if self._wandb is not None:
            self._wandb.log(scalars, step=iteration)
        else:
            os.makedirs(os.path.dirname(os.path.abspath(self.jsonl_path)), exist_ok=True)
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(scalars) + "\n")


class EveryNDrawSample(EveryN):
    """Periodic sample generation during training (parity:
    predict2/callbacks/every_n_draw_sample.py / viz_online_sampling):
    calls ``generate_fn(state, iteration) -> frames (T, H, W, 3)`` and
    saves the clip under ``out_dir``."""

    def __init__(self, generate_fn, out_dir: str = "outputs/samples", every_n: int = 500):
        super().__init__(every_n)
        self.generate_fn = generate_fn
        self.out_dir = out_dir

    def every_n_impl(self, trainer, state, metrics, iteration):
        from cosmos_predict2_tpu.utils.io import save_img_or_video

        frames = self.generate_fn(state, iteration)
        if frames is not None:
            path = save_img_or_video(
                np.asarray(frames), os.path.join(self.out_dir, f"iter_{iteration:07d}"), fps=16
            )
            log.info(f"sample at iteration {iteration} -> {path}")


def basic_callbacks(logging_iter: int = 10) -> list[Callback]:
    """The reference's "basic" callback group."""
    from cosmos_predict2_tpu.training.trainer import IterSpeedCallback

    return [
        IterSpeedCallback(logging_iter),
        HeartBeat(every_n=max(1, logging_iter)),
        DeviceMonitor(every_n=100),
        StragglerDetection(enabled=False),
    ]
