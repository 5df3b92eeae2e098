"""Training loop.

Capability parity with ``ImaginaireTrainer``
(cosmos_predict2/_src/imaginaire/trainer.py:45-353): callbacks around every
phase, gradient accumulation, EMA update after each optimizer step,
checkpoint save/resume, iteration timing, and a SIGALRM-style stall
watchdog. TPU-first: the whole step (fwd+bwd+optimizer+EMA) is one jitted
function over sharded pytrees; the host loop only feeds data and fires
callbacks. Distributed behavior comes from the mesh shardings, not from a
DDP wrapper.
"""

from __future__ import annotations

import dataclasses
import functools
import signal
import time
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from cosmos_predict2_tpu.conditioning.conditioner import Video2WorldCondition, apply_train_dropout
from cosmos_predict2_tpu.models.video2world import Video2WorldModel
from cosmos_predict2_tpu.training.ema import ema_update, power_ema_beta
from cosmos_predict2_tpu.training.optim import OptimizerConfig, make_optimizer
from cosmos_predict2_tpu.utils import log


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    ema_params: Any  # None if EMA disabled
    opt_state: Any


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    max_iter: int = 1000
    grad_accum_iter: int = 1
    logging_iter: int = 10
    save_iter: int = 200
    validation_iter: int = 0  # 0 = disabled
    seed: int = 0
    ema_enabled: bool = True
    ema_rate: float = 0.1  # power EMA "s"
    timeout_period: int = 0  # seconds; 0 disables the stall watchdog
    optimizer: OptimizerConfig = OptimizerConfig()


class Callback:
    """Hook interface (subset of imaginaire/utils/callback.py:46-440)."""

    def on_train_start(self, trainer, state): ...

    def on_training_step_start(self, trainer, state, batch, iteration): ...

    def on_training_step_end(self, trainer, state, metrics, iteration): ...

    def on_save_checkpoint(self, trainer, state, iteration): ...

    def on_train_end(self, trainer, state): ...


class CallbackGroup(Callback):
    def __init__(self, callbacks: Optional[list[Callback]] = None):
        self.callbacks = callbacks or []

    def __getattribute__(self, name):
        if name.startswith("on_"):
            def fan_out(*args, **kwargs):
                for cb in object.__getattribute__(self, "callbacks"):
                    getattr(cb, name)(*args, **kwargs)

            return fan_out
        return object.__getattribute__(self, name)


class IterSpeedCallback(Callback):
    """Logs loss + iterations/sec (parity: predict2/callbacks/iter_speed.py)."""

    def __init__(self, every_n: int = 10):
        self.every_n = every_n
        self._t0 = None

    def on_training_step_end(self, trainer, state, metrics, iteration):
        if iteration % self.every_n == 0:
            now = time.perf_counter()
            if self._t0 is not None:
                rate = self.every_n / (now - self._t0)
                log.info(f"Iteration {iteration}: Loss: {float(metrics['loss']):.4f} | {rate:.2f} it/s")
            else:
                log.info(f"Iteration {iteration}: Loss: {float(metrics['loss']):.4f}")
            self._t0 = now


@dataclasses.dataclass
class TrainingStats:
    """Sample counters (reference networks/model_weights_stats.py:34-64
    WeightTrainingStat buffers): how many image/video samples this set of
    weights has consumed, total iterations and train-hours. Host-side
    bookkeeping — updated in the loop, not inside the jitted step."""

    accum_video_sample_counter: int = 0
    accum_image_sample_counter: int = 0
    accum_iteration: int = 0
    accum_train_in_hours: float = 0.0

    def update(self, batch_size: int, num_frames: int, seconds: float) -> None:
        if num_frames <= 1:
            self.accum_image_sample_counter += batch_size
        else:
            self.accum_video_sample_counter += batch_size
        self.accum_iteration += 1
        self.accum_train_in_hours += seconds / 3600.0

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


class Trainer:
    def __init__(
        self,
        config: TrainerConfig,
        model: Video2WorldModel,
        callbacks: Optional[list[Callback]] = None,
        checkpointer=None,
    ):
        self.config = config
        self.model = model
        self.callbacks = CallbackGroup(callbacks if callbacks is not None else [IterSpeedCallback(config.logging_iter)])
        self.checkpointer = checkpointer
        self.stats = TrainingStats()
        self.optimizer = make_optimizer(config.optimizer)
        if config.grad_accum_iter > 1:
            self.optimizer = optax.MultiSteps(self.optimizer, every_k_schedule=config.grad_accum_iter)
        # moments_offload: concrete (device, host) sharding maps for the
        # optimizer-state tree, built at init_state time and closed over by
        # the jitted step (in-jit jax.device_put needs concrete shardings)
        self._opt_shardings: Optional[tuple[Any, Any]] = None
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))

    # ------------------------------ state ------------------------------

    def init_state(self, params) -> TrainState:
        # explicit copy: fp32 params would otherwise alias the EMA buffers,
        # which breaks buffer donation in the jitted step
        ema = (
            jax.tree.map(lambda p: jnp.array(p, dtype=jnp.float32, copy=True), params)
            if self.config.ema_enabled
            else None
        )
        opt_state = self.optimizer.init(params)
        offload = self.config.optimizer.moments_offload
        if offload and jax.default_backend() != "tpu":
            # XLA:CPU's memory-space support is partial (in-jit pinned_host
            # placements are ignored and donated host buffers abort); the
            # offload is a TPU HBM lever anyway — fall back device-resident.
            log.warning("moments_offload requested on %s backend: ignored (TPU-only)", jax.default_backend())
            offload = False
        if offload:
            # persistent optimizer tensors live in pinned HOST memory; the
            # step streams them through the device (optim.py rationale +
            # chip numbers). Scalars (count, PRNG key) stay on device.
            # NOTE with grad_accum_iter > 1 the MultiSteps gradient
            # accumulator is also >=2-D and gets offloaded — correct, but
            # it round-trips every micro step; prefer grad_accum_iter == 1
            # with offload.
            leaves, treedef = jax.tree.flatten(opt_state)
            dev_list = [leaf.sharding if leaf.ndim >= 2 else None for leaf in leaves]
            host_list = [s.with_memory_kind("pinned_host") if s is not None else None for s in dev_list]
            self._opt_shardings = (treedef, dev_list, host_list)
            opt_state = self._place_opt(opt_state, host=True)
        return TrainState(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params,
            ema_params=ema,
            opt_state=opt_state,
        )

    def _place_opt(self, opt_state, *, host: bool):
        """Move the big optimizer-state leaves device<->pinned-host (works
        inside the jitted step — the shardings are concrete trace-time
        constants — and eagerly at init)."""
        treedef, dev_list, host_list = self._opt_shardings
        leaves, td = jax.tree.flatten(opt_state)
        assert td == treedef, "optimizer state structure changed after init_state"
        target = host_list if host else dev_list
        out = [jax.device_put(l, s) if s is not None else l for l, s in zip(leaves, target)]
        return jax.tree.unflatten(td, out)

    # ---------------------------- train step ----------------------------

    def _train_step_impl(self, state: TrainState, x0, condition: Video2WorldCondition, rng):
        cfg = self.config
        rng_drop, rng_step = jax.random.split(rng)
        condition = apply_train_dropout(
            rng_drop,
            condition,
            text_dropout_rate=self.model.config.text_dropout_rate,
            video_cond_dropout_rate=getattr(self.model.config, "video_cond_dropout_rate", 0.0),
        )

        def loss_fn(params):
            loss, metrics = self.model.training_step(params, rng_step, x0, condition)
            return loss, metrics

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        prev_opt = state.opt_state
        if self._opt_shardings is not None:
            # host-offloaded moments: stream to device for the update math,
            # write the new state back to pinned host (optim.py rationale)
            prev_opt = self._place_opt(prev_opt, host=False)
        updates, opt_state = self.optimizer.update(grads, prev_opt, state.params)
        if self._opt_shardings is not None:
            opt_state = self._place_opt(opt_state, host=True)
        params = optax.apply_updates(state.params, updates)

        ema_params = state.ema_params
        if ema_params is not None:
            if cfg.grad_accum_iter > 1:
                # Under optax.MultiSteps params change only every k-th
                # micro-step. Advance EMA once per REAL optimizer step
                # (reference updates EMA after each optimizer.step(),
                # imaginaire/trainer.py), with the beta schedule driven by
                # the optimizer-step count, not the micro-step count.
                opt_step = state.opt_state.gradient_step
                beta = power_ema_beta(opt_step, s=cfg.ema_rate)
                new_ema = ema_update(ema_params, params, beta)
                has_updated = opt_state.gradient_step > state.opt_state.gradient_step
                ema_params = jax.tree.map(
                    lambda n, o: jnp.where(has_updated, n, o), new_ema, ema_params
                )
            else:
                beta = power_ema_beta(state.step, s=cfg.ema_rate)
                ema_params = ema_update(ema_params, params, beta)

        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            TrainState(step=state.step + 1, params=params, ema_params=ema_params, opt_state=opt_state),
            metrics,
        )

    # ----------------------------- validation -----------------------------

    @functools.cached_property
    def _val_step(self):
        def val_impl(params, x0, condition, rng):
            loss, metrics = self.model.training_step(params, rng, x0, condition)
            return metrics

        return jax.jit(val_impl)

    def validate(self, state: TrainState, val_batches, iteration: int, max_batches: int = 8) -> float:
        """Average validation loss (reference trainer.validate, trainer.py:333)."""
        losses = []
        rng = jax.random.PRNGKey(self.config.seed + 777)
        for i, (x0, condition) in enumerate(val_batches):
            if i >= max_batches:
                break
            metrics = self._val_step(state.params, x0, condition, jax.random.fold_in(rng, i))
            losses.append(float(metrics["loss"]))
        avg = float(sum(losses) / max(1, len(losses)))
        log.info(f"Validation at iteration {iteration}: loss {avg:.4f} over {len(losses)} batches")
        return avg

    # ------------------------------- loop -------------------------------

    def train(
        self,
        state: TrainState,
        batches: Iterable[tuple[jax.Array, Video2WorldCondition]],
        start_iteration: int = 0,
        val_batches: Optional[Iterable] = None,
    ) -> TrainState:
        """Run the training loop over (latents, condition) batches."""
        cfg = self.config
        base_rng = jax.random.PRNGKey(cfg.seed)
        self.callbacks.on_train_start(self, state)

        if cfg.timeout_period > 0:
            def _timeout(signum, frame):
                raise TimeoutError(f"training iteration exceeded {cfg.timeout_period}s")

            signal.signal(signal.SIGALRM, _timeout)

        iteration = start_iteration
        for x0, condition in batches:
            if iteration >= cfg.max_iter:
                break
            if cfg.timeout_period > 0:
                signal.alarm(cfg.timeout_period)
            self.callbacks.on_training_step_start(self, state, (x0, condition), iteration)
            rng = jax.random.fold_in(base_rng, iteration)
            t_step = time.perf_counter()
            state, metrics = self._train_step(state, x0, condition, rng)
            self.stats.update(x0.shape[0], x0.shape[2], time.perf_counter() - t_step)
            iteration += 1
            self.callbacks.on_training_step_end(self, state, metrics, iteration)
            if val_batches is not None and cfg.validation_iter > 0 and iteration % cfg.validation_iter == 0:
                self.validate(state, val_batches, iteration)
            if self.checkpointer is not None and cfg.save_iter > 0 and iteration % cfg.save_iter == 0:
                self.checkpointer.save(state, iteration)
                self.callbacks.on_save_checkpoint(self, state, iteration)
        if cfg.timeout_period > 0:
            signal.alarm(0)
        if self.checkpointer is not None:
            self.checkpointer.save(state, iteration)
            self.checkpointer.wait()
        self.callbacks.on_train_end(self, state)
        return state
