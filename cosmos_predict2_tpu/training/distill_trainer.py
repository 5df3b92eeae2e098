"""DMD2 distillation trainer: alternating student/critic phases.

Capability parity with the reference's forked distillation trainer
(cosmos_predict2/_src/predict2/distill/trainer/trainer_distillation.py:260
and DistillationCoreMixin's per-net optimizer dict + phase dispatch,
distillation_base_mixin.py:440-705): the student updates every
``student_update_freq``-th iteration, the critic (fake-score net) on all
others; each net has its own optimizer state. Teacher stays frozen.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from cosmos_predict2_tpu.conditioning.conditioner import get_condition_uncondition
from cosmos_predict2_tpu.models.distillation import DistillationModel
from cosmos_predict2_tpu.training.optim import OptimizerConfig, make_optimizer
from cosmos_predict2_tpu.utils import log


@struct.dataclass
class DistillTrainState:
    step: jax.Array
    student_params: Any
    teacher_params: Any  # frozen
    fake_score_params: Any
    student_opt_state: Any
    critic_opt_state: Any


@dataclasses.dataclass(frozen=True)
class DistillTrainerConfig:
    max_iter: int = 1000
    logging_iter: int = 10
    seed: int = 0
    student_optimizer: OptimizerConfig = OptimizerConfig(lr=1e-5)
    critic_optimizer: OptimizerConfig = OptimizerConfig(lr=1e-5)


class DistillationTrainer:
    def __init__(self, config: DistillTrainerConfig, model: DistillationModel):
        self.config = config
        self.model = model
        self.student_opt = make_optimizer(config.student_optimizer)
        self.critic_opt = make_optimizer(config.critic_optimizer)
        # one jit per (phase, n_steps) pair; n_steps is drawn on host
        self._student_step = jax.jit(self._student_step_impl, static_argnames=("n_steps",), donate_argnums=(0,))
        self._critic_step = jax.jit(self._critic_step_impl, static_argnames=("n_steps",), donate_argnums=(0,))

    def init_state(self, student_params, teacher_params, fake_score_params) -> DistillTrainState:
        return DistillTrainState(
            step=jnp.zeros((), dtype=jnp.int32),
            student_params=student_params,
            teacher_params=teacher_params,
            fake_score_params=fake_score_params,
            student_opt_state=self.student_opt.init(student_params),
            critic_opt_state=self.critic_opt.init(fake_score_params),
        )

    # ----------------------------- phases -----------------------------

    def _student_step_impl(self, state: DistillTrainState, x0, condition, uncondition, rng, n_steps: int):
        def loss_fn(student_params):
            return self.model.training_step_generator(
                student_params, state.teacher_params, state.fake_score_params,
                rng, x0, condition, uncondition, n_steps,
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.student_params)
        updates, opt_state = self.student_opt.update(grads, state.student_opt_state, state.student_params)
        params = optax.apply_updates(state.student_params, updates)
        new_state = state.replace(step=state.step + 1, student_params=params, student_opt_state=opt_state)
        return new_state, {**metrics, "loss": loss, "phase": jnp.asarray(0)}

    def _critic_step_impl(self, state: DistillTrainState, x0, condition, rng, n_steps: int):
        def loss_fn(fake_params):
            return self.model.training_step_critic(
                state.student_params, fake_params, rng, x0, condition, n_steps
            )

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.fake_score_params)
        updates, opt_state = self.critic_opt.update(grads, state.critic_opt_state, state.fake_score_params)
        params = optax.apply_updates(state.fake_score_params, updates)
        new_state = state.replace(step=state.step + 1, fake_score_params=params, critic_opt_state=opt_state)
        return new_state, {**metrics, "loss": loss, "phase": jnp.asarray(1)}

    # ------------------------------ loop ------------------------------

    def train(self, state: DistillTrainState, batches: Iterable) -> DistillTrainState:
        cfg = self.config
        base_rng = jax.random.PRNGKey(cfg.seed)
        host_rng = np.random.RandomState(cfg.seed)
        n_times = len(self.model.config.selected_sampling_time)
        iteration = int(state.step)
        for x0, condition in batches:
            if iteration >= cfg.max_iter:
                break
            rng = jax.random.fold_in(base_rng, iteration)
            n_steps = int(host_rng.randint(0, n_times)) + 1
            cond, uncond = get_condition_uncondition(condition)
            if self.model.is_student_phase(iteration):
                state, metrics = self._student_step(state, x0, cond, uncond, rng, n_steps=n_steps)
            else:
                state, metrics = self._critic_step(state, x0, cond, rng, n_steps=n_steps)
            iteration += 1
            if iteration % cfg.logging_iter == 0:
                phase = "student" if int(metrics["phase"]) == 0 else "critic"
                log.info(f"Iteration {iteration} [{phase}]: Loss: {float(metrics['loss']):.4f}")
        return state
