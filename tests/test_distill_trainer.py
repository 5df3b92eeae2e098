"""Distillation trainer phase-alternation test."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.conditioning.conditioner import make_condition
from cosmos_predict2_tpu.models.distillation import DistillationConfig, DistillationModel
from cosmos_predict2_tpu.models.video2world import RFModelConfig
from cosmos_predict2_tpu.networks.dit import PRESETS
from cosmos_predict2_tpu.training.distill_trainer import DistillationTrainer, DistillTrainerConfig
from cosmos_predict2_tpu.training.optim import OptimizerConfig


@pytest.mark.level(1)
def test_distill_trainer_alternates_and_updates():
    net = dataclasses.replace(PRESETS["test"], dtype=jnp.float32, remat="none")
    dm = DistillationModel(DistillationConfig(model=RFModelConfig(net=net, state_t=2), student_update_freq=2))
    shape = (1, 16, 2, 4, 4)
    student = dm.base.init_params(jax.random.PRNGKey(0), shape, text_len=8)
    teacher = dm.base.init_params(jax.random.PRNGKey(1), shape, text_len=8)
    critic = dm.base.init_params(jax.random.PRNGKey(2), shape, text_len=8)

    opt = OptimizerConfig(lr=1e-3, warm_up_steps=(1,), cycle_lengths=(100,))
    trainer = DistillationTrainer(
        DistillTrainerConfig(max_iter=4, logging_iter=1, student_optimizer=opt, critic_optimizer=opt), dm
    )
    state = trainer.init_state(student, teacher, critic)

    teacher_before = jax.tree.leaves(state.teacher_params)[0].copy()
    student_before = np.asarray(jax.tree.leaves(state.student_params)[5]).copy()
    critic_before = np.asarray(jax.tree.leaves(state.fake_score_params)[5]).copy()

    def batches():
        for i in range(4):
            x0 = jax.random.normal(jax.random.PRNGKey(10 + i), shape)
            emb = jax.random.normal(jax.random.PRNGKey(20 + i), (1, 8, 1024)) * 0.05
            cond = make_condition(emb).replace(gt_frames=x0).set_video_condition(x0, 1)
            yield x0, cond

    state = trainer.train(state, batches())
    assert int(state.step) == 4
    # teacher frozen; both student and critic moved
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(state.teacher_params)[0]), np.asarray(teacher_before))
    assert np.abs(np.asarray(jax.tree.leaves(state.student_params)[5]) - student_before).max() > 0
    assert np.abs(np.asarray(jax.tree.leaves(state.fake_score_params)[5]) - critic_before).max() > 0
