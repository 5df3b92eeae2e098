"""DMD2 distillation tests."""

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.conditioning.conditioner import get_condition_uncondition, make_condition
from cosmos_predict2_tpu.models.distillation import (
    DEFAULT_SAMPLING_TIMES,
    DistillationConfig,
    DistillationModel,
    trigflow_scalings_edm,
    trigflow_scalings_rf,
)
from cosmos_predict2_tpu.models.video2world import RFModelConfig
from cosmos_predict2_tpu.networks.dit import PRESETS


@pytest.mark.level(0)
def test_trigflow_rf_scalings():
    """RF scalings at t: with sigma_data=1, c_noise = sigma/(sigma+1) for
    sigma = tan(t) — i.e. the RF time of that noise level."""
    t = jnp.asarray([0.3, 1.0, math.pi / 2 - 1e-3])
    c_skip, c_out, c_in, c_noise = trigflow_scalings_rf(t, 1.0)
    sigma = np.tan(np.asarray(t))
    np.testing.assert_allclose(np.asarray(c_noise), sigma / (sigma + 1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(c_skip), np.asarray(c_in), rtol=1e-6)
    # identity at t=0: c_skip=1, c_out=0
    c_skip0, c_out0, _, _ = trigflow_scalings_rf(jnp.asarray([0.0]), 1.0)
    np.testing.assert_allclose(np.asarray(c_skip0), 1.0)
    np.testing.assert_allclose(np.asarray(c_out0), 0.0, atol=1e-8)


@pytest.mark.level(0)
def test_trigflow_edm_scalings():
    t = jnp.asarray([0.5])
    c_skip, c_out, c_in, c_noise = trigflow_scalings_edm(t, 1.0)
    np.testing.assert_allclose(float(c_skip[0]), np.cos(0.5), rtol=1e-6)
    np.testing.assert_allclose(float(c_out[0]), np.sin(0.5), rtol=1e-6)
    np.testing.assert_allclose(float(c_noise[0]), 0.25 * np.log(np.tan(0.5)), rtol=1e-5)


@pytest.mark.level(0)
def test_default_schedule():
    assert DEFAULT_SAMPLING_TIMES[0] == pytest.approx(math.pi / 2)
    assert DEFAULT_SAMPLING_TIMES[1] == pytest.approx(math.atan(15.0))
    assert len(DEFAULT_SAMPLING_TIMES) == 4


@pytest.fixture(scope="module")
def distill_setup():
    net = dataclasses.replace(PRESETS["test"], dtype=jnp.float32, remat="none")
    cfg = DistillationConfig(model=RFModelConfig(net=net, state_t=2))
    dm = DistillationModel(cfg)
    shape = (1, 16, 2, 8, 8)
    student = dm.base.init_params(jax.random.PRNGKey(0), shape, text_len=8)
    teacher = dm.base.init_params(jax.random.PRNGKey(1), shape, text_len=8)
    critic = dm.base.init_params(jax.random.PRNGKey(2), shape, text_len=8)
    emb = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 1024)) * 0.05
    x0 = jax.random.normal(jax.random.PRNGKey(4), shape)
    cond = make_condition(emb).replace(gt_frames=x0)
    cond = cond.set_video_condition(x0, 1)
    return dm, student, teacher, critic, x0, cond, shape


@pytest.mark.level(1)
def test_fewstep_generate(distill_setup):
    dm, student, _, _, x0, cond, shape = distill_setup
    noise = jax.random.normal(jax.random.PRNGKey(5), shape)
    out = jax.jit(lambda p, n: dm.generate(p, n, cond, num_steps=4))(student, noise)
    assert out.shape == shape and np.isfinite(np.asarray(out)).all()
    # conditional frame 0 pinned to gt by denoise_replace_gt_frames
    np.testing.assert_allclose(np.asarray(out[:, :, 0]), np.asarray(x0[:, :, 0]), atol=1e-5)


@pytest.mark.level(1)
def test_generator_and_critic_losses(distill_setup):
    dm, student, teacher, critic, x0, cond, shape = distill_setup
    c, u = get_condition_uncondition(cond)

    loss_g, metrics_g = jax.jit(
        lambda s, t, f, r: dm.training_step_generator(s, t, f, r, x0, c, u, n_steps=2)
    )(student, teacher, critic, jax.random.PRNGKey(6))
    assert np.isfinite(float(loss_g))

    loss_c, metrics_c = jax.jit(
        lambda s, f, r: dm.training_step_critic(s, f, r, x0, c, n_steps=2)
    )(student, critic, jax.random.PRNGKey(7))
    assert np.isfinite(float(loss_c)) and float(loss_c) > 0

    # the generator loss gradient must flow into the student only
    g = jax.grad(lambda s: dm.training_step_generator(s, teacher, critic, jax.random.PRNGKey(6), x0, c, u, 2)[0])(
        student
    )
    gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert gnorm > 0

    # phase schedule: student every 5th iteration (freq=5)
    phases = [dm.is_student_phase(i) for i in range(10)]
    assert phases == [False, False, False, False, True] * 2
