"""Video2World model tests: training step, frame conditioning, sampling."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.conditioning.conditioner import (
    DataType,
    apply_train_dropout,
    get_condition_uncondition,
    make_condition,
)
from cosmos_predict2_tpu.models.video2world import RFModelConfig, Video2WorldModel
from cosmos_predict2_tpu.networks.dit import PRESETS


def tiny_model(**kw):
    net = dataclasses.replace(PRESETS["test"], dtype=jnp.float32, remat="none")
    return Video2WorldModel(RFModelConfig(net=net, state_t=4, **kw))


LATENT = (2, 16, 4, 8, 8)


@pytest.fixture(scope="module")
def model_and_params():
    model = tiny_model()
    params = model.init_params(jax.random.PRNGKey(0), LATENT, text_len=8)
    return model, params


def _condition(B=2, T=4, gt=None):
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 1024)) * 0.05
    cond = make_condition(emb)
    if gt is not None:
        cond = cond.replace(gt_frames=gt)
    return cond


@pytest.mark.level(0)
def test_training_step_finite_and_scaled(model_and_params):
    model, params = model_and_params
    x0 = jax.random.normal(jax.random.PRNGKey(2), LATENT)
    cond = _condition(gt=x0)
    loss, metrics = jax.jit(model.training_step)(params, jax.random.PRNGKey(3), x0, cond)
    assert np.isfinite(float(loss))
    # freshly-initialized net outputs ~0 (zero-init AdaLN gates ->
    # residual-only? no: gates are zero-init so output ~ final layer of
    # raw patch path). loss_scale=10 applied:
    assert float(loss) > 0


@pytest.mark.level(0)
def test_frame_replace_zeroes_loss_on_conditional_frames(model_and_params):
    """With k conditional frames, v_pred equals gt velocity there."""
    model, params = model_and_params
    x0 = jax.random.normal(jax.random.PRNGKey(2), LATENT)
    noise = jax.random.normal(jax.random.PRNGKey(4), LATENT)
    cond = _condition(gt=x0).set_video_condition(x0, 2)
    v = model.denoise(params, noise, noise, jnp.full((2, 1), 500.0), cond)
    gt_vel = np.asarray(noise - x0)
    np.testing.assert_allclose(np.asarray(v)[:, :, :2], gt_vel[:, :, :2], rtol=1e-5, atol=1e-5)
    # non-conditional frames differ from gt velocity
    assert np.abs(np.asarray(v)[:, :, 2:] - gt_vel[:, :, 2:]).max() > 1e-3


@pytest.mark.level(0)
def test_uncondition_zeroes_text(model_and_params):
    cond = _condition()
    c, u = get_condition_uncondition(cond)
    assert np.asarray(u.crossattn_emb).max() == 0
    assert bool(np.asarray(c.use_video_condition))
    assert not bool(np.asarray(u.use_video_condition))


@pytest.mark.level(0)
def test_train_dropout_shapes():
    cond = _condition()
    out = apply_train_dropout(jax.random.PRNGKey(0), cond, text_dropout_rate=0.5)
    assert out.crossattn_emb.shape == cond.crossattn_emb.shape


@pytest.mark.level(1)
def test_generate_conditional_frames_fixed(model_and_params):
    """Sampling keeps the first conditional latent frame equal to gt."""
    model, params = model_and_params
    x0 = jax.random.normal(jax.random.PRNGKey(2), LATENT)
    cond = _condition(gt=x0)
    noise = jax.random.normal(jax.random.PRNGKey(5), LATENT)
    latents = jax.jit(
        lambda p, n: model.generate(p, n, cond, guidance=2.0, num_steps=4, num_conditional_frames=1)
    )(params, noise)
    assert np.isfinite(np.asarray(latents)).all()
    # frame 0 must be exactly the gt frame: velocity there is noise - x0, so
    # the flow transports noise -> x0 along the exact linear path, and the
    # final UniPC step outputs x0 = x - sigma*v exactly.
    np.testing.assert_allclose(np.asarray(latents[:, :, 0]), np.asarray(x0[:, :, 0]), rtol=1e-3, atol=1e-3)


@pytest.mark.level(0)
def test_image_batch_condition():
    emb = jnp.zeros((1, 8, 1024))
    cond = make_condition(emb, data_type=DataType.IMAGE)
    assert not cond.is_video
    gt = jnp.zeros((1, 16, 1, 8, 8))
    c = cond.set_video_condition(gt, 1)
    assert np.asarray(c.condition_video_mask).sum() == 0  # T=1 -> no cond frames


@pytest.mark.level(0)
def test_high_sigma_strategy():
    """ratio=1 pushes every sampled timestep into [t_min, t_max]
    (reference text2world_model_rectified_flow.py:375-390)."""
    model = tiny_model(use_high_sigma_strategy=True, high_sigma_ratio=1.0)
    ts, sig = model.rectified_flow.discretize(jnp.linspace(0.01, 0.99, 8))
    ts2, sig2 = model.rectified_flow.apply_high_sigma(jax.random.PRNGKey(0), ts, sig, 1.0, 980, 1000)
    assert bool(((np.asarray(ts2) >= 980) & (np.asarray(ts2) <= 1000)).all())
    # sigmas stay consistent with the schedule (sigma = t/1000 on this map)
    np.testing.assert_allclose(np.asarray(sig2), np.asarray(ts2) / 1000.0, rtol=1e-5)
    # ratio=0 must be a no-op
    ts3, _ = model.rectified_flow.apply_high_sigma(jax.random.PRNGKey(0), ts, sig, 0.0)
    np.testing.assert_allclose(np.asarray(ts3), np.asarray(ts))
    # training step still runs with the flag on
    params = model.init_params(jax.random.PRNGKey(0), LATENT, text_len=8)
    x0 = jax.random.normal(jax.random.PRNGKey(2), LATENT)
    loss, metrics = model.training_step(params, jax.random.PRNGKey(3), x0, _condition(gt=x0))
    assert np.isfinite(float(loss))
    assert float(metrics["sigma_mean"]) > 0.97  # all samples near sigma=1
