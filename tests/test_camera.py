"""Camera-conditioned Video2World: mask layout, plumbing, generation."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.conditioning.conditioner import DataType, make_condition
from cosmos_predict2_tpu.models.camera import CameraVideo2WorldModel, reorder_camera_chunks
from cosmos_predict2_tpu.models.video2world import RFModelConfig
from cosmos_predict2_tpu.networks.dit import PRESETS


def _model():
    net = dataclasses.replace(
        PRESETS["test"], dtype=jnp.float32, remat="none", model_channels=64,
        num_heads=2, adaln_lora_dim=8, camera_dim=6,
    )
    return CameraVideo2WorldModel(RFModelConfig(net=net, state_t=6, sampling_num_steps=2))


@pytest.mark.level(0)
def test_reorder_camera_chunks():
    cam = jnp.arange(6)[None, :, None] * jnp.ones((1, 6, 3))
    out = reorder_camera_chunks(cam, n_chunks=3)
    np.testing.assert_array_equal(np.asarray(out[0, :, 0]), [2, 3, 0, 1, 4, 5])


@pytest.mark.level(0)
def test_middle_chunk_mask():
    model = _model()
    cond = make_condition(jnp.zeros((1, 8, 1024)), data_type=DataType.VIDEO)
    gt = jnp.ones((1, 16, 6, 4, 4))
    cond = model.set_camera_condition(cond, gt, num_conditional_frames=2)
    mask = np.asarray(cond.condition_video_mask[0, 0, :, 0, 0])
    np.testing.assert_array_equal(mask, [0, 0, 1, 1, 0, 0])


@pytest.mark.level(1)
def test_camera_generate_and_sensitivity():
    model = _model()
    latent_shape = (1, 16, 6, 4, 4)
    # init with camera kwarg so cam_encoder params exist
    x = jnp.zeros(latent_shape)
    ts = jnp.zeros((1,))
    ctx = jnp.zeros((1, 8, 1024))
    cam = jax.random.normal(jax.random.PRNGKey(0), (1, 6, 2, 2, 6))  # patch 2x2, pt 1
    params = model.net.init(jax.random.PRNGKey(1), x, ts, ctx, camera=cam)

    text = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 1024)) * 0.05
    cond_latents = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 2, 4, 4))
    gt = model.pack_inference_latents(cond_latents)
    condition = make_condition(text, data_type=DataType.VIDEO).replace(gt_frames=gt, camera=cam)
    noise = jax.random.normal(jax.random.PRNGKey(4), latent_shape)

    out = jax.jit(
        lambda p, n, c: model.generate(p, n, c, guidance=1.5, num_conditional_frames=2)
    )(params, noise, condition)
    assert out.shape == latent_shape and np.isfinite(np.asarray(out)).all()
    # camera input must influence the prediction
    cond2 = condition.replace(camera=-cam * 3.0)
    out2 = jax.jit(
        lambda p, n, c: model.generate(p, n, c, guidance=1.5, num_conditional_frames=2)
    )(params, noise, cond2)
    assert float(jnp.max(jnp.abs(out - out2))) > 1e-4


@pytest.mark.level(0)
def test_frameinit_and_ar_masks():
    from cosmos_predict2_tpu.models.camera import (
        CameraARVideo2WorldModel,
        CameraFrameinitVideo2WorldModel,
        reorder_camera_chunks_ar,
    )

    net = dataclasses.replace(PRESETS["test"], dtype=jnp.float32, camera_dim=6)
    gt = jnp.ones((1, 16, 9, 2, 2))
    cond = make_condition(jnp.zeros((1, 8, 1024)), data_type=DataType.VIDEO)

    fi = CameraFrameinitVideo2WorldModel(RFModelConfig(net=net, state_t=9))
    m = np.asarray(fi.set_camera_condition(cond, gt, 1).condition_video_mask[0, 0, :, 0, 0])
    np.testing.assert_array_equal(m, [1, 0, 0, 1, 0, 0, 1, 0, 0])  # frame 0 + chunk starts

    gt10 = jnp.ones((1, 16, 10, 2, 2))
    ar = CameraARVideo2WorldModel(RFModelConfig(net=net, state_t=10))
    m = np.asarray(ar.set_camera_condition(cond, gt10, 1).condition_video_mask[0, 0, :, 0, 0])
    np.testing.assert_array_equal(m, [1, 1, 0, 0, 0, 0, 0, 0, 1, 1])  # first/last 2k

    cam = jnp.arange(10)[None, :, None] * jnp.ones((1, 10, 3))
    out = reorder_camera_chunks_ar(cam)
    np.testing.assert_array_equal(np.asarray(out[0, :, 0]), [0, 1, 2, 3, 8, 9, 4, 5, 6, 7])
