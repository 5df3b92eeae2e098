"""Wan2.1 DiT tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.networks.wan_dit import (
    WAN_PRESETS,
    WanModel,
    rope_apply_interleaved,
    sinusoidal_embedding_1d,
    wan_rope_freqs,
)
from cosmos_predict2_tpu.ops.rope import RopeSpec


@pytest.mark.level(0)
def test_sinusoidal_embedding_matches_torch_formula():
    import torch

    pos = np.array([0.0, 1.0, 500.0])
    got = np.asarray(sinusoidal_embedding_1d(8, jnp.asarray(pos)))
    p = torch.tensor(pos, dtype=torch.float64)
    sinusoid = torch.outer(p, torch.pow(10000, -torch.arange(4).double() / 4))
    expected = torch.cat([torch.cos(sinusoid), torch.sin(sinusoid)], dim=1).float().numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


@pytest.mark.level(0)
def test_interleaved_rope_rotation():
    spec = RopeSpec(head_dim=48, enable_fps_modulation=False)
    freqs = wan_rope_freqs(spec, 2, 2, 2)
    assert freqs.shape == (8, 24)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 2, 48))
    out = rope_apply_interleaved(x, freqs)
    # norm-preserving per pair
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1), np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5
    )
    # position 0 has zero angles -> identity
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(x[:, 0]), atol=1e-6)


@pytest.mark.level(1)
def test_wan_model_t2v_and_i2v():
    cfg = WAN_PRESETS["test"]
    B, T, H, W = 1, 2, 8, 8
    ts = jnp.full((B,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 512, 4096)) * 0.02

    # i2v: 16 latent + 20 conditional channels
    net = WanModel(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 16, T, H, W))
    y = jax.random.normal(jax.random.PRNGKey(2), (B, 20, T, H, W))
    clip_emb = jax.random.normal(jax.random.PRNGKey(3), (B, 257, 1280)) * 0.02
    params = net.init(jax.random.PRNGKey(4), x, ts, ctx, y_B_C_T_H_W=y, frame_cond_crossattn_emb=clip_emb)
    out = net.apply(params, x, ts, ctx, y_B_C_T_H_W=y, frame_cond_crossattn_emb=clip_emb)
    assert out.shape == (B, 16, T, H, W)
    assert np.isfinite(np.asarray(out)).all()

    # image branch affects output
    out2 = net.apply(params, x, ts, ctx, y_B_C_T_H_W=y, frame_cond_crossattn_emb=clip_emb * 2)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-5

    # t2v variant
    import dataclasses

    cfg_t2v = dataclasses.replace(cfg, model_type="t2v", in_dim=16)
    net2 = WanModel(cfg_t2v)
    params2 = net2.init(jax.random.PRNGKey(5), x, ts, ctx)
    out3 = net2.apply(params2, x, ts, ctx)
    assert out3.shape == (B, 16, T, H, W)


@pytest.mark.level(1)
def test_wan_model_layer_train_and_generate():
    import dataclasses as dc

    from cosmos_predict2_tpu.models.wan_video2world import (
        WanCondition,
        WanModelConfig,
        WanVideo2WorldModel,
    )

    cfg = WanModelConfig(net=WAN_PRESETS["test"], state_t=2)
    model = WanVideo2WorldModel(cfg)
    shape = (1, 16, 2, 8, 8)
    params = model.init_params(jax.random.PRNGKey(0), shape, text_len=16)

    x0 = jax.random.normal(jax.random.PRNGKey(1), shape)
    mask = jnp.zeros((1, 1, 2, 1, 1)).at[:, :, 0].set(1.0)
    cond = WanCondition(
        crossattn_emb=jax.random.normal(jax.random.PRNGKey(2), (1, 16, 4096)) * 0.02,
        clip_emb=jax.random.normal(jax.random.PRNGKey(3), (1, 257, 1280)) * 0.02,
        gt_frames=x0,
        condition_video_mask=mask,
    )
    loss, _ = jax.jit(model.training_step)(params, jax.random.PRNGKey(4), x0, cond)
    assert np.isfinite(float(loss))
    out = jax.jit(lambda p, n: model.generate(p, n, cond, guidance=2.0, num_steps=2))(
        params, jax.random.normal(jax.random.PRNGKey(5), shape)
    )
    assert out.shape == shape and np.isfinite(np.asarray(out)).all()
