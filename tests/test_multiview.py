"""Multiview variant tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.conditioning.conditioner import make_condition
from cosmos_predict2_tpu.models.multiview import (
    MultiviewVid2VidModel,
    multiview_model_config,
    stack_views,
    unstack_views,
    view_grid,
)
from cosmos_predict2_tpu.networks.dit import PRESETS


@pytest.mark.level(0)
def test_view_packing_roundtrip():
    views = [jnp.full((1, 4, 2, 2, 2), i, dtype=jnp.float32) for i in range(3)]
    packed = stack_views(views)
    assert packed.shape == (1, 4, 6, 2, 2)
    out = unstack_views(packed, 3)
    for i, v in enumerate(out):
        assert float(v[0, 0, 0, 0, 0]) == i


@pytest.mark.level(0)
def test_view_grid():
    clips = [np.full((2, 4, 4, 3), i, dtype=np.uint8) for i in range(7)]
    grid = view_grid(clips, cols=4)
    assert grid.shape == (2, 8, 16, 3)
    assert grid[0, 0, 0, 0] == 0 and grid[0, 4, 0, 0] == 4


@pytest.mark.level(1)
def test_multiview_training_and_cross_view_isolation():
    V, Tv = 3, 2
    net = dataclasses.replace(
        PRESETS["test"], dtype=jnp.float32, remat="none", tokens_per_view=4
    )
    cfg = multiview_model_config(net, n_views=V, state_t=Tv, view_condition_dim=4)
    model = MultiviewVid2VidModel(cfg)
    shape = (1, 16, V * Tv, 4, 4)
    params = model.init_params(jax.random.PRNGKey(0), shape, text_len=V * 4)
    assert "view_embeddings" in params["params"]

    x0 = jax.random.normal(jax.random.PRNGKey(1), shape)
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, V * 4, 1024)) * 0.02
    cond = model.set_multiview_condition(make_condition(emb), x0, 1)
    # mask marks frame 0 of each view
    m = np.asarray(cond.condition_video_mask)[0, 0, :, 0, 0]
    np.testing.assert_array_equal(m, [1, 0, 1, 0, 1, 0])

    loss, _ = jax.jit(model.training_step)(params, jax.random.PRNGKey(3), x0, cond)
    assert np.isfinite(float(loss))

    # per-view cross-attention: caption of view 2 must not affect view 0
    # when self-attention mixing is suppressed? (self-attn is global, so
    # instead check: permuting captions changes output)
    noise = jax.random.normal(jax.random.PRNGKey(4), shape)
    v1 = model.denoise(params, noise, noise, jnp.full((1, 1), 500.0), cond)
    emb2 = emb.at[:, 4:8].set(emb[:, 0:4])
    cond2 = cond.replace(crossattn_emb=emb2)
    v2 = model.denoise(params, noise, noise, jnp.full((1, 1), 500.0), cond2)
    assert np.abs(np.asarray(v1) - np.asarray(v2)).max() > 1e-5


@pytest.mark.level(1)
def test_multiview_inference_pipeline():
    import dataclasses

    from cosmos_predict2_tpu.inference.multiview import (
        MultiviewInference,
        MultiviewInferenceArguments,
    )
    from cosmos_predict2_tpu.models.multiview import MultiviewVid2VidModel, multiview_model_config
    from cosmos_predict2_tpu.networks.dit import PRESETS
    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig

    net = dataclasses.replace(
        PRESETS["test"], dtype=jnp.float32, remat="none", model_channels=64, num_heads=2, adaln_lora_dim=8
    )
    cfg = multiview_model_config(net, n_views=2, state_t=2, sampling_num_steps=2)
    model = MultiviewVid2VidModel(cfg)
    latent_shape = (1, 16, 4, 4, 4)  # V*tv = 4
    params = model.init_params(jax.random.PRNGKey(0), latent_shape, text_len=16)
    vae_cfg = WanVAEConfig(dim=16, dtype=jnp.float32)
    vae = WanVAE(vae_cfg)
    vae_params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 5, 32, 32, 3)))

    pipe = MultiviewInference(
        model, params, vae_params, vae_cfg,
        text_encoder=lambda prompts: jnp.ones((len(prompts), 8, 1024)) * 0.01,
        height=32, width=32,
    )
    assert pipe.frames_per_view == 5
    videos = np.random.RandomState(0).randint(0, 255, (2, 5, 32, 32, 3), dtype=np.uint8)
    args = MultiviewInferenceArguments(
        prompt="driving", inference_type="image2world", n_views=2, num_steps=2, guidance=2.0
    )
    frames, grid = pipe.generate(args, videos)
    assert frames.shape == (2, 5, 32, 32, 3) and frames.dtype == np.uint8
    assert grid.shape == (5, 32, 64, 3)
