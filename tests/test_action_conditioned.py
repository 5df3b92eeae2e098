"""Action-conditioned variant tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.conditioning.conditioner import make_condition
from cosmos_predict2_tpu.models.action_conditioned import (
    ActionConditionedVideo2WorldModel,
    action_conditioned_model_config,
    euler2rotm,
    relative_actions_from_states,
    rotm2euler,
)
from cosmos_predict2_tpu.networks.dit import PRESETS


@pytest.mark.level(0)
def test_euler_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        rpy = rng.uniform(-1.2, 1.2, 3)
        np.testing.assert_allclose(rotm2euler(euler2rotm(rpy)), rpy, atol=1e-8)


@pytest.mark.level(0)
def test_relative_actions():
    # pure translation along x with identity rotation
    arm = np.zeros((3, 6))
    arm[1, 0] = 0.1
    arm[2, 0] = 0.3
    grip = np.array([0.0, 0.5, 1.0])
    acts = relative_actions_from_states(arm, grip, action_scaler=1.0)
    assert acts.shape == (2, 7)
    np.testing.assert_allclose(acts[0], [0.1, 0, 0, 0, 0, 0, 0.5], atol=1e-8)
    np.testing.assert_allclose(acts[1], [0.2, 0, 0, 0, 0, 0, 1.0], atol=1e-8)
    # rotation invariance: rotating the base frame doesn't change rel action
    arm2 = arm.copy()
    arm2[:, 5] = 0.7  # constant yaw
    acts2 = relative_actions_from_states(arm2, grip, action_scaler=1.0)
    R = euler2rotm([0, 0, 0.7])
    np.testing.assert_allclose(acts2[0, :3], R.T @ acts[0, :3], atol=1e-8)


@pytest.mark.level(1)
def test_action_conditioned_training_and_sampling():
    net = dataclasses.replace(PRESETS["test"], dtype=jnp.float32, remat="none")
    cfg = action_conditioned_model_config(net, action_dim=7, num_action_per_chunk=4, state_t=2)
    model = ActionConditionedVideo2WorldModel(cfg)
    shape = (1, 16, 2, 8, 8)
    params = model.init_params(jax.random.PRNGKey(0), shape, text_len=8)
    # action embedder params exist
    assert "action_embedder_B_D" in params["params"]

    x0 = jax.random.normal(jax.random.PRNGKey(1), shape)
    action = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 7)) * 0.1
    cond = make_condition(jnp.zeros((1, 8, 1024))).replace(gt_frames=x0, action=action)
    loss, _ = jax.jit(model.training_step)(params, jax.random.PRNGKey(3), x0, cond)
    assert np.isfinite(float(loss))

    noise = jax.random.normal(jax.random.PRNGKey(4), shape)
    lat = model.generate(params, noise, cond, guidance=2.0, num_steps=2, num_conditional_frames=1)
    assert np.isfinite(np.asarray(lat)).all()
    # actions influence the output
    cond2 = cond.replace(action=action + 1.0)
    lat2 = model.generate(params, noise, cond2, guidance=2.0, num_steps=2, num_conditional_frames=1)
    assert np.abs(np.asarray(lat) - np.asarray(lat2))[:, :, 1:].max() > 1e-4


@pytest.mark.level(1)
def test_action_inference_pipeline():
    from cosmos_predict2_tpu.models.action_conditioned import (
        ActionConditionedInference,
        ActionConditionedVideo2WorldModel,
        action_conditioned_model_config,
        get_action_sequence_from_states,
    )
    from cosmos_predict2_tpu.networks.dit import PRESETS
    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig

    net = dataclasses.replace(PRESETS["test"], dtype=jnp.float32, remat="none")
    cfg = action_conditioned_model_config(net, action_dim=7, num_action_per_chunk=4,
                                          state_t=2, sampling_num_steps=2)
    model = ActionConditionedVideo2WorldModel(cfg)
    latent_shape = (1, 16, 2, 4, 4)
    x = jnp.zeros(latent_shape)
    params = model.net.init(
        jax.random.PRNGKey(0), x, jnp.zeros((1,)), jnp.zeros((1, 8, 1024)),
        condition_mask=jnp.zeros((1, 1, 2, 4, 4)), action=jnp.zeros((1, 4, 7)),
    )
    vae_cfg = WanVAEConfig(dim=16, dtype=jnp.float32)
    vae = WanVAE(vae_cfg)
    vae_params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 5, 32, 32, 3)))

    # robot states -> actions
    rng = np.random.RandomState(0)
    arm = rng.randn(9, 6) * 0.01
    grip = rng.rand(9)
    actions = get_action_sequence_from_states(arm, grip, fps_downsample_ratio=2)
    assert actions.shape == (4, 7)

    pipe = ActionConditionedInference(model, params, vae, vae_params)
    video = np.zeros((1, 5, 32, 32, 3), dtype=np.uint8)
    video[:, 0] = 127
    emb = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (1, 8, 1024))) * 0.05
    out = pipe.generate(video, actions, jnp.asarray(emb), num_steps=2, guidance=2.0)
    assert out.shape == (5, 32, 32, 3) and out.dtype == np.uint8
