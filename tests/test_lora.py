"""LoRA post-training tests."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.conditioning.conditioner import make_condition
from cosmos_predict2_tpu.models.video2world import RFModelConfig, Video2WorldModel
from cosmos_predict2_tpu.networks.dit import PRESETS
from cosmos_predict2_tpu.training.lora import (
    LoRAModelWrapper,
    count_lora_params,
    init_lora_params,
    merge_lora,
)


@pytest.fixture(scope="module")
def setup():
    net = dataclasses.replace(PRESETS["test"], dtype=jnp.float32, remat="none")
    model = Video2WorldModel(RFModelConfig(net=net, state_t=2))
    params = model.init_params(jax.random.PRNGKey(0), (1, 16, 2, 4, 4), text_len=8)
    return model, params


@pytest.mark.level(0)
def test_lora_init_targets(setup):
    model, params = setup
    lora = init_lora_params(jax.random.PRNGKey(1), params, rank=4)
    n = count_lora_params(lora)
    n_base = sum(int(x.size) for x in jax.tree.leaves(params))
    assert 0 < n < 0.1 * n_base
    # B zero-init => merge is identity at init
    merged = merge_lora(params, lora)
    l1 = jax.tree.leaves(params)
    l2 = jax.tree.leaves(merged)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)


@pytest.mark.level(1)
def test_lora_train_updates_only_adapters(setup):
    import optax

    model, params = setup
    wrapper = LoRAModelWrapper(model, params, rank=4, alpha=4.0)
    lora = wrapper.init_lora(jax.random.PRNGKey(2))
    x0 = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 2, 4, 4))
    emb = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 1024)) * 0.05
    cond = make_condition(emb).replace(gt_frames=x0)

    opt = optax.adam(1e-3)
    opt_state = opt.init(lora)

    @jax.jit
    def step(lora, opt_state, rng):
        (loss, _), grads = jax.value_and_grad(
            lambda l: wrapper.training_step(l, rng, x0, cond), has_aux=True
        )(lora)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(lora, updates), opt_state, loss

    losses = []
    for i in range(3):
        lora, opt_state, loss = step(lora, opt_state, jax.random.PRNGKey(10 + i))
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    # adapters actually changed (the "b" matrices start at exactly zero)
    b_total = sum(
        float(jnp.abs(l["b"]).sum())
        for l in jax.tree.leaves(lora, is_leaf=lambda x: isinstance(x, dict) and "b" in x)
        if isinstance(l, dict)
    )
    assert b_total > 0
