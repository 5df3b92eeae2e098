"""Remat policies ("none" / "block" / "selective") give identical gradients."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.networks.dit import MiniTrainDIT, PRESETS


@pytest.mark.level(0)
def test_remat_policies_same_gradients():
    base = dataclasses.replace(
        PRESETS["test"], dtype=jnp.float32, model_channels=64, num_heads=2,
        num_blocks=2, adaln_lora_dim=8,
    )
    B, C, T, H, W = 1, 16, 2, 4, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (B, C, T, H, W))
    ts = jnp.full((B,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 1024)) * 0.05

    grads = {}
    for mode in ("none", "block", "selective", "mixed:1"):
        net = MiniTrainDIT(dataclasses.replace(base, remat=mode))
        params = net.init(jax.random.PRNGKey(2), x, ts, ctx)

        def loss(p):
            return jnp.mean(jnp.square(net.apply(p, x, ts, ctx)))

        grads[mode] = jax.jit(jax.grad(loss))(params)

    flat_none = jax.tree.leaves(grads["none"])
    for mode in ("block", "selective", "mixed:1"):
        for a, b in zip(flat_none, jax.tree.leaves(grads[mode])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
