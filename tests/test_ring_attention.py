"""Ring attention == single-device attention (fwd + grad), on the CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from cosmos_predict2_tpu.parallel.ring_attention import ring_attention


def _reference(q, k, v, frame_group=0):
    D = q.shape[-1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(D)
    if frame_group > 0:
        S = q.shape[1]
        row, col = jnp.arange(S)[:, None], jnp.arange(S)[None, :]
        s = jnp.where((col // frame_group) <= (row // frame_group), s, -jnp.inf)
    return jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(s, axis=-1), v)


def _mesh(cp):
    devs = np.array(jax.devices()[:cp]).reshape(cp)
    return Mesh(devs, ("cp",))


@pytest.mark.chips(8)
@pytest.mark.level(0)
@pytest.mark.parametrize("cp,frame_group", [(4, 0), (8, 0), (4, 8)])
def test_ring_matches_reference(cp, frame_group):
    rng = jax.random.PRNGKey(0)
    B, S, H, D = 2, 32, 4, 16
    q, k, v = (jax.random.normal(r, (B, S, H, D)) for r in jax.random.split(rng, 3))
    want = _reference(q, k, v, frame_group)
    mesh = _mesh(cp)
    spec = jax.NamedSharding(mesh, P(None, "cp", None, None))
    with jax.set_mesh(mesh):
        qs, ks, vs = (jax.device_put(t, spec) for t in (q, k, v))
        got = jax.jit(lambda a, b, c: ring_attention(a, b, c, frame_group=frame_group))(qs, ks, vs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


@pytest.mark.chips(8)
@pytest.mark.level(0)
def test_ring_gradients_match():
    rng = jax.random.PRNGKey(1)
    B, S, H, D = 1, 32, 4, 8
    q, k, v = (jax.random.normal(r, (B, S, H, D)) for r in jax.random.split(rng, 3))
    tgt = jax.random.normal(jax.random.PRNGKey(2), (B, S, H, D))

    def loss_ref(q, k, v):
        return jnp.mean((_reference(q, k, v) - tgt) ** 2)

    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    mesh = _mesh(4)
    spec = jax.NamedSharding(mesh, P(None, "cp", None, None))
    with jax.set_mesh(mesh):
        qs, ks, vs = (jax.device_put(t, spec) for t in (q, k, v))
        ts = jax.device_put(tgt, spec)

        def loss_ring(q, k, v):
            return jnp.mean((ring_attention(q, k, v) - ts) ** 2)

        got = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(qs, ks, vs)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=2e-5, rtol=2e-5)


@pytest.mark.chips(8)
@pytest.mark.level(1)
def test_dit_forward_with_ring_cp():
    """Full tiny DiT forward with ring CP == single device (same weights)."""
    import dataclasses

    from cosmos_predict2_tpu.networks.dit import MiniTrainDIT, PRESETS
    from cosmos_predict2_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(1, 1, 4, 1, devices=jax.devices()[:4])
    cfg = dataclasses.replace(
        PRESETS["test"], dtype=jnp.float32, remat="none", model_channels=256,
        num_heads=4, adaln_lora_dim=32,
    )
    cfg_cp = dataclasses.replace(cfg, cp_axis="cp", cp_strategy="ring")
    net, net_cp = MiniTrainDIT(cfg), MiniTrainDIT(cfg_cp)

    B, C, T, H, W = 1, 16, 4, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (B, C, T, H, W))
    ts = jnp.full((B,), 700.0)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (B, 8, 1024)) * 0.05
    params = net.init(jax.random.PRNGKey(2), x, ts, ctx)

    expected = net.apply(params, x, ts, ctx)
    with jax.set_mesh(mesh):
        xs = jax.device_put(x, jax.NamedSharding(mesh, P(None, None, "cp")))
        got = jax.jit(lambda p, a: net_cp.apply(p, a, ts, ctx))(params, xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4)
