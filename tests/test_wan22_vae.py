"""Wan2.2 VAE tests (4x temporal / 16x spatial, 48 latent channels)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.tokenizers.wan22_vae import (
    WAN22_LATENT_MEAN,
    WAN22_LATENT_STD,
    Wan22VAE,
    Wan22VAEConfig,
    avg_down_3d,
    dup_up_3d,
    patchify,
    unpatchify,
)


@pytest.mark.level(0)
def test_patchify_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 8, 8, 3), dtype=jnp.float32)
    p = patchify(x, 2)
    assert p.shape == (1, 2, 4, 4, 12)
    np.testing.assert_allclose(np.asarray(unpatchify(p, 2)), np.asarray(x), atol=0)


@pytest.mark.level(0)
def test_avg_down_dup_up_shapes():
    x = jnp.ones((1, 4, 8, 8, 6))
    d = avg_down_3d(x, out_channels=12, factor_t=2, factor_s=2)
    assert d.shape == (1, 2, 4, 4, 12)
    np.testing.assert_allclose(np.asarray(d), 1.0)  # mean of ones
    u = dup_up_3d(x, out_channels=6, factor_t=2, factor_s=2, first_chunk=True)
    # first_chunk drops factor_t-1 leading frames: 4*2-1 = 7
    assert u.shape == (1, 7, 16, 16, 6)


@pytest.mark.level(0)
def test_latent_stats():
    assert WAN22_LATENT_MEAN.shape == (48,) and WAN22_LATENT_STD.shape == (48,)
    assert np.all(WAN22_LATENT_STD > 0)


@pytest.mark.level(1)
def test_wan22_vae_shapes_and_causality():
    cfg = Wan22VAEConfig(dim=8, dec_dim=8, dtype=jnp.float32)
    vae = Wan22VAE(cfg)
    clip = jax.random.uniform(jax.random.PRNGKey(0), (1, 5, 32, 32, 3), minval=-1, maxval=1)
    params = vae.init(jax.random.PRNGKey(1), clip)
    z = vae.apply(params, clip, method=Wan22VAE.encode)
    assert z.shape == (1, 2, 2, 2, 48)  # 4x temporal, 16x spatial, 48ch
    rec = vae.apply(params, z, method=Wan22VAE.decode)
    assert rec.shape == (1, 5, 32, 32, 3)
    assert np.isfinite(np.asarray(rec)).all()
    # temporal causality of the encoder
    clip2 = clip.at[:, 3:].set(-clip[:, 3:])
    z2 = vae.apply(params, clip2, method=Wan22VAE.encode)
    np.testing.assert_allclose(np.asarray(z[:, 0]), np.asarray(z2[:, 0]), atol=1e-5)


@pytest.mark.level(1)
def test_wan22_vae_conversion_structure():
    import numpy as onp

    from cosmos_predict2_tpu.utils.checkpoint_convert import convert_wan22_vae_state_dict

    cfg = Wan22VAEConfig(dim=8, dec_dim=8, dtype=jnp.float32)
    vae = Wan22VAE(cfg)
    clip = jnp.zeros((1, 5, 32, 32, 3))
    ref_params = vae.init(jax.random.PRNGKey(0), clip)

    rng = onp.random.RandomState(0)
    sd = {}

    def conv3(name, ci, co, k=3):
        sd[name + ".weight"] = rng.randn(co, ci, *(k,) * 3 if k else (1, 1, 1)).astype("float32") * 0.05
        sd[name + ".bias"] = onp.zeros(co, "float32")

    def conv1x1x1(name, ci, co):
        sd[name + ".weight"] = rng.randn(co, ci, 1, 1, 1).astype("float32") * 0.05
        sd[name + ".bias"] = onp.zeros(co, "float32")

    def res(prefix, ci, co):
        sd[prefix + ".residual.0.gamma"] = onp.ones((ci, 1, 1, 1), "float32")
        conv3(prefix + ".residual.2", ci, co)
        sd[prefix + ".residual.3.gamma"] = onp.ones((co, 1, 1, 1), "float32")
        conv3(prefix + ".residual.6", co, co)
        if ci != co:
            conv1x1x1(prefix + ".shortcut", ci, co)

    def attn(prefix, c):
        sd[prefix + ".norm.gamma"] = onp.ones((c, 1, 1), "float32")
        sd[prefix + ".to_qkv.weight"] = rng.randn(3 * c, c, 1, 1).astype("float32") * 0.05
        sd[prefix + ".to_qkv.bias"] = onp.zeros(3 * c, "float32")
        sd[prefix + ".proj.weight"] = rng.randn(c, c, 1, 1).astype("float32") * 0.05
        sd[prefix + ".proj.bias"] = onp.zeros(c, "float32")

    def resample(prefix, c, time_conv, t_out_mult=1, t_stride=False):
        sd[prefix + ".resample.1.weight"] = rng.randn(c, c, 3, 3).astype("float32") * 0.05
        sd[prefix + ".resample.1.bias"] = onp.zeros(c, "float32")
        if time_conv:
            sd[prefix + ".time_conv.weight"] = rng.randn(c * t_out_mult, c, 3, 1, 1).astype("float32") * 0.05
            sd[prefix + ".time_conv.bias"] = onp.zeros(c * t_out_mult, "float32")

    edims = [8, 8, 16, 32, 32]
    conv3("encoder.conv1", 12, 8)
    tdown = (False, True, True)
    for s in range(4):
        ci = edims[s]
        for j in range(2):
            res(f"encoder.downsamples.{s}.downsamples.{j}", ci, edims[s + 1]); ci = edims[s + 1]
        if s != 3:
            resample(f"encoder.downsamples.{s}.downsamples.2", edims[s + 1], time_conv=tdown[s])
    res("encoder.middle.0", 32, 32); attn("encoder.middle.1", 32); res("encoder.middle.2", 32, 32)
    sd["encoder.head.0.gamma"] = onp.ones((32, 1, 1, 1), "float32")
    conv3("encoder.head.2", 32, 96)
    ddims = [32, 32, 32, 16, 8]
    tup = (True, True, False)
    conv3("decoder.conv1", 48, 32)
    res("decoder.middle.0", 32, 32); attn("decoder.middle.1", 32); res("decoder.middle.2", 32, 32)
    for s in range(4):
        ci = ddims[s]
        for j in range(3):
            res(f"decoder.upsamples.{s}.upsamples.{j}", ci, ddims[s + 1]); ci = ddims[s + 1]
        if s != 3:
            resample(f"decoder.upsamples.{s}.upsamples.3", ddims[s + 1], time_conv=tup[s], t_out_mult=2)
    sd["decoder.head.0.gamma"] = onp.ones((8, 1, 1, 1), "float32")
    conv3("decoder.head.2", 8, 12)
    conv1x1x1("conv1", 96, 96)
    conv1x1x1("conv2", 48, 48)

    converted = convert_wan22_vae_state_dict(sd, num_res_blocks=2, num_stages=4)
    ref_flat = {"/".join(map(str, k)): v.shape for k, v in jax.tree_util.tree_flatten_with_path(ref_params)[0]}
    got_flat = {"/".join(map(str, k)): onp.shape(v) for k, v in jax.tree_util.tree_flatten_with_path(converted)[0]}
    assert set(ref_flat) == set(got_flat), sorted(set(ref_flat) ^ set(got_flat))[:8]
    for k in ref_flat:
        assert ref_flat[k] == got_flat[k], (k, ref_flat[k], got_flat[k])
    z = vae.apply(jax.tree.map(jnp.asarray, converted), clip, method=Wan22VAE.encode)
    assert z.shape == (1, 2, 2, 2, 48)
