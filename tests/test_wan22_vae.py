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
