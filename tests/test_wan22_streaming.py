"""Wan2.2 streaming VAE == full-clip (exact, shared weights)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.tokenizers.wan22_vae import Wan22VAE, Wan22VAEConfig
from cosmos_predict2_tpu.tokenizers.wan22_vae_streaming import (
    decode_streaming,
    encode_streaming,
)

CFG = Wan22VAEConfig(dim=8, dec_dim=8, dtype=jnp.float32)


@pytest.fixture(scope="module")
def vae_and_params():
    vae = Wan22VAE(CFG)
    clip = jax.random.uniform(jax.random.PRNGKey(0), (1, 5, 32, 32, 3), minval=-1, maxval=1)
    params = vae.init(jax.random.PRNGKey(1), clip)
    return vae, params


@pytest.mark.level(1)
def test_streaming_encode_exact(vae_and_params):
    vae, params = vae_and_params
    clip = jax.random.uniform(jax.random.PRNGKey(2), (1, 9, 32, 32, 3), minval=-1, maxval=1)
    want = vae.apply(params, clip, method=Wan22VAE.encode)
    got = encode_streaming(CFG, params, clip)
    assert got.shape == want.shape == (1, 3, 2, 2, 48)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.level(1)
def test_streaming_decode_exact(vae_and_params):
    vae, params = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 2, 2, 48)) * 0.5
    want = vae.apply(params, z, method=Wan22VAE.decode)
    got = decode_streaming(CFG, params, z)
    assert got.shape == want.shape == (1, 9, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


@pytest.mark.level(1)
def test_streaming_roundtrip_chunked(vae_and_params):
    """Chunk size 8 (two latent frames per encode chunk) also agrees."""
    vae, params = vae_and_params
    clip = jax.random.uniform(jax.random.PRNGKey(4), (1, 13, 32, 32, 3), minval=-1, maxval=1)
    want = vae.apply(params, clip, method=Wan22VAE.encode)
    got = encode_streaming(CFG, params, clip, chunk_frames=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
