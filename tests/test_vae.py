"""Wan VAE tests: shape contracts, frame mapping, causality."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig


@pytest.fixture(scope="module")
def vae_and_params():
    cfg = WanVAEConfig(dim=16, dtype=jnp.float32)
    vae = WanVAE(cfg)
    clip = jnp.zeros((1, 5, 32, 32, 3))
    params = vae.init(jax.random.PRNGKey(0), clip)
    return vae, params


@pytest.mark.level(0)
@pytest.mark.parametrize("frames,latent_frames", [(1, 1), (5, 2), (9, 3), (17, 5)])
def test_frame_mapping(vae_and_params, frames, latent_frames):
    """latent frames = 1 + (pixel_frames - 1) // 4 (wan2pt1.py:1029-1033)."""
    vae, params = vae_and_params
    clip = jax.random.uniform(jax.random.PRNGKey(1), (1, frames, 32, 32, 3), minval=-1, maxval=1)
    z = vae.apply(params, clip, method=WanVAE.encode)
    assert z.shape == (1, latent_frames, 4, 4, 16)
    rec = vae.apply(params, z, method=WanVAE.decode)
    assert rec.shape == (1, (latent_frames - 1) * 4 + 1, 32, 32, 3)


@pytest.mark.level(0)
def test_encoder_is_temporally_causal(vae_and_params):
    """Changing future pixel frames must not change earlier latent frames."""
    vae, params = vae_and_params
    rng = jax.random.PRNGKey(2)
    clip = jax.random.uniform(rng, (1, 9, 32, 32, 3), minval=-1, maxval=1)
    z1 = vae.apply(params, clip, method=WanVAE.encode)
    clip2 = clip.at[:, 5:].set(-clip[:, 5:])  # perturb frames 5..8
    z2 = vae.apply(params, clip2, method=WanVAE.encode)
    # latent frame 0 covers pixel frame 0; latent frame 1 covers 1-4.
    np.testing.assert_allclose(np.asarray(z1[:, 0]), np.asarray(z2[:, 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(z1[:, 1]), np.asarray(z2[:, 1]), atol=1e-6)
    assert np.abs(np.asarray(z1[:, 2]) - np.asarray(z2[:, 2])).max() > 1e-4


@pytest.mark.level(0)
def test_decoder_is_temporally_causal(vae_and_params):
    vae, params = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 4, 4, 16))
    r1 = vae.apply(params, z, method=WanVAE.decode)
    z2 = z.at[:, 2:].set(-z[:, 2:])
    r2 = vae.apply(params, z2, method=WanVAE.decode)
    # pixel frames 0..4 come from latent frames 0..1 only
    np.testing.assert_allclose(np.asarray(r1[:, :5]), np.asarray(r2[:, :5]), atol=1e-5)
    assert np.abs(np.asarray(r1[:, 5:]) - np.asarray(r2[:, 5:])).max() > 1e-4


@pytest.mark.level(0)
def test_latent_normalization_roundtrip(vae_and_params):
    """encode applies (mu - mean)/std; decode un-applies it before conv."""
    from cosmos_predict2_tpu.tokenizers.wan_vae import WAN_LATENT_MEAN, WAN_LATENT_STD

    assert WAN_LATENT_MEAN.shape == (16,) and WAN_LATENT_STD.shape == (16,)
    assert np.all(WAN_LATENT_STD > 0)


@pytest.mark.level(1)
def test_gradients_flow_through_vae(vae_and_params):
    vae, params = vae_and_params
    clip = jax.random.uniform(jax.random.PRNGKey(4), (1, 5, 16, 16, 3), minval=-1, maxval=1)

    def loss(p):
        z = vae.apply(p, clip, method=WanVAE.encode)
        rec = vae.apply(p, z, method=WanVAE.decode)
        return jnp.mean((rec - clip) ** 2)

    g = jax.grad(loss)(params)
    gnorm = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.level(1)
def test_streaming_encode_decode_exact(vae_and_params):
    """Cache-carrying streaming must agree with full-clip processing."""
    from cosmos_predict2_tpu.tokenizers.wan_vae_streaming import (
        decode_streaming,
        encode_streaming,
    )

    vae, params = vae_and_params
    clip = jax.random.uniform(jax.random.PRNGKey(7), (1, 17, 16, 16, 3), minval=-1, maxval=1)
    z_full = vae.apply(params, clip, method=WanVAE.encode)
    z_stream = encode_streaming(vae.config, params, clip, chunk_frames=4)
    assert z_stream.shape == z_full.shape
    np.testing.assert_allclose(np.asarray(z_stream), np.asarray(z_full), atol=1e-4)

    px_full = vae.apply(params, z_full, method=WanVAE.decode)
    px_stream = decode_streaming(vae.config, params, z_full, chunk_latent_frames=1)
    assert px_stream.shape == px_full.shape
    np.testing.assert_allclose(np.asarray(px_stream), np.asarray(px_full), atol=1e-3)


@pytest.mark.level(1)
def test_streaming_encode_uint8_route(vae_and_params):
    """pixel_format="uint8" (fused in-program normalize, production feed)
    must match the float route on the same normalized pixels."""
    from cosmos_predict2_tpu.tokenizers.wan_vae_streaming import encode_streaming

    vae, params = vae_and_params
    rng = np.random.default_rng(3)
    clip_u8 = jnp.asarray(rng.integers(0, 256, size=(1, 17, 16, 16, 3), dtype=np.uint8))
    # the fused normalize runs in the config dtype (bf16 in every shipped
    # config; float32 in this CPU fixture) — feed the float route the same
    clip_f = clip_u8.astype(vae.config.dtype) / 127.5 - 1.0
    z_f = encode_streaming(vae.config, params, clip_f, chunk_frames=4)
    z_u8 = encode_streaming(vae.config, params, clip_u8, chunk_frames=4, pixel_format="uint8")
    assert z_u8.shape == z_f.shape and z_u8.dtype == z_f.dtype
    np.testing.assert_allclose(
        np.asarray(z_u8, np.float32), np.asarray(z_f, np.float32), atol=2e-3
    )


@pytest.mark.level(1)
def test_streaming_decode_pallas_conv_backend(vae_and_params):
    """The Pallas conv3d backend must reproduce the XLA streaming decode.

    Runs the kernel in interpreter mode with the channel gate lowered so the
    toy-width convs actually take the Pallas path (on the chip the same
    routing fires for the production 96/192/384-channel stages).
    """
    from cosmos_predict2_tpu.tokenizers import wan_vae_streaming as wvs

    vae, params = vae_and_params
    z = jax.random.normal(jax.random.PRNGKey(9), (1, 3, 4, 4, 16)) * 0.5
    ref = wvs.decode_streaming(vae.config, params, z, chunk_latent_frames=1)
    old_min = wvs._PALLAS_MIN_CH
    wvs.set_conv_backend("interpret")
    wvs._PALLAS_MIN_CH = 8
    try:
        out = wvs.decode_streaming(vae.config, params, z, chunk_latent_frames=1)
    finally:
        wvs.set_conv_backend("auto")
        wvs._PALLAS_MIN_CH = old_min
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


@pytest.mark.chips(8)
@pytest.mark.level(0)
def test_pallas_conv_disabled_under_multi_device_mesh():
    """The Pallas conv3d has no GSPMD partitioning rule: under an ambient
    multi-device mesh (the spatially-sharded decode) routing must fall back
    to the XLA conv."""
    from cosmos_predict2_tpu.parallel.mesh import make_mesh
    from cosmos_predict2_tpu.tokenizers.wan_vae_streaming import _use_pallas_conv

    x = jnp.zeros((1, 3, 8, 16, 64), jnp.bfloat16)
    w = jnp.zeros((3, 3, 3, 64, 64), jnp.bfloat16)
    assert _use_pallas_conv(x, w, "interpret")  # qualifies without a mesh
    mesh = make_mesh(1, 2, 2, 1, devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        assert not _use_pallas_conv(x, w, "interpret")


@pytest.mark.level(1)
def test_vae_interface_normalization(vae_and_params):
    from cosmos_predict2_tpu.tokenizers.interface import VAEInterfaceConfig, WanVAEInterface
    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAEConfig

    vae, params = vae_and_params
    iface = WanVAEInterface(VAEInterfaceConfig(vae=vae.config), params)
    assert iface.get_latent_num_frames(81) == 21
    assert iface.get_pixel_num_frames(21) == 81
    assert iface.latent_chunk_duration == 21

    clip = jax.random.uniform(jax.random.PRNGKey(8), (1, 3, 5, 32, 32), minval=-1, maxval=1)
    z = iface.encode(clip)
    assert z.shape == (1, 16, 2, 4, 4)
    rec = iface.decode(z)
    assert rec.shape == (1, 3, 5, 32, 32)

    # second-stage normalization round-trips with custom stats
    import numpy as onp

    vm = onp.random.RandomState(0).randn(1, 1, 50, 1, 1).astype("float32")
    vs = onp.abs(onp.random.RandomState(1).randn(1, 1, 50, 1, 1)).astype("float32") + 0.5
    iface2 = WanVAEInterface(VAEInterfaceConfig(vae=vae.config), params, video_mean=vm, video_std=vs)
    z2 = iface2.encode(clip)
    rec2 = iface2.decode(z2)
    np.testing.assert_allclose(np.asarray(rec2), np.asarray(rec), atol=1e-3)
