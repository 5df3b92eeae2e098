"""Pallas implicit-GEMM causal conv (ops/conv3d.py) vs the XLA conv.

Reference semantics: CausalConv3d in the Wan VAE
(cosmos_predict2/_src/predict2/tokenizers/wan2pt1.py) — temporal taps
pre-stacked ("valid" in time), SAME (pad 1) spatially. The kernel runs in
interpret mode on CPU; chip parity/perf is covered by scripts/vae_conv_micro2.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmos_predict2_tpu.ops.conv3d import (
    conv3d_causal_folded,
    conv3d_causal_taps,
    conv3d_causal_taps_reference,
    conv3d_causal_taps_xla,
)


@pytest.mark.parametrize(
    "shape",
    [
        # (T_out, H, W, Cin, Cout): decoder-stage-like geometries, incl. a
        # non-128-multiple channel count (exercises the lane-padding path).
        (2, 16, 32, 128, 128),
        (1, 8, 24, 96, 96),
        (3, 16, 16, 64, 192),
    ],
)
@pytest.mark.parametrize("kt", [3, 1])
def test_conv3d_matches_xla(shape, kt):
    T, H, W, Cin, Cout = shape
    rng = np.random.default_rng(hash((shape, kt)) % 2**32)
    x = jnp.asarray(rng.standard_normal((1, T + kt - 1, H, W, Cin)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((kt, 3, 3, Cin, Cout)) / np.sqrt(9 * kt * Cin), jnp.float32
    )
    b = jnp.asarray(rng.standard_normal((Cout,)), jnp.float32)
    out = conv3d_causal_taps(
        x, w, b, kt=kt, out_dtype=jnp.float32, interpret=True
    )
    ref = conv3d_causal_taps_reference(x, w, b, kt=kt, out_dtype=jnp.float32)
    assert out.shape == ref.shape == (1, T, H, W, Cout)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize(
    "shape",
    [
        (2, 16, 32, 128, 128),
        (1, 8, 24, 96, 96),  # lane-padding path
        (3, 16, 16, 64, 192),
    ],
)
@pytest.mark.parametrize("kt", [3, 1])
def test_conv3d_folded_matches_xla(shape, kt):
    """The K-folded kernel ((dt,dh) taps concatenated into the GEMM K dim,
    3 dw matmuls per band) == the XLA conv emitter."""
    T, H, W, Cin, Cout = shape
    rng = np.random.default_rng(hash(("folded", shape, kt)) % 2**32)
    x = jnp.asarray(rng.standard_normal((1, T + kt - 1, H, W, Cin)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((kt, 3, 3, Cin, Cout)) / np.sqrt(9 * kt * Cin), jnp.float32
    )
    b = jnp.asarray(rng.standard_normal((Cout,)), jnp.float32)
    out = conv3d_causal_folded(x, w, b, kt=kt, out_dtype=jnp.float32, interpret=True)
    ref = conv3d_causal_taps_reference(x, w, b, kt=kt, out_dtype=jnp.float32)
    assert out.shape == ref.shape == (1, T, H, W, Cout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kt", [3, 1])
def test_conv3d_taps_xla_matches_conv(kt):
    """Pure-XLA tap-sum lowering == the conv emitter (any batch, any W)."""
    rng = np.random.default_rng(7 + kt)
    T, H, W, Cin, Cout = 2, 10, 20, 48, 80
    x = jnp.asarray(rng.standard_normal((2, T + kt - 1, H, W, Cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((kt, 3, 3, Cin, Cout)) / np.sqrt(9 * kt * Cin), jnp.float32)
    b = jnp.asarray(rng.standard_normal((Cout,)), jnp.float32)
    out = conv3d_causal_taps_xla(x, w, b, kt=kt, out_dtype=jnp.float32)
    ref = conv3d_causal_taps_reference(x, w, b, kt=kt, out_dtype=jnp.float32)
    assert out.shape == ref.shape == (2, T, H, W, Cout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_streaming_decode_taps_backend_matches_xla():
    """decode_streaming(conv_backend='taps') == 'xla' end-to-end (CPU)."""
    from cosmos_predict2_tpu.tokenizers import wan_vae_streaming as wvs
    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig

    cfg = WanVAEConfig(dim=16, dtype=jnp.float32)
    net = WanVAE(cfg)
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 5, 32, 32, 3), jnp.float32)
    )
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 4, 4, cfg.z_dim), jnp.float32)
    # drop the channel floor so the toy widths actually route through taps
    old = wvs._PALLAS_MIN_CH
    wvs._PALLAS_MIN_CH = 8
    try:
        ref = wvs.decode_streaming(cfg, params, z, conv_backend="xla")
        got = wvs.decode_streaming(cfg, params, z, conv_backend="taps")
    finally:
        wvs._PALLAS_MIN_CH = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize(
    "shape",
    [
        (4, 16, 32, 128, 128),  # steady pixel-stage chunk depth
        (2, 16, 32, 128, 128),
        (1, 8, 24, 96, 96),  # T_out=1 (latent stage) + lane-padding path
        (3, 16, 16, 64, 192),
        (6, 8, 16, 128, 128),  # longer stream than the ring (T_in > kt+2)
    ],
)
@pytest.mark.parametrize("kt", [3, 1])
def test_conv3d_ring_matches_xla(shape, kt):
    """Frame-ring kernel (one DMA per input frame-band, (kt+2)-slot ring)
    must equal the XLA conv for every stream depth, including streams
    longer than the ring."""
    from cosmos_predict2_tpu.ops.conv3d import conv3d_causal_ring

    T, H, W, Cin, Cout = shape
    rng = np.random.default_rng(hash((shape, kt, "ring")) % 2**32)
    x = jnp.asarray(rng.standard_normal((1, T + kt - 1, H, W, Cin)), jnp.float32)
    w = jnp.asarray(
        rng.standard_normal((kt, 3, 3, Cin, Cout)) / np.sqrt(9 * kt * Cin), jnp.float32
    )
    b = jnp.asarray(rng.standard_normal((Cout,)), jnp.float32)
    out = conv3d_causal_ring(x, w, b, kt=kt, out_dtype=jnp.float32, interpret=True)
    ref = conv3d_causal_taps_reference(x, w, b, kt=kt, out_dtype=jnp.float32)
    assert out.shape == ref.shape == (1, T, H, W, Cout)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.level(1)
def test_streaming_decode_ring_backend_matches_xla():
    """The ring backend reproduces the XLA streaming decode end-to-end
    (interpreter mode, channel gate lowered so toy widths take the path)."""
    from cosmos_predict2_tpu.tokenizers import wan_vae_streaming as wvs
    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig

    cfg = WanVAEConfig(dim=16, dtype=jnp.float32)
    vae = WanVAE(cfg)
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 32, 32, 3), jnp.float32))
    z = jax.random.normal(jax.random.PRNGKey(9), (1, 3, 4, 4, cfg.z_dim)) * 0.5
    ref = wvs.decode_streaming(cfg, params, z, chunk_latent_frames=1)
    old_min = wvs._PALLAS_MIN_CH
    wvs._PALLAS_MIN_CH = 8
    try:
        got = wvs.decode_streaming(cfg, params, z, chunk_latent_frames=1, conv_backend="ring_interpret")
    finally:
        wvs._PALLAS_MIN_CH = old_min
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
