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
    conv3d_causal_taps,
    conv3d_causal_taps_reference,
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
