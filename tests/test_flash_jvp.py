"""Fused JVP flash attention vs jax.jvp of the einsum reference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from cosmos_predict2_tpu.ops.flash_attention_jvp import (
    flash_attention_fwdmode,
    reference_attention_jvp,
)


def _rand(shape, n, dtype=jnp.float32):
    return [jax.random.normal(jax.random.PRNGKey(i), shape, dtype) for i in range(n)]


@pytest.mark.level(0)
@pytest.mark.parametrize("frame_group", [0, 256])
def test_jvp_matches_reference(frame_group):
    B, S, H, D = 1, 256, 2, 128
    q, k, v, dq, dk, dv = _rand((B, S, H, D), 6)
    want_o, want_do = reference_attention_jvp(q, k, v, dq, dk, dv, frame_group)
    with pltpu.force_tpu_interpret_mode():
        got_o, got_do = jax.jvp(
            lambda *a: flash_attention_fwdmode(*a, frame_group), (q, k, v), (dq, dk, dv)
        )
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o), atol=3e-5)
    np.testing.assert_allclose(np.asarray(got_do), np.asarray(want_do), atol=3e-4)


@pytest.mark.level(0)
def test_jvp_primal_only_path():
    """Outside jvp, flash_attention_fwdmode is the plain flash forward."""
    B, S, H, D = 1, 256, 2, 128
    q, k, v = _rand((B, S, H, D), 3)
    want, _ = reference_attention_jvp(q, k, v, q * 0, k * 0, v * 0)
    with pltpu.force_tpu_interpret_mode():
        got = flash_attention_fwdmode(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


@pytest.mark.level(0)
def test_jvp_partial_tangents():
    """Only v has a tangent (common in time-derivative losses)."""
    B, S, H, D = 1, 256, 2, 128
    q, k, v, dv = _rand((B, S, H, D), 4)
    zero = jnp.zeros_like(q)
    want_o, want_do = reference_attention_jvp(q, k, v, zero, zero, dv)
    with pltpu.force_tpu_interpret_mode():
        got_o, got_do = jax.jvp(flash_attention_fwdmode, (q, k, v), (zero, zero, dv))
    np.testing.assert_allclose(np.asarray(got_do), np.asarray(want_do), atol=3e-4)
