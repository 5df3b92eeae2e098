"""Unit tests for core ops: norms, RoPE, attention."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.ops.normalization import channel_l2_norm, layer_norm, rms_norm
from cosmos_predict2_tpu.ops.rope import RopeSpec, apply_rope, rope_angles_3d
from cosmos_predict2_tpu.ops.attention import reference_attention


@pytest.mark.level(0)
def test_rms_norm_matches_torch_formula():
    x = np.random.RandomState(0).randn(4, 16).astype(np.float32)
    w = np.random.RandomState(1).rand(16).astype(np.float32)
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-6))
    expected = x / np.sqrt((x**2).mean(-1, keepdims=True) + 1e-6) * w
    np.testing.assert_allclose(got, expected, rtol=1e-5)


@pytest.mark.level(0)
def test_layer_norm_affine_free():
    x = np.random.RandomState(0).randn(2, 8, 32).astype(np.float32)
    got = np.asarray(layer_norm(jnp.asarray(x)))
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    np.testing.assert_allclose(got, (x - mu) / np.sqrt(var + 1e-6), rtol=1e-4, atol=1e-5)


@pytest.mark.level(0)
def test_channel_l2_norm():
    x = np.random.RandomState(0).randn(2, 3, 4, 4, 16).astype(np.float32)
    gamma = np.random.RandomState(1).rand(16).astype(np.float32)
    got = np.asarray(channel_l2_norm(jnp.asarray(x), jnp.asarray(gamma), axis=-1))
    norm = np.sqrt((x**2).sum(-1, keepdims=True))
    expected = x / np.maximum(norm, 1e-12) * np.sqrt(16) * gamma
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.level(0)
def test_rope_band_layout():
    """head_dim 128 -> dim_h = dim_w = 42, dim_t = 44; angles repeat halves."""
    spec = RopeSpec(head_dim=128, enable_fps_modulation=False)
    assert spec.dim_h == 42 and spec.dim_t == 44
    angles = np.asarray(rope_angles_3d(spec, 2, 3, 4))
    assert angles.shape == (24, 128)
    np.testing.assert_allclose(angles[:, :64], angles[:, 64:], atol=0)
    # position (0,0,0) has zero angle everywhere
    np.testing.assert_allclose(angles[0], 0.0)
    # first dim_t/2 columns vary with t only
    a_t0 = angles.reshape(2, 3, 4, 128)[0, :, :, :22]
    np.testing.assert_allclose(a_t0, 0.0)


@pytest.mark.level(0)
def test_rope_preserves_norm_and_relativity():
    spec = RopeSpec(head_dim=64, enable_fps_modulation=False)
    angles = rope_angles_3d(spec, 4, 1, 1)
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2, 64))
    q_rot = apply_rope(q, angles)
    # rotation preserves norms
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(q_rot), axis=-1),
        np.linalg.norm(np.asarray(q), axis=-1),
        rtol=1e-5,
    )
    # dot products depend only on relative position: <R_i q, R_j k> == <R_0 q, R_{j-i} k>
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 2, 64))
    k_rot = apply_rope(k, angles)
    d12 = np.sum(np.asarray(q_rot)[0, 1, 0] * np.asarray(k_rot)[0, 2, 0])
    # shift both by -1: use q at pos 0 and k at pos 1 with same raw vectors
    q_shift = apply_rope(jnp.stack([q[:, 1]], axis=1), angles[:1])
    k_shift = apply_rope(jnp.stack([k[:, 2]], axis=1), angles[1:2])
    d01 = np.sum(np.asarray(q_shift)[0, 0, 0] * np.asarray(k_shift)[0, 0, 0])
    np.testing.assert_allclose(d12, d01, rtol=1e-4)


@pytest.mark.level(0)
def test_fps_modulation_scales_temporal_positions():
    spec = RopeSpec(head_dim=64, base_fps=24.0, enable_fps_modulation=True)
    a24 = np.asarray(rope_angles_3d(spec, 4, 1, 1, fps=jnp.asarray([24.0])))
    a12 = np.asarray(rope_angles_3d(spec, 4, 1, 1, fps=jnp.asarray([12.0])))
    # halving fps doubles effective temporal position
    dim_t_half = spec.dim_t // 2
    np.testing.assert_allclose(a12[1, :dim_t_half], a24[2, :dim_t_half], rtol=1e-5)


@pytest.mark.level(0)
def test_reference_attention_vs_numpy():
    rng = np.random.RandomState(0)
    q = rng.randn(1, 6, 2, 8).astype(np.float32)
    k = rng.randn(1, 5, 2, 8).astype(np.float32)
    v = rng.randn(1, 5, 2, 8).astype(np.float32)
    got = np.asarray(reference_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))
    scale = 1 / np.sqrt(8)
    for h in range(2):
        logits = q[0, :, h] @ k[0, :, h].T * scale
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        np.testing.assert_allclose(got[0, :, h], p @ v[0, :, h], rtol=1e-4, atol=1e-5)


@pytest.mark.level(1)
def test_flash_attention_interpret_mode():
    from jax.experimental.pallas import tpu as pltpu
    from cosmos_predict2_tpu.ops.flash_attention import flash_attention

    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (1, 256, 2, 128), dtype=jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 2, 128), dtype=jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 2, 128), dtype=jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, block_q=128, block_kv=128)
    ref = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.level(1)
def test_flash_attention_kv_cache_interpret_mode():
    """flash_attention_kv_cache == masked softmax over the filled prefix of
    the ring buffer (the dit.py cache branch's CPU fallback), at a fill
    level that is not a multiple of the kv block."""
    from jax.experimental.pallas import tpu as pltpu
    from cosmos_predict2_tpu.ops.flash_attention import flash_attention_kv_cache

    B, Smax, H, D = 1, 512, 2, 128
    fill = 300  # valid prefix, mid-block frontier
    q = jax.random.normal(jax.random.PRNGKey(0), (B, 64, H, D), dtype=jnp.float32)
    # head-major ring buffers (B, H, S_max, D)
    k_buf = jax.random.normal(jax.random.PRNGKey(1), (B, H, Smax, D), dtype=jnp.float32)
    v_buf = jax.random.normal(jax.random.PRNGKey(2), (B, H, Smax, D), dtype=jnp.float32)
    # garbage past the frontier must not leak into the output
    k_buf = k_buf.at[:, :, fill:].set(1e3)
    v_buf = v_buf.at[:, :, fill:].set(-1e3)

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_kv_cache(q, k_buf, v_buf, jnp.int32(fill))
    ref = reference_attention(
        q, k_buf[:, :, :fill].transpose(0, 2, 1, 3), v_buf[:, :, :fill].transpose(0, 2, 1, 3)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.level(1)
def test_flash_attention_kv_cache_grad():
    """The kv-cache kernel must be differentiable (the self-forcing rollout
    differentiates forward_with_cache on TPU): VJP == grad of the masked-
    softmax reference."""
    from jax.experimental.pallas import tpu as pltpu
    from cosmos_predict2_tpu.ops.flash_attention import (
        _kv_cache_reference,
        flash_attention_kv_cache,
    )

    B, Smax, H, D = 1, 256, 2, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (B, 64, H, D))
    kb = jax.random.normal(jax.random.PRNGKey(1), (B, H, Smax, D))
    vb = jax.random.normal(jax.random.PRNGKey(2), (B, H, Smax, D))
    fill = jnp.int32(200)

    with pltpu.force_tpu_interpret_mode():
        g = jax.grad(
            lambda q, kb, vb: jnp.sum(flash_attention_kv_cache(q, kb, vb, fill) ** 2),
            argnums=(0, 1, 2),
        )(q, kb, vb)
    gref = jax.grad(
        lambda q, kb, vb: jnp.sum(_kv_cache_reference(q, kb, vb, fill) ** 2), argnums=(0, 1, 2)
    )(q, kb, vb)
    for a, b in zip(g, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def _window_brute_force(q, k_buf, v_buf, fill, gh, gw, wh):
    """O(Sq * S_max) loop-free brute force of the row-banded cache window:
    per-query masked softmax with the clamped wh-row visibility."""
    B, Sq, H, D = q.shape
    F = gh * gw
    s_idx = np.arange(k_buf.shape[2])
    yk = (s_idx % F) // gw
    outs = np.zeros((B, Sq, H, D), np.float32)
    kn = np.asarray(k_buf, np.float32)
    vn = np.asarray(v_buf, np.float32)
    qn = np.asarray(q, np.float32)
    wh = min(wh, gh)
    for qi in range(Sq):
        yq = (qi % F) // gw
        start = min(max(yq - (wh - 1) // 2, 0), gh - wh)
        vis = (yk >= start) & (yk < start + wh) & (s_idx < fill)
        for h in range(H):
            logits = (kn[0, h] @ qn[0, qi, h]) / np.sqrt(D)
            logits = np.where(vis, logits, -1e30)
            p = np.exp(logits - logits.max())
            p /= p.sum()
            outs[0, qi, h] = p @ vn[0, h]
    return outs


@pytest.mark.level(1)
def test_kv_cache_window_reference_semantics():
    """The masked-dense cache-window reference == a per-query brute force,
    including row clamping at the grid edges and the fill frontier; and it
    degenerates to the dense cached attention when the window covers the
    whole grid."""
    from cosmos_predict2_tpu.ops.flash_attention import (
        _kv_cache_reference,
        _kv_cache_window_reference,
    )

    B, H, D = 1, 2, 32
    gh, gw = 6, 8
    F = gh * gw
    T = 4
    Smax = T * F
    fill = 3 * F
    q = jax.random.normal(jax.random.PRNGKey(0), (B, F, H, D))
    kb = jax.random.normal(jax.random.PRNGKey(1), (B, H, Smax, D))
    vb = jax.random.normal(jax.random.PRNGKey(2), (B, H, Smax, D))

    out = _kv_cache_window_reference(q, kb, vb, jnp.int32(fill), (gh, gw), 3)
    brute = _window_brute_force(q, kb, vb, fill, gh, gw, 3)
    np.testing.assert_allclose(np.asarray(out), brute, atol=2e-5)

    # window >= gh == dense cached attention
    out_full = _kv_cache_window_reference(q, kb, vb, jnp.int32(fill), (gh, gw), gh + 3)
    dense = _kv_cache_reference(q, kb, vb, jnp.int32(fill))
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(dense), atol=2e-5)


@pytest.mark.level(1)
def test_flash_attention_kv_cache_window_interpret_mode():
    """The Pallas row-banded window kernel == the masked-dense reference
    (odd gh -> rb=1 fallback, even gh -> rb=2 banding, partial fill)."""
    from jax.experimental.pallas import tpu as pltpu
    from cosmos_predict2_tpu.ops.flash_attention import (
        _flash_kv_cache_window_impl,
        _kv_cache_window_reference,
    )

    B, H, D = 1, 2, 128
    for gh, gw, wh, nb in ((6, 8, 3, 1), (5, 8, 2, 1), (6, 8, 3, 2)):
        F = gh * gw
        T = 4
        Smax = T * F
        fill = 2 * F + nb * F  # 2 cached frames + the appended new block
        q = jax.random.normal(jax.random.PRNGKey(0), (B, nb * F, H, D), dtype=jnp.float32)
        kb = jax.random.normal(jax.random.PRNGKey(1), (B, H, Smax, D), dtype=jnp.float32)
        vb = jax.random.normal(jax.random.PRNGKey(2), (B, H, Smax, D), dtype=jnp.float32)
        kb = kb.at[:, :, fill:].set(1e3)  # garbage must not leak
        vb = vb.at[:, :, fill:].set(-1e3)

        with pltpu.force_tpu_interpret_mode():
            out = _flash_kv_cache_window_impl(q, kb, vb, jnp.int32(fill), (gh, gw), wh, 2)
        ref = _kv_cache_window_reference(q, kb, vb, jnp.int32(fill), (gh, gw), wh)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, err_msg=f"gh={gh} wh={wh} nb={nb}"
        )


@pytest.mark.level(1)
def test_flash_attention_kv_cache_window_grad():
    """The windowed cache attention is differentiable (self-forcing trains
    the student with the same sparsity it streams with): VJP == grad of
    the masked-dense reference."""
    from cosmos_predict2_tpu.ops.flash_attention import (
        _kv_cache_window_reference,
        flash_attention_kv_cache_window,
    )

    B, H, D = 1, 2, 32
    gh, gw = 4, 8
    F = gh * gw
    Smax = 3 * F
    fill = jnp.int32(2 * F)
    q = jax.random.normal(jax.random.PRNGKey(0), (B, F, H, D))
    kb = jax.random.normal(jax.random.PRNGKey(1), (B, H, Smax, D))
    vb = jax.random.normal(jax.random.PRNGKey(2), (B, H, Smax, D))

    g = jax.grad(
        lambda q, kb, vb: jnp.sum(flash_attention_kv_cache_window(q, kb, vb, fill, (gh, gw), 2) ** 2),
        argnums=(0, 1, 2),
    )(q, kb, vb)
    gref = jax.grad(
        lambda q, kb, vb: jnp.sum(_kv_cache_window_reference(q, kb, vb, fill, (gh, gw), 2) ** 2),
        argnums=(0, 1, 2),
    )(q, kb, vb)
    for a, b in zip(g, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.level(0)
def test_blockwise_attention_matches_reference():
    """Online-softmax KV-block scan == dense attention, incl. the padded
    last block and frame-causal masking."""
    from cosmos_predict2_tpu.ops.attention import blockwise_attention

    rng = jax.random.PRNGKey(0)
    q, k, v = (jax.random.normal(r, (2, 50, 3, 16)) for r in jax.random.split(rng, 3))
    for fg in (0, 5):
        ref = reference_attention(q, k, v, frame_group=fg)
        got = blockwise_attention(q, k, v, frame_group=fg, block_kv=16)  # 50 % 16 != 0
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.level(0)
def test_blockwise_attention_grad_matches_reference():
    from cosmos_predict2_tpu.ops.attention import blockwise_attention

    rng = jax.random.PRNGKey(1)
    q, k, v = (jax.random.normal(r, (1, 24, 2, 8)) for r in jax.random.split(rng, 3))

    def loss(fn):
        return lambda q, k, v: jnp.sum(jnp.square(fn(q, k, v)))

    g_ref = jax.grad(loss(reference_attention), argnums=(0, 1, 2))(q, k, v)
    g_blk = jax.grad(loss(lambda a, b, c: blockwise_attention(a, b, c, block_kv=7)), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_blk, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4)
