"""Neighborhood (sparse) attention tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from cosmos_predict2_tpu.ops.attention import reference_attention
from cosmos_predict2_tpu.ops.neighborhood_attention import (
    VideoSize,
    neighborhood_attention,
    neighborhood_attention_reference,
)


def _inputs(size, heads=2, dim=16, seed=0):
    S = size.T * size.H * size.W
    keys = jax.random.split(jax.random.PRNGKey(seed), 3)
    return tuple(jax.random.normal(k, (1, S, heads, dim)) for k in keys)


@pytest.mark.level(0)
def test_full_window_equals_dense():
    size = VideoSize(2, 3, 4)
    q, k, v = _inputs(size)
    out = neighborhood_attention_reference(q, k, v, size, (-1, -1, -1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(reference_attention(q, k, v)), atol=1e-5)


@pytest.mark.level(0)
def test_window_locality():
    """With window (1, -1, -1): tokens only attend within their own frame."""
    size = VideoSize(3, 2, 2)
    q, k, v = _inputs(size)
    out = neighborhood_attention_reference(q, k, v, size, (1, -1, -1))
    hw = 4
    for t in range(3):
        per_frame = reference_attention(q[:, t * hw : (t + 1) * hw], k[:, t * hw : (t + 1) * hw], v[:, t * hw : (t + 1) * hw])
        np.testing.assert_allclose(np.asarray(out[:, t * hw : (t + 1) * hw]), np.asarray(per_frame), atol=1e-5)


@pytest.mark.level(0)
def test_boundary_clamping_gives_constant_bandwidth():
    """Every query sees exactly prod(window) keys (clamped NA semantics)."""
    from cosmos_predict2_tpu.ops.neighborhood_attention import _na_mask

    size = VideoSize(5, 4, 4)
    S = 80
    rows = jnp.arange(S)[:, None]
    cols = jnp.arange(S)[None, :]
    mask = _na_mask(rows, cols, size, (3, 3, 3))
    counts = np.asarray(mask).sum(axis=1)
    assert (counts == 27).all()


@pytest.mark.level(1)
def test_pallas_kernel_matches_reference_interpret():
    size = VideoSize(4, 8, 8)  # S = 256
    q, k, v = _inputs(size, heads=1, dim=128, seed=1)
    with pltpu.force_tpu_interpret_mode():
        out = neighborhood_attention(q, k, v, size, (3, 5, 5), block_q=128, block_kv=128)
    ref = neighborhood_attention_reference(q, k, v, size, (3, 5, 5))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.level(1)
@pytest.mark.parametrize(
    "size,window",
    [
        (VideoSize(3, 6, 10), (-1, 4, 6)),  # H, W not tile multiples -> pad path
        (VideoSize(5, 4, 16), (-1, 2, 8)),  # T=5 -> non-pow2 block (320)
        (VideoSize(1, 7, 9), (-1, 3, 3)),  # single frame, both axes padded
        (VideoSize(4, 4, 16), (2, -1, -1)),  # temporal-only window
    ],
)
def test_pallas_kernel_edge_geometries_interpret(size, window):
    """The tiled-layout kernel must be exact when (H, W) need spatial
    padding, when the superblock forces a non-pow2 block size, and for
    windows on any subset of axes."""
    q, k, v = _inputs(size, heads=1, dim=128, seed=2)
    with pltpu.force_tpu_interpret_mode():
        out = neighborhood_attention(q, k, v, size, window)
    ref = neighborhood_attention_reference(q, k, v, size, window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.level(1)
@pytest.mark.parametrize(
    "size,window",
    [
        (VideoSize(4, 8, 8), (3, 5, 5)),
        (VideoSize(3, 6, 10), (-1, 4, 6)),  # padded geometry
    ],
)
def test_pallas_kernel_gradients_match_reference(size, window):
    """Custom VJP (dQ/dK/dV kernels over the gathered tables) must match
    autodiff through the masked reference softmax."""
    q, k, v = _inputs(size, heads=1, dim=128, seed=3)
    tgt = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss(fn):
        def f(q_, k_, v_):
            return jnp.sum((fn(q_, k_, v_) - tgt) ** 2)

        return jax.grad(f, argnums=(0, 1, 2))

    with pltpu.force_tpu_interpret_mode():
        gq, gk, gv = loss(lambda a, b, c: neighborhood_attention(a, b, c, size, window))(q, k, v)
    rq, rk, rv = loss(lambda a, b, c: neighborhood_attention_reference(a, b, c, size, window))(q, k, v)
    for got, ref in ((gq, rq), (gk, rk), (gv, rv)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4, rtol=1e-3)


@pytest.mark.level(0)
def test_plan_density_720p():
    """At the production 720p geometry the tiled plan must (a) not pad the
    sequence and (b) prune to well under half the dense kv blocks — the
    property that makes NA profitable on TPU at all."""
    from cosmos_predict2_tpu.ops.neighborhood_attention import _build_plan

    plan = _build_plan(VideoSize(24, 44, 80), (-1, 12, 24), (1, 1, 1), (1, 1, 1), 512)
    nblk = plan.table.shape[0]
    assert plan.s_pad == 24 * 44 * 80  # 44 % 4 == 0 and 80 % 16 == 0: no pad
    density = plan.counts.sum() / float(nblk * nblk)
    assert density < 0.25, density


@pytest.mark.level(1)
def test_dit_sparse_interleave():
    """DiT-level NA surgery (reference minimal_v4_dit.py:1743-1813):
    n_dense_blocks interleave runs, trains (finite grads), and with a full
    window the sparse path reproduces the dense DiT exactly."""
    import dataclasses

    from cosmos_predict2_tpu.networks.dit import PRESETS, MiniTrainDIT

    base = dataclasses.replace(
        PRESETS["test"], dtype=jnp.float32, rope_enable_fps_modulation=False, remat="none"
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 2, 8, 8))
    ts = jnp.full((1,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 1024)) * 0.1

    dense = MiniTrainDIT(dataclasses.replace(base, n_dense_blocks=-1))
    params = dense.init(jax.random.PRNGKey(2), x, ts, ctx)
    out_dense = dense.apply(params, x, ts, ctx)

    # full window == dense, through the whole network
    full = MiniTrainDIT(dataclasses.replace(base, n_dense_blocks=0, natten_window=(-1, -1, -1)))
    out_full = full.apply(params, x, ts, ctx)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_dense), atol=1e-5)

    # real window: interleave (1 dense of 2 blocks) runs and differs from dense
    sparse = MiniTrainDIT(dataclasses.replace(base, n_dense_blocks=1, natten_window=(1, 3, 3)))
    out_sparse = sparse.apply(params, x, ts, ctx)
    assert np.isfinite(np.asarray(out_sparse)).all()
    assert np.abs(np.asarray(out_sparse) - np.asarray(out_dense)).max() > 1e-4

    g = jax.grad(lambda p: jnp.mean(sparse.apply(p, x, ts, ctx) ** 2))(params)
    assert all(np.isfinite(np.asarray(leaf)).all() for leaf in jax.tree.leaves(g))


@pytest.mark.level(0)
def test_gna_stride_blocked_equivalence():
    """GNA semantics anchor: stride == window reduces to non-overlapping
    blocked attention (reference minimal_v4_dit.py:1298-1301)."""
    size = VideoSize(1, 1, 12)
    q, k, v = _inputs(size)
    out = neighborhood_attention_reference(q, k, v, size, (-1, -1, 4), stride=(1, 1, 4))
    for b0 in range(0, 12, 4):
        blk = reference_attention(q[:, b0 : b0 + 4], k[:, b0 : b0 + 4], v[:, b0 : b0 + 4])
        np.testing.assert_allclose(np.asarray(out[:, b0 : b0 + 4]), np.asarray(blk), atol=1e-5)
    # stride=1 stays standard NA (bandwidth per query == window)
    from cosmos_predict2_tpu.ops.neighborhood_attention import _na_mask

    m = _na_mask(jnp.arange(12)[:, None], jnp.arange(12)[None, :], size, (-1, -1, 4), (1, 1, 1))
    assert (np.asarray(m).sum(axis=1) == 4).all()


@pytest.mark.level(1)
def test_pallas_kernel_stride_matches_reference():
    """The production sparse config's stride (reference sparse_2B.py:327)
    through the tiled kernel, gradients included."""
    size, window, stride = VideoSize(4, 8, 16), (-1, 4, 8), (1, 2, 4)
    q, k, v = _inputs(size, heads=1, dim=128, seed=4)
    tgt = jax.random.normal(jax.random.PRNGKey(9), q.shape)
    with pltpu.force_tpu_interpret_mode():
        out = neighborhood_attention(q, k, v, size, window, stride=stride)
        gq, gk, gv = jax.grad(
            lambda a, b, c: jnp.sum((neighborhood_attention(a, b, c, size, window, stride=stride) - tgt) ** 2),
            argnums=(0, 1, 2),
        )(q, k, v)
    ref = neighborhood_attention_reference(q, k, v, size, window, stride)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    rq, rk, rv = jax.grad(
        lambda a, b, c: jnp.sum((neighborhood_attention_reference(a, b, c, size, window, stride) - tgt) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for got, want in ((gq, rq), (gk, rk), (gv, rv)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-3)


@pytest.mark.level(0)
def test_adaptive_na_parameters():
    """Window/stride scaling from the tuning geometry to the live input
    (reference modules/neighborhood_attn.py:140-168)."""
    from cosmos_predict2_tpu.ops.neighborhood_attention import adaptive_na_parameters

    # tuned at (any, 44, 80); at half spatial resolution both halve
    w, s, _ = adaptive_na_parameters((-1, 12, 24), (1, 4, 8), (24, 22, 40), (-1, 44, 80))
    assert w == (24, 6, 12) and s == (1, 2, 4)
    # at the tuning geometry: unchanged (window -1 maps to the full axis)
    w, s, _ = adaptive_na_parameters((-1, 12, 24), (1, 4, 8), (24, 44, 80), (-1, 44, 80))
    assert w == (24, 12, 24) and s == (1, 4, 8)


@pytest.mark.level(0)
def test_plan_density_720p_with_stride():
    """The production stride (1, 4, 8) sharpens the block table further
    (stride groups share windows, so q tiles span fewer kv tiles)."""
    from cosmos_predict2_tpu.ops.neighborhood_attention import _build_plan

    base = _build_plan(VideoSize(24, 44, 80), (-1, 12, 24), (1, 1, 1), (1, 1, 1), 512)
    strided = _build_plan(VideoSize(24, 44, 80), (-1, 12, 24), (1, 4, 8), (1, 1, 1), 512)
    nblk = base.table.shape[0]
    d0 = base.counts.sum() / float(nblk * nblk)
    d1 = strided.counts.sum() / float(nblk * nblk)
    assert d1 < d0 < 0.25, (d0, d1)


@pytest.mark.level(0)
def test_dilated_reference_block_diagonal():
    """DiNA semantics (reference sparse_14B.py:30: window (-1,4,16),
    dilation (1,11,5) == full sub-grid windows): attention is exactly
    block-diagonal over dilation classes."""
    from cosmos_predict2_tpu.ops.neighborhood_attention import _na_mask

    size = VideoSize(2, 4, 6)
    S = size.T * size.H * size.W
    dilation = (1, 2, 3)
    window = (-1, 2, 2)  # == sub-grid lengths (4/2, 6/3)
    m = np.asarray(_na_mask(jnp.arange(S)[:, None], jnp.arange(S)[None, :], size, window, (1, 1, 1), dilation))
    # expected: same (h % 2, w % 3) class, all t
    t, rem = np.divmod(np.arange(S), size.H * size.W)
    h, w = np.divmod(rem, size.W)
    expect = (h[:, None] % 2 == h[None, :] % 2) & (w[:, None] % 3 == w[None, :] % 3)
    np.testing.assert_array_equal(m, expect)


@pytest.mark.level(1)
def test_pallas_kernel_dilation_matches_reference():
    """Dilated NA through the tiled kernel (class-major reorder ->
    blocked attention), fwd + grads, at an exactly-divisible geometry."""
    size = VideoSize(2, 8, 16)
    window, stride, dilation = (-1, 2, 4), (1, 1, 1), (1, 4, 4)  # sub-grids 2, 4
    q, k, v = _inputs(size, heads=1, dim=128, seed=5)
    tgt = jax.random.normal(jax.random.PRNGKey(9), q.shape)
    with pltpu.force_tpu_interpret_mode():
        out = neighborhood_attention(q, k, v, size, window, stride=stride, dilation=dilation)
        gq, gk, gv = jax.grad(
            lambda a, b, c: jnp.sum(
                (neighborhood_attention(a, b, c, size, window, stride=stride, dilation=dilation) - tgt) ** 2
            ),
            argnums=(0, 1, 2),
        )(q, k, v)
    ref = neighborhood_attention_reference(q, k, v, size, window, stride, dilation)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    rq, rk, rv = jax.grad(
        lambda a, b, c: jnp.sum(
            (neighborhood_attention_reference(a, b, c, size, window, stride, dilation) - tgt) ** 2
        ),
        argnums=(0, 1, 2),
    )(q, k, v)
    for got, want in ((gq, rq), (gk, rk), (gv, rv)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-3)


@pytest.mark.level(0)
def test_adaptive_na_parameters_dilation():
    from cosmos_predict2_tpu.ops.neighborhood_attention import adaptive_na_parameters

    # the 14B comb tuning at its own base: dilation preserved
    w, s, d = adaptive_na_parameters(
        (-1, 4, 16), (1, 1, 1), (24, 44, 80), (-1, 44, 80), (1, 11, 5)
    )
    assert w == (24, 4, 16) and s == (1, 1, 1) and d == (1, 11, 5)


@pytest.mark.level(1)
def test_dit_per_layer_natten_parameters():
    """natten_parameters per-layer list (reference sparse_14B.py:29-105):
    entry None = dense, others carry (window, stride, dilation, base) —
    including a dilated layer — through a 3-block DiT."""
    import dataclasses

    from cosmos_predict2_tpu.networks.dit import PRESETS, MiniTrainDIT

    base = dataclasses.replace(
        PRESETS["test"], num_blocks=3, dtype=jnp.float32,
        rope_enable_fps_modulation=False, remat="none",
    )
    per_layer = (
        ((-1, 2, 2), (1, 1, 1), (1, 2, 2), (-1, 4, 4)),  # dilated full-sub-grid
        None,  # dense
        ((-1, 3, 3), (1, 1, 1), (1, 1, 1), (-1, 4, 4)),  # plain window
    )
    cfg = dataclasses.replace(base, natten_parameters=per_layer)
    net = MiniTrainDIT(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 2, 8, 8))
    ts = jnp.full((1,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 1024)) * 0.1
    params = net.init(jax.random.PRNGKey(2), x, ts, ctx)
    out = net.apply(params, x, ts, ctx)
    assert np.isfinite(np.asarray(out)).all()

    # differs from the all-dense net with identical weights
    dense = MiniTrainDIT(base)
    out_dense = dense.apply(params, x, ts, ctx)
    assert np.abs(np.asarray(out) - np.asarray(out_dense)).max() > 1e-4


@pytest.mark.level(0)
def test_unsupported_dilation_fallback_vs_oom_guard():
    """Unsupported dilation geometry: small sequences degrade to the dense
    masked reference; at production scale (where the dense (B,H,S,S) logits
    would be an OOM minutes into compilation) the clear error surfaces up
    front instead."""
    from cosmos_predict2_tpu.ops.neighborhood_attention import (
        VideoSize,
        neighborhood_attention,
        neighborhood_attention_reference,
    )

    # small: non-divisor dilation (H=6, dilation=4) -> dense fallback, correct
    size = VideoSize(2, 6, 8)
    s = 2 * 6 * 8
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), (1, s, 2, 16)) for i in range(3))
    window, stride, dil = (1, 3, 3), (1, 1, 1), (1, 4, 1)
    out = neighborhood_attention(q, k, v, size, window, stride=stride, dilation=dil)
    ref = neighborhood_attention_reference(q, k, v, size, window, stride, dil)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # production scale: abstract eval is enough to hit the guard (no alloc)
    big = VideoSize(24, 110, 32)  # H=110 not divisible by dilation 4
    s_big = 24 * 110 * 32
    abstract = [jax.ShapeDtypeStruct((1, s_big, 16, 128), jnp.bfloat16)] * 3
    with pytest.raises(NotImplementedError, match="GiB"):
        jax.eval_shape(
            lambda a, b, c: neighborhood_attention(a, b, c, big, window, stride=stride, dilation=dil),
            *abstract,
        )


@pytest.mark.level(0)
@pytest.mark.parametrize(
    "size,window,stride,dilation",
    [
        (VideoSize(4, 8, 8), (3, 5, 5), (1, 1, 1), (1, 1, 1)),
        (VideoSize(3, 6, 10), (-1, 4, 6), (1, 1, 1), (1, 1, 1)),  # pad path
        (VideoSize(4, 8, 16), (-1, 4, 8), (1, 2, 4), (1, 1, 1)),  # GNA stride
        (VideoSize(2, 8, 16), (-1, 2, 4), (1, 1, 1), (1, 4, 4)),  # DiNA dilation
        (VideoSize(1, 7, 9), (-1, 3, 3), (1, 1, 1), (1, 1, 1)),  # both axes padded
    ],
)
def test_gathered_xla_matches_reference(size, window, stride, dilation):
    """The pure-XLA gathered block-sparse executor shares the Pallas
    kernel's plan/permutation/mask math; it must be exact vs the dense
    masked reference on every supported geometry class."""
    from cosmos_predict2_tpu.ops.neighborhood_attention import neighborhood_attention_gathered

    q, k, v = _inputs(size, heads=2, dim=16, seed=6)
    out = neighborhood_attention_gathered(q, k, v, size, window, stride=stride, dilation=dilation)
    ref = neighborhood_attention_reference(q, k, v, size, window, stride, dilation)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.level(1)
def test_gathered_xla_gradients_match_reference():
    """Per-block rematerialized autodiff (take -> scatter-add dK/dV) vs
    autodiff through the dense masked reference."""
    from cosmos_predict2_tpu.ops.neighborhood_attention import neighborhood_attention_gathered

    size, window, stride = VideoSize(4, 8, 16), (-1, 4, 8), (1, 2, 4)
    q, k, v = _inputs(size, heads=1, dim=32, seed=7)
    tgt = jax.random.normal(jax.random.PRNGKey(9), q.shape)

    def loss(fn):
        return jax.grad(lambda a, b, c: jnp.sum((fn(a, b, c) - tgt) ** 2), argnums=(0, 1, 2))

    g = loss(lambda a, b, c: neighborhood_attention_gathered(a, b, c, size, window, stride=stride))(q, k, v)
    r = loss(lambda a, b, c: neighborhood_attention_reference(a, b, c, size, window, stride))(q, k, v)
    for got, want in zip(g, r):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=5e-4, rtol=1e-3)
