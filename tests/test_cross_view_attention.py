"""Cross-view attention (reference multiview_cross_dit.py:115-231, 445-467).

Pins: (1) zero-init output projection makes the cross-view path an exact
identity at init; (2) a view's output depends on its mapped neighbors and
ONLY on them (same-frame); (3) per-frame isolation — tokens never attend
across time; (4) the full DiT runs with the path enabled.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.networks.dit import CrossViewAttention, MiniTrainDIT, PRESETS

MAP = ((1,), (0, 2), (1,))  # view 0 <-> 1 <-> 2 chain


def _module(V=3):
    return CrossViewAttention(dim=32, n_heads=2, head_dim=16, attn_map=MAP, dtype=jnp.float32)


def _x(seed, B=1, V=3, Tv=2, H=2, W=2, D=32):
    return jnp.asarray(np.random.RandomState(seed).randn(B, V, Tv, H, W, D), dtype=jnp.float32)


@pytest.mark.level(0)
def test_zero_init_output_proj():
    m = _module()
    x = _x(0)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    # o_proj kernel is the only zero-init param
    assert float(jnp.abs(params["params"]["output_proj"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(params["params"]["q_proj"]["kernel"]).max()) > 0.0


def _nonzero_params(m, x):
    params = m.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(lambda p: p, params)  # copy structure
    o = params["params"]["output_proj"]["kernel"]
    params["params"]["output_proj"]["kernel"] = jnp.asarray(
        np.random.RandomState(9).randn(*o.shape) * 0.1, dtype=o.dtype
    )
    return params


@pytest.mark.level(0)
def test_neighbor_dependence_and_isolation():
    m = _module()
    x = _x(1)
    params = _nonzero_params(m, x)
    base = np.asarray(m.apply(params, x))

    # perturb view 2: view 0 (neighbors=(1,)) must be unchanged; view 1 must change
    x2 = x.at[:, 2].add(1.0)
    out2 = np.asarray(m.apply(params, x2))
    np.testing.assert_array_equal(out2[:, 0], base[:, 0])
    assert np.abs(out2[:, 1] - base[:, 1]).max() > 1e-5
    # view 2 queries changed? its neighbors (view 1) unchanged but its own
    # queries changed -> output changes
    assert np.abs(out2[:, 2] - base[:, 2]).max() > 1e-5


@pytest.mark.level(0)
def test_per_frame_isolation():
    m = _module()
    x = _x(2)
    params = _nonzero_params(m, x)
    base = np.asarray(m.apply(params, x))
    # perturb frame 1 of view 1: frame 0 outputs of ALL views unchanged
    xp = x.at[:, 1, 1].add(1.0)
    outp = np.asarray(m.apply(params, xp))
    np.testing.assert_array_equal(outp[:, :, 0], base[:, :, 0])
    assert np.abs(outp[:, 0, 1] - base[:, 0, 1]).max() > 1e-5


@pytest.mark.level(0)
def test_matches_manual_attention():
    """View v's output == plain softmax attention over its neighbors' tokens."""
    m = _module()
    x = _x(3, Tv=1)
    params = _nonzero_params(m, x)
    out = np.asarray(m.apply(params, x))

    p = params["params"]

    def proj(name, t):
        return t @ np.asarray(p[name]["kernel"])

    def rmsnorm(t, w):
        return t / np.sqrt((t**2).mean(-1, keepdims=True) + 1e-6) * w

    xf = np.asarray(x).reshape(1, 3, 4, 32)  # (B, V, L, D)
    q = proj("q_proj", xf).reshape(1, 3, 4, 2, 16)
    k = proj("k_proj", xf).reshape(1, 3, 4, 2, 16)
    v = proj("v_proj", xf).reshape(1, 3, 4, 2, 16)
    q = rmsnorm(q, np.asarray(p["q_norm"]["weight"]))
    k = rmsnorm(k, np.asarray(p["k_norm"]["weight"]))

    # view 1 attends views (0, 2)
    kv_k = np.concatenate([k[:, 0], k[:, 2]], axis=1)  # (B, 8, h, d)
    kv_v = np.concatenate([v[:, 0], v[:, 2]], axis=1)
    logits = np.einsum("bqhd,bkhd->bhqk", q[:, 1], kv_k) / np.sqrt(16)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    att = np.einsum("bhqk,bkhd->bqhd", probs, kv_v).reshape(1, 4, 32)
    manual = att @ np.asarray(p["output_proj"]["kernel"])

    np.testing.assert_allclose(out[:, 1].reshape(1, 4, 32), manual, rtol=2e-4, atol=2e-5)


@pytest.mark.level(1)
def test_dit_forward_with_cross_view():
    cfg = dataclasses.replace(
        PRESETS["test"],
        dtype=jnp.float32,
        remat="none",
        n_views=3,
        enable_cross_view_attn=True,
        cross_view_attn_map=MAP,
    )
    net = MiniTrainDIT(cfg)
    x = jnp.zeros((1, 16, 6, 8, 8))  # T = V*Tv = 3*2
    ts = jnp.full((1,), 500.0)
    ctx = jnp.zeros((1, 3 * 8, 1024))
    params = net.init(jax.random.PRNGKey(0), x, ts, ctx)
    out = net.apply(params, x, ts, ctx)
    assert out.shape == (1, 16, 6, 8, 8)

    # zero-init o_proj => identical output to the same net without the path
    cfg_off = dataclasses.replace(cfg, enable_cross_view_attn=False, cross_view_attn_map=None)
    net_off = MiniTrainDIT(cfg_off)
    x_r = jnp.asarray(np.random.RandomState(0).randn(1, 16, 6, 8, 8), dtype=jnp.float32)
    params_off = net_off.init(jax.random.PRNGKey(0), x_r, ts, ctx)
    # graft shared params into the cross-view net (same names)
    merged = jax.tree_util.tree_map_with_path(lambda path, leaf: leaf, params)

    def graft(on, off):
        for key, val in off.items():
            if isinstance(val, dict) and key in on:
                graft(on[key], val)
            elif key in on:
                on[key] = val

    import flax

    merged = flax.core.unfreeze(merged)
    graft(merged["params"], flax.core.unfreeze(params_off)["params"])
    out_on = np.asarray(net.apply(merged, x_r, ts, ctx))
    out_off = np.asarray(net_off.apply(params_off, x_r, ts, ctx))
    np.testing.assert_allclose(out_on, out_off, rtol=1e-6, atol=1e-6)
