"""scan-over-blocks (DiTConfig.scan_blocks): the rolled model must be a pure
program-size optimization — identical outputs and gradients to the unrolled
loop, with parameters converted by utils/scan_params."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cosmos_predict2_tpu.networks.dit import MiniTrainDIT, PRESETS, block_segments
from cosmos_predict2_tpu.utils.scan_params import stack_block_params, unstack_block_params

BASE = dataclasses.replace(
    PRESETS["test"], dtype=jnp.float32, remat="none", num_blocks=4,
    rope_enable_fps_modulation=False,
)
X = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 16), dtype=jnp.float32)
TS = jnp.full((1,), 500.0, dtype=jnp.float32)
CTX = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 1024), dtype=jnp.float32) * 0.02


def _pair(cfg):
    unrolled = MiniTrainDIT(dataclasses.replace(cfg, scan_blocks=False))
    scanned = MiniTrainDIT(dataclasses.replace(cfg, scan_blocks=True))
    params = unrolled.init(jax.random.PRNGKey(2), X, TS, CTX)
    return unrolled, scanned, params


@pytest.mark.level(0)
def test_segments_dense_and_interleave():
    assert block_segments(BASE) == [(0, 4)]
    sp = dataclasses.replace(
        BASE, num_blocks=6, n_dense_blocks=2,  # dense at 0 and 5
        natten_window=(-1, 2, 2), natten_stride=(1, 1, 1),
    )
    assert block_segments(sp) == [(0, 1), (1, 4), (5, 1)]


@pytest.mark.level(0)
def test_scanned_forward_matches_unrolled_dense():
    unrolled, scanned, params = _pair(BASE)
    ref = unrolled.apply(params, X, TS, CTX)
    got = scanned.apply(stack_block_params(params, BASE), X, TS, CTX)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.level(0)
def test_param_layout_roundtrip():
    _, _, params = _pair(BASE)
    stacked = stack_block_params(params, BASE)
    assert not any(k.startswith("blocks_") and not k.startswith("blocks_scan")
                   for k in stacked["params"])
    back = unstack_block_params(stacked, BASE)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 params, back)


@pytest.mark.level(1)
def test_scanned_forward_matches_unrolled_sparse_interleave():
    cfg = dataclasses.replace(
        BASE, num_blocks=4, n_dense_blocks=2,
        natten_window=(-1, 2, 2), natten_stride=(1, 1, 1),
    )
    unrolled, scanned, params = _pair(cfg)
    ref = unrolled.apply(params, X, TS, CTX)
    got = scanned.apply(stack_block_params(params, cfg), X, TS, CTX)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.level(1)
def test_scanned_grads_match_unrolled_under_remat():
    cfg = dataclasses.replace(BASE, remat="block")
    unrolled, scanned, params = _pair(cfg)
    sparams = stack_block_params(params, cfg)

    def loss_u(p):
        return jnp.sum(unrolled.apply(p, X, TS, CTX) ** 2)

    def loss_s(p):
        return jnp.sum(scanned.apply(p, X, TS, CTX) ** 2)

    gu = jax.grad(loss_u)(params)
    gs = jax.grad(loss_s)(sparams)
    # compare per-block grads through the layout converter
    gs_unrolled = unstack_block_params(gs, cfg)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-4),
        gu, gs_unrolled,
    )


@pytest.mark.level(1)
def test_scanned_init_shapes_match_stacked():
    """Direct init of the scanned model produces the stacked layout (so
    from-scratch training needs no conversion)."""
    _, scanned, params = _pair(BASE)
    direct = scanned.init(jax.random.PRNGKey(3), X, TS, CTX)
    want = jax.tree.map(lambda x: x.shape, stack_block_params(params, BASE))
    got = jax.tree.map(lambda x: x.shape, direct)
    assert want == got


@pytest.mark.level(0)
def test_adapt_block_layout_whole_model_tree():
    """adapt_block_layout finds the DiT subtree inside a whole-model param
    tree and converts it to the layout the config expects, both directions;
    no-op when it already matches."""
    from cosmos_predict2_tpu.utils.scan_params import adapt_block_layout

    _, _, params = _pair(BASE)
    tree = {"params": {"net": params["params"], "other": {"w": jnp.ones((2,))}}}
    cfg_scan = dataclasses.replace(BASE, scan_blocks=True)
    scanned = adapt_block_layout(tree, cfg_scan)
    assert "blocks_scan0" in scanned["params"]["net"]
    assert "other" in scanned["params"]
    # already matching: identity
    again = adapt_block_layout(scanned, cfg_scan)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 scanned, again)
    back = adapt_block_layout(scanned, BASE)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                 tree, back)


@pytest.mark.level(0)
def test_scan_blocks_incompatible_modes_raise():
    """kv-cache / intermediate-feature calls on a scan_blocks model raise a
    clear error (the stacked layout cannot drive the unrolled modules)."""
    scanned = MiniTrainDIT(dataclasses.replace(BASE, scan_blocks=True))
    params = scanned.init(jax.random.PRNGKey(0), X, TS, CTX)
    with pytest.raises(ValueError, match="scan_blocks"):
        scanned.apply(params, X, TS, CTX, intermediate_feature_ids=(0,))


@pytest.mark.level(1)
def test_consolidated_checkpoint_cross_layout_load(tmp_path):
    """A consolidated checkpoint saved in one block layout deserializes into
    the other via the flipped-template + adapt_block_layout fallback the CLI
    loader uses (STATUS: 'either checkpoint layout loads into either model')."""
    from cosmos_predict2_tpu.training.checkpointing import load_consolidated, save_consolidated
    from cosmos_predict2_tpu.utils.scan_params import adapt_block_layout

    _, _, params = _pair(BASE)  # unrolled layout
    path = str(tmp_path / "ck.msgpack")
    save_consolidated(params, path)

    scan_cfg = dataclasses.replace(BASE, scan_blocks=True)
    scanned_model = MiniTrainDIT(scan_cfg)
    template = scanned_model.init(jax.random.PRNGKey(9), X, TS, CTX)  # stacked
    with pytest.raises((ValueError, KeyError)):
        load_consolidated(template, path)  # layout mismatch: strict load fails
    # the CLI fallback: deserialize against the flipped-layout template...
    alt_template = adapt_block_layout(template, BASE)
    restored = adapt_block_layout(load_consolidated(alt_template, path), scan_cfg)
    ref = scanned_model.apply(adapt_block_layout(params, scan_cfg), X, TS, CTX)
    got = scanned_model.apply(restored, X, TS, CTX)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


@pytest.mark.level(1)
def test_lora_adapters_under_scan_layout():
    """LoRA must adapt the 3-D stacked kernels of a scan_blocks model (per-
    segment-member batched adapters) — and the merged forward must match
    LoRA-merged unrolled params through the layout converter."""
    from cosmos_predict2_tpu.training.lora import count_lora_params, init_lora_params, merge_lora

    cfg = BASE
    _, scanned, params = _pair(cfg)
    sparams = stack_block_params(params, cfg)
    lora_u = init_lora_params(jax.random.PRNGKey(5), params, rank=4)
    lora_s = init_lora_params(jax.random.PRNGKey(5), sparams, rank=4)
    n_u, n_s = count_lora_params(lora_u), count_lora_params(lora_s)
    assert n_s == n_u > 0, (n_s, n_u)  # same adapter capacity, just stacked

    # B inits to zero (delta would be 0 and the comparison vacuous):
    # perturb it so the merge math is actually exercised
    def perturb(l):
        if l is None:
            return None
        return {"a": l["a"], "b": jnp.full_like(l["b"], 0.01)}

    is_ad = lambda x: x is None or (isinstance(x, dict) and "a" in x)
    lora_u = jax.tree.map(perturb, lora_u, is_leaf=is_ad)

    # copy the unrolled adapters into the stacked layout so outputs compare
    def stack_lora(lu):
        inner = dict(lu["params"])
        out = {k: v for k, v in inner.items() if not k.startswith("blocks_")}
        for start, count in __import__("cosmos_predict2_tpu.networks.dit", fromlist=["block_segments"]).block_segments(cfg):
            subtrees = [inner[f"blocks_{start + j}"] for j in range(count)]
            out[f"blocks_scan{start}"] = {
                "block": jax.tree.map(lambda *xs: jnp.stack(xs, axis=0) if xs[0] is not None else None,
                                      *subtrees, is_leaf=lambda x: x is None)
            }
        return {"params": out}

    lora_su = stack_lora(lora_u)
    unrolled = MiniTrainDIT(cfg)
    ref = unrolled.apply(merge_lora(params, lora_u), X, TS, CTX)
    got = scanned.apply(merge_lora(sparams, lora_su), X, TS, CTX)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.level(1)
def test_uniform_scan_matches_unrolled_sparse_interleave():
    """scan_uniform: ONE scan over the whole dense/sparse interleave with a
    scanned runtime lax.cond switch must match the unrolled net exactly —
    forward and gradients (the mode exists so each NA Mosaic kernel
    compiles once per program; it must stay a pure program-shape change)."""
    cfg = dataclasses.replace(
        BASE, num_blocks=4, n_dense_blocks=2,
        natten_window=(-1, 2, 2), natten_stride=(1, 1, 1), remat="block",
    )
    unrolled = MiniTrainDIT(dataclasses.replace(cfg, scan_blocks=False))
    uniform_cfg = dataclasses.replace(cfg, scan_blocks=True, scan_uniform=True)
    uniform = MiniTrainDIT(uniform_cfg)
    params = unrolled.init(jax.random.PRNGKey(2), X, TS, CTX)
    # scan_uniform folds the interleave into ONE stacked segment
    assert block_segments(uniform_cfg) == [(0, 4)]
    sparams = stack_block_params(params, uniform_cfg)

    ref = unrolled.apply(params, X, TS, CTX)
    got = uniform.apply(sparams, X, TS, CTX)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    gu = jax.grad(lambda p: jnp.sum(unrolled.apply(p, X, TS, CTX) ** 2))(params)
    gs = jax.grad(lambda p: jnp.sum(uniform.apply(p, X, TS, CTX) ** 2))(sparams)
    gs_unrolled = unstack_block_params(gs, uniform_cfg)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-4),
        gu, gs_unrolled,
    )


@pytest.mark.level(0)
def test_uniform_scan_init_matches_stacked_layout():
    """Direct init of a scan_uniform model produces the single-segment
    stacked layout (blocks_scan0 over all blocks)."""
    cfg = dataclasses.replace(
        BASE, num_blocks=4, n_dense_blocks=2,
        natten_window=(-1, 2, 2), natten_stride=(1, 1, 1),
        scan_blocks=True, scan_uniform=True,
    )
    net = MiniTrainDIT(cfg)
    direct = net.init(jax.random.PRNGKey(3), X, TS, CTX)
    keys = [k for k in direct["params"] if k.startswith("blocks")]
    assert keys == ["blocks_scan0"]
    leaf = jax.tree.leaves(direct["params"]["blocks_scan0"])[0]
    assert leaf.shape[0] == 4


@pytest.mark.level(0)
def test_stack_block_params_refuses_mixed_layout():
    """A partially converted tree (stacked subtrees alongside unrolled
    blocks) must be refused, not silently dropped (ADVICE r3)."""
    params = MiniTrainDIT(BASE).init(jax.random.PRNGKey(0), X, TS, CTX)
    mixed = dict(params["params"])
    mixed["blocks_scan0"] = {"block": jax.tree.map(lambda x: x[None], mixed["blocks_0"])}
    with pytest.raises(KeyError, match="mixed-layout"):
        stack_block_params({"params": mixed}, BASE)


@pytest.mark.level(0)
def test_scan_uniform_fallback_warns(caplog):
    """scan_uniform requested without its preconditions (dense-only net)
    degrades to segmented scanning with a loud warning (ADVICE r3)."""
    import logging

    cfg = dataclasses.replace(BASE, scan_blocks=True, scan_uniform=True)  # no sparse blocks
    net = MiniTrainDIT(cfg)
    with caplog.at_level(logging.WARNING, logger="cosmos_predict2_tpu"):
        params = net.init(jax.random.PRNGKey(0), X, TS, CTX)
    assert any("scan_uniform" in r.message and "falling back" in r.message for r in caplog.records)
    # and the segmented layout was actually used
    assert any(k.startswith("blocks_scan") for k in params["params"])
