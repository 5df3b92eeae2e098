"""Released-weights readiness kit, self-tested offline.

Synthetic checkpoints are manufactured at the TRUE released tensor shapes
via utils/checkpoint_export.py (the inverse converter), then flow through
the full verify pipeline: convert -> contract check -> generate -> PSNR.
Reference contract: predict2/utils/model_loader.py:33-171,
scripts/convert_distcp_to_pt.py.
"""

import dataclasses
import json

import jax
import numpy as np
import pytest

from cosmos_predict2_tpu.models.video2world import Video2WorldModel
from cosmos_predict2_tpu.utils import checkpoint_convert as cc
from cosmos_predict2_tpu.utils import checkpoint_export as ce

LATENT = (1, 16, 2, 8, 8)


def _template(model, text_len=32):
    return jax.eval_shape(lambda r: model.init_params(r, LATENT, text_len=text_len), jax.random.PRNGKey(0))


@pytest.mark.level(0)
def test_dit_roundtrip_mini():
    """convert(export(params)) == params, exact, on the mini net."""
    from cosmos_predict2_tpu.configs.defaults import make_config
    from cosmos_predict2_tpu.configs.registry import get_node

    cfg = make_config("predict2_video2world_2b_rectified_flow")
    model_cfg = dataclasses.replace(cfg.model, net=get_node("net", "mini_net"))
    model = Video2WorldModel(model_cfg)
    params = ce.patterned_like(_template(model))
    sd = ce.export_dit_state_dict(params)
    back = cc.convert_dit_state_dict(sd, model_cfg.net.num_blocks)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), params, back)


@pytest.mark.level(1)
def test_dit_roundtrip_true_2b_shapes():
    """Round trip at the real 2B tensor shapes (2048ch/16h/28blk + AdaLN-LoRA
    + crossattn projection 100352 -> 1024) — VERDICT r3 item 3."""
    from cosmos_predict2_tpu.configs.defaults import make_config

    cfg = make_config(
        "Stage-c_pt_4-reason_embeddings-v1p1-Index-26-Size-2B-Res-720-Fps-16"
        "-Note-T2V_high_sigma_loss_reweighted_1_1_rectified_flow_only_resume2"
    )
    model = Video2WorldModel(cfg.model)
    template = _template(model, text_len=8)
    params = ce.patterned_like(template)
    n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(template))
    assert n > 1.9e9, f"2B preset should have ~2e9 params, got {n:,}"
    sd = ce.export_dit_state_dict(params, prefix="net_ema.")
    stripped = cc.strip_prefix(sd, "net_ema.")
    back = cc.convert_dit_state_dict(stripped, cfg.model.net.num_blocks)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(p): l for p, l in jax.tree_util.tree_leaves_with_path(back)}
    for path, leaf in flat_a:
        key = jax.tree_util.keystr(path)
        assert key in flat_b, f"lost {key}"
        got = flat_b[key]
        assert got.shape == leaf.shape, f"{key}: {got.shape} vs {leaf.shape}"
        # sample-compare corners instead of full 8 GB equality sweeps
        a, b = np.asarray(leaf).ravel(), np.asarray(got).ravel()
        idx = np.linspace(0, a.size - 1, 17, dtype=np.int64)
        np.testing.assert_array_equal(a[idx], b[idx], err_msg=key)


@pytest.mark.level(0)
def test_vae_roundtrip_true_shapes():
    """VAE converter round trip at the real Wan2.1 shapes (~127M params)."""
    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig
    import jax.numpy as jnp

    vae = WanVAE(WanVAEConfig())
    template = jax.eval_shape(
        lambda r: vae.init(r, jnp.zeros((1, 5, 32, 32, 3), dtype=jnp.float32)), jax.random.PRNGKey(0)
    )
    params = ce.patterned_like(template)
    sd = ce.export_vae_state_dict(params)
    back = cc.convert_vae_state_dict(sd)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)), params, back)


@pytest.mark.level(1)
def test_verify_script_end_to_end(tmp_path, capsys):
    """The one-command verifier runs the whole chain on a synthetic
    checkpoint: write golden, verify (PSNR inf), then catch a perturbed
    checkpoint (PSNR collapse)."""
    import sys

    sys.path.insert(0, "scripts")
    import verify_released_weights as vrw

    from cosmos_predict2_tpu.configs.defaults import make_config
    from cosmos_predict2_tpu.configs.registry import get_node

    # synthetic checkpoint on the mini net (the 2B path is shape-covered
    # above; e2e generation at 2B is a chip job, not a CPU test)
    cfg = make_config("predict2_video2world_2b_rectified_flow")
    model_cfg = dataclasses.replace(
        cfg.model,
        net=dataclasses.replace(
            get_node("net", "mini_net"),
            use_crossattn_projection=cfg.model.net.use_crossattn_projection,
            crossattn_proj_in_channels=cfg.model.net.crossattn_proj_in_channels,
        ),
    )
    model = Video2WorldModel(model_cfg)
    rng = jax.random.PRNGKey(7)
    params = model.init_params(rng, LATENT, text_len=16)
    sd = ce.export_dit_state_dict(params, prefix="net_ema.")
    ckpt = str(tmp_path / "synthetic_ema.pt")
    ce.save_torch_state_dict(sd, ckpt)

    # register a tiny experiment the script can resolve
    from cosmos_predict2_tpu.configs.registry import Experiment, register_experiment

    register_experiment(
        Experiment(
            name="_verify_script_test_mini",
            base="predict2_video2world_2b_rectified_flow",
            overrides={
                "model.net.model_channels": model_cfg.net.model_channels,
                "model.net.num_heads": model_cfg.net.num_heads,
                "model.net.num_blocks": model_cfg.net.num_blocks,
                "model.net.adaln_lora_dim": model_cfg.net.adaln_lora_dim,
            },
        )
    )

    golden = str(tmp_path / "golden.npz")
    common = [
        "--dit", ckpt, "--experiment", "_verify_script_test_mini",
        "--steps", "2", "--frames", "5", "--height", "64", "--width", "64",
        "--golden", golden,
    ]
    assert vrw.main(common + ["--write-golden"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] and out["golden_written"] == golden

    assert vrw.main(common) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ok"] and out["psnr_db"] > 60

    # corrupt one attention kernel: the verifier must fail loudly
    bad_params = jax.tree_util.tree_map(lambda x: x, params)
    import torch

    bad_sd = dict(sd)
    key = "net_ema.blocks.0.self_attn.q_proj.weight"
    bad_sd[key] = bad_sd[key] + 0.5
    bad_ckpt = str(tmp_path / "corrupt_ema.pt")
    ce.save_torch_state_dict(bad_sd, bad_ckpt)
    rc = vrw.main(["--dit", bad_ckpt] + common[2:])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 1 and not out["ok"]
    del bad_params
