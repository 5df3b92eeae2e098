"""Qwen2.5-VL vision tower: cross-framework numerics vs HuggingFace torch."""

import numpy as np
import jax
import pytest

from cosmos_predict2_tpu.text_encoders.qwen_vision import (
    QwenVisionConfig,
    QwenVisionTower,
    convert_qwen_vision_hf_state_dict,
    encode_pixels,
    get_window_index,
    rot_pos_emb,
)


@pytest.mark.level(0)
def test_window_index_roundtrip():
    cfg = QwenVisionConfig.tiny()
    grid = np.array([[1, 8, 8]])  # 4x4 merged cells, 2x2 windows of 2x2 cells
    window_index, seg_window, seg_full, patch_perm = get_window_index(cfg, grid)
    assert sorted(window_index.tolist()) == list(range(16))
    assert seg_window.shape == (64,) and seg_full.shape == (64,)
    # 4 windows of 4 merged cells -> segments of 16 patches each
    assert (np.bincount(seg_window) == 16).all()
    assert (seg_full == 0).all()
    # patch_perm is a permutation of all patches
    assert sorted(patch_perm.tolist()) == list(range(64))


@pytest.mark.level(1)
def test_vision_tower_matches_huggingface():
    torch = pytest.importorskip("torch")
    from transformers.models.qwen2_5_vl.configuration_qwen2_5_vl import Qwen2_5_VLVisionConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel,
    )

    cfg = QwenVisionConfig.tiny()
    hf_cfg = Qwen2_5_VLVisionConfig(
        hidden_size=cfg.hidden_size,
        out_hidden_size=cfg.out_hidden_size,
        intermediate_size=cfg.intermediate_size,
        depth=cfg.depth,
        num_heads=cfg.num_heads,
        in_channels=cfg.in_channels,
        patch_size=cfg.patch_size,
        temporal_patch_size=cfg.temporal_patch_size,
        spatial_merge_size=cfg.spatial_merge_size,
        window_size=cfg.window_size,
        fullatt_block_indexes=list(cfg.fullatt_block_indexes),
        hidden_act="silu",
    )
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    hf = Qwen2_5_VisionTransformerPretrainedModel(hf_cfg).eval()

    # two images: 2x(8x8) patches and (1x... ) second grid 4x8
    grid = np.array([[1, 8, 8], [1, 4, 8]])
    S = int((grid[:, 0] * grid[:, 1] * grid[:, 2]).sum())
    patch_dim = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size**2
    pixels = np.random.RandomState(1).randn(S, patch_dim).astype(np.float32)

    with torch.no_grad():
        expected = hf(torch.from_numpy(pixels), grid_thw=torch.from_numpy(grid)).numpy()

    params = jax.tree.map(
        __import__("jax.numpy", fromlist=["asarray"]).asarray,
        convert_qwen_vision_hf_state_dict({k: v.numpy() for k, v in hf.state_dict().items()}, cfg.depth),
    )
    tower = QwenVisionTower(cfg)
    got = np.asarray(encode_pixels(tower, params, pixels, grid))
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=3e-4)
