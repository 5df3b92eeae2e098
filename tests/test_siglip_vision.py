"""SigLIP vision tower vs HuggingFace SiglipVisionModel (CPU parity)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cosmos_predict2_tpu.text_encoders.siglip_vision import (
    SigLIPVisionConfig,
    SigLIPVisionTower,
    convert_siglip_vision_state_dict,
    make_frame_embedder,
)

CFG = SigLIPVisionConfig(
    image_size=28, patch_size=14, dim=64, mlp_dim=128, num_heads=2, num_layers=2, dtype=jnp.float32
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import SiglipVisionConfig as HFConfig, SiglipVisionModel

    torch.manual_seed(0)
    hf = SiglipVisionModel(
        HFConfig(
            hidden_size=CFG.dim,
            intermediate_size=CFG.mlp_dim,
            num_hidden_layers=CFG.num_layers,
            num_attention_heads=CFG.num_heads,
            image_size=CFG.image_size,
            patch_size=CFG.patch_size,
        )
    ).eval()
    return hf


@pytest.mark.level(1)
def test_pooled_features_match_hf(hf_model):
    params = convert_siglip_vision_state_dict(dict(hf_model.state_dict()), CFG)
    tower = SigLIPVisionTower(CFG)

    rng = np.random.RandomState(1)
    pixels = rng.uniform(-1, 1, (2, CFG.image_size, CFG.image_size, 3)).astype(np.float32)

    with torch.no_grad():
        ref = hf_model(torch.from_numpy(pixels.transpose(0, 3, 1, 2))).pooler_output.numpy()

    mine = np.asarray(tower.apply(params, jnp.asarray(pixels)))
    assert mine.shape == ref.shape == (2, CFG.dim)
    np.testing.assert_allclose(mine, ref, atol=2e-5)


@pytest.mark.level(1)
def test_frame_embedder_plugs_into_safety_filter(hf_model):
    from cosmos_predict2_tpu.utils.guardrails import VideoContentSafetyFilter

    params = convert_siglip_vision_state_dict(dict(hf_model.state_dict()), CFG)
    embed = make_frame_embedder(params, CFG)

    rng = np.random.RandomState(2)
    frames = rng.randint(0, 255, (9, 40, 40, 3), dtype=np.uint8)
    emb = embed(frames[:2])
    assert emb.shape == (2, CFG.dim) and np.isfinite(emb).all()

    # classifier head on top of the embedder: always-safe weights
    classifier = {
        "fc1": {"w": np.zeros((CFG.dim, 8), np.float32), "b": np.zeros(8, np.float32)},
        "bn1": {"scale": np.ones(8, np.float32), "bias": np.zeros(8, np.float32),
                "mean": np.zeros(8, np.float32), "var": np.ones(8, np.float32)},
        "fc2": {"w": np.zeros((8, 4), np.float32), "b": np.zeros(4, np.float32)},
        "bn2": {"scale": np.ones(4, np.float32), "bias": np.zeros(4, np.float32),
                "mean": np.zeros(4, np.float32), "var": np.ones(4, np.float32)},
        "fc3": {"w": np.zeros((4, 7), np.float32),
                "b": np.asarray([5.0, 0, 0, 0, 0, 0, 0], np.float32)},  # class 0 = Safe
    }
    filt = VideoContentSafetyFilter(embed, classifier, sample_every=4)
    assert filt.is_safe_frames(frames)
