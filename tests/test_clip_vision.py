"""CLIP ViT vision tower: shapes, converter round-trip, torch numerics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.text_encoders.clip_vision import (
    CLIP_MEAN,
    CLIP_STD,
    CLIPVisionConfig,
    CLIPVisionTower,
    convert_clip_vision_state_dict,
    encode_first_frame,
    preprocess_clip,
)

TINY = CLIPVisionConfig(image_size=28, patch_size=14, dim=16, num_heads=2, num_layers=3, dtype=jnp.float32)


@pytest.mark.level(0)
def test_tower_shapes():
    tower = CLIPVisionTower(TINY)
    px = jax.random.normal(jax.random.PRNGKey(0), (2, 28, 28, 3))
    params = tower.init(jax.random.PRNGKey(1), px, run_head=True)  # creates all blocks + head
    out = tower.apply(params, px)
    # use_31_block semantics: 1 cls + 4 patches tokens, hidden dim, no head
    assert out.shape == (2, 5, 16)
    pooled = tower.apply(params, px, run_head=True)
    assert pooled.shape == (2, TINY.out_dim)


@pytest.mark.level(0)
def test_preprocess_range():
    frames = jnp.zeros((1, 40, 40, 3))  # pm1 zeros == mid-gray 0.5
    out = preprocess_clip(frames, image_size=28)
    assert out.shape == (1, 28, 28, 3)
    np.testing.assert_allclose(np.asarray(out[0, 14, 14]), (0.5 - CLIP_MEAN) / CLIP_STD, atol=1e-5)


@pytest.mark.level(0)
def test_encode_first_frame_shape():
    tower = CLIPVisionTower(TINY)
    video = jax.random.uniform(jax.random.PRNGKey(0), (1, 4, 40, 40, 3), minval=-1, maxval=1)
    params = tower.init(jax.random.PRNGKey(1), jnp.zeros((1, 28, 28, 3)))
    emb = encode_first_frame(tower, params, video)
    assert emb.shape == (1, 5, 16)


@pytest.mark.level(1)
def test_matches_torch_reference_math():
    """Converted torch weights -> flax forward == an independent torch
    forward implementing the open-clip block math (pre-LN, fp32 LN, GELU)."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    cfg = TINY
    D, H, L = cfg.dim, cfg.num_heads, cfg.num_layers
    sd = {
        "visual.patch_embedding.weight": torch.randn(D, 3, 14, 14) * 0.02,
        "visual.cls_embedding": torch.randn(1, 1, D) * 0.02,
        "visual.pos_embedding": torch.randn(1, cfg.num_patches + 1, D) * 0.02,
        "visual.pre_norm.weight": torch.rand(D) + 0.5,
        "visual.pre_norm.bias": torch.randn(D) * 0.1,
    }
    for i in range(L - 1):
        t = f"visual.transformer.{i}."
        sd[t + "norm1.weight"] = torch.rand(D) + 0.5
        sd[t + "norm1.bias"] = torch.randn(D) * 0.1
        sd[t + "attn.to_qkv.weight"] = torch.randn(3 * D, D) * 0.05
        sd[t + "attn.to_qkv.bias"] = torch.randn(3 * D) * 0.02
        sd[t + "attn.proj.weight"] = torch.randn(D, D) * 0.05
        sd[t + "attn.proj.bias"] = torch.randn(D) * 0.02
        sd[t + "norm2.weight"] = torch.rand(D) + 0.5
        sd[t + "norm2.bias"] = torch.randn(D) * 0.1
        sd[t + "mlp.0.weight"] = torch.randn(4 * D, D) * 0.05
        sd[t + "mlp.0.bias"] = torch.randn(4 * D) * 0.02
        sd[t + "mlp.2.weight"] = torch.randn(D, 4 * D) * 0.05
        sd[t + "mlp.2.bias"] = torch.randn(D) * 0.02

    px = torch.randn(2, 3, 28, 28)

    # independent torch forward (open-clip visual tower, use_31_block path)
    with torch.no_grad():
        x = torch.nn.functional.conv2d(px, sd["visual.patch_embedding.weight"], stride=14)
        x = x.flatten(2).permute(0, 2, 1)
        x = torch.cat([sd["visual.cls_embedding"].expand(2, -1, -1), x], dim=1)
        x = x + sd["visual.pos_embedding"]
        x = torch.nn.functional.layer_norm(x, (D,), sd["visual.pre_norm.weight"], sd["visual.pre_norm.bias"])
        for i in range(L - 1):
            t = f"visual.transformer.{i}."
            h = torch.nn.functional.layer_norm(x, (D,), sd[t + "norm1.weight"], sd[t + "norm1.bias"])
            qkv = h @ sd[t + "attn.to_qkv.weight"].T + sd[t + "attn.to_qkv.bias"]
            B, S, _ = qkv.shape
            q, k, v = qkv.view(B, S, 3, H, D // H).permute(2, 0, 3, 1, 4).unbind(0)
            o = torch.nn.functional.scaled_dot_product_attention(q, k, v)
            o = o.permute(0, 2, 1, 3).reshape(B, S, D)
            x = x + o @ sd[t + "attn.proj.weight"].T + sd[t + "attn.proj.bias"]
            h = torch.nn.functional.layer_norm(x, (D,), sd[t + "norm2.weight"], sd[t + "norm2.bias"])
            h = torch.nn.functional.gelu(h @ sd[t + "mlp.0.weight"].T + sd[t + "mlp.0.bias"])
            x = x + h @ sd[t + "mlp.2.weight"].T + sd[t + "mlp.2.bias"]
        ref = x.numpy()

    params = convert_clip_vision_state_dict(sd, cfg)
    out = CLIPVisionTower(cfg).apply(params, jnp.asarray(px.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)
