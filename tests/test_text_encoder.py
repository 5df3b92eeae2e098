"""Text-encoder tests, including a cross-framework numerics check against
HuggingFace's torch Qwen2 implementation (same architecture family as
Qwen2.5-VL's language model) with shared random weights."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.text_encoders.qwen import (
    QwenConfig,
    QwenLM,
    mean_normalize,
    pool_hidden_states,
)
from cosmos_predict2_tpu.text_encoders.text_encoder import convert_qwen_hf_state_dict


@pytest.mark.level(0)
def test_mean_normalize_matches_torch_std():
    import torch

    x = np.random.RandomState(0).randn(2, 5, 16).astype(np.float32)
    got = np.asarray(mean_normalize(jnp.asarray(x)))
    xt = torch.from_numpy(x)
    expected = ((xt - xt.mean(dim=-1, keepdim=True)) / (xt.std(dim=-1, keepdim=True) + 1e-8)).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.level(0)
def test_pool_strategies_shapes():
    hs = [jnp.ones((1, 4, 8)) * i for i in range(5)]  # embedding + 4 layers
    assert pool_hidden_states(hs, "full_concat").shape == (1, 4, 32)
    assert pool_hidden_states(hs, "mean_pooling").shape == (1, 4, 8)
    assert pool_hidden_states(hs, "pool_every_n_layers_and_concat", 2).shape == (1, 4, 16)


@pytest.mark.level(1)
def test_qwen_matches_huggingface():
    """Random-weight HF Qwen2 vs our Flax QwenLM: identical hidden states."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config
    from transformers.models.qwen2.modeling_qwen2 import Qwen2Model

    cfg = QwenConfig.tiny()
    hf_cfg = Qwen2Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        attention_dropout=0.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = Qwen2Model(hf_cfg).eval()

    input_ids = np.random.RandomState(1).randint(0, cfg.vocab_size, size=(2, 12))
    with torch.no_grad():
        out = hf(torch.from_numpy(input_ids), output_hidden_states=True)
    hf_hidden = [h.numpy() for h in out.hidden_states]

    sd = {f"model.{k}": v.numpy() for k, v in hf.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_qwen_hf_state_dict(sd, cfg.num_hidden_layers))
    lm = QwenLM(cfg)
    ours = lm.apply(params, jnp.asarray(input_ids))

    # HF's hidden_states: embeddings + per-layer outputs, with the LAST one
    # post-final-norm in recent transformers. Compare all pre-norm states.
    assert len(ours) == len(hf_hidden)
    for i in range(len(ours) - 1):
        np.testing.assert_allclose(
            np.asarray(ours[i]), hf_hidden[i], atol=2e-4,
            err_msg=f"hidden state {i} mismatch",
        )


@pytest.mark.level(1)
def test_multimodal_vision_splice():
    """Vision embeddings replace placeholder positions and change pooled
    output only when the mask marks them."""
    import dataclasses

    from cosmos_predict2_tpu.text_encoders.qwen import QwenConfig, QwenLM

    cfg = dataclasses.replace(
        QwenConfig(), vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, dtype=jnp.float32,
    )
    lm = QwenLM(cfg)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 64, (1, 12)))
    params = lm.init(jax.random.PRNGKey(0), ids)

    vis = jnp.asarray(np.random.RandomState(1).randn(1, 12, 32), dtype=jnp.float32)
    mask = jnp.zeros((1, 12), dtype=bool).at[0, 3:7].set(True)

    plain = lm.apply(params, ids)[-1]
    spliced = lm.apply(params, ids, vision_embeds=vis, vision_mask=mask)[-1]
    assert float(jnp.max(jnp.abs(plain - spliced))) > 1e-4
    # a zero mask must be a no-op
    same = lm.apply(params, ids, vision_embeds=vis, vision_mask=jnp.zeros((1, 12), bool))[-1]
    np.testing.assert_allclose(np.asarray(plain), np.asarray(same), atol=0)
