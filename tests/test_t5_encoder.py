"""In-JAX T5/umT5 encoder parity vs HF transformers (the reference's
offline embedding towers: get_t5_emb.py T5-11B, get_umt5_emb.py umT5-XXL)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosmos_predict2_tpu.text_encoders.t5_encoder import (
    T5Config,
    T5Encoder,
    convert_t5_hf_state_dict,
    relative_position_buckets,
)

IDS = np.array([[3, 45, 12, 99, 7, 0, 0, 0], [5, 1, 250, 33, 21, 99, 4, 0]], dtype=np.int32)
MASK = np.array([[1, 1, 1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 1, 1, 0]], dtype=np.int32)


def _hf_t5(tiny_cfg, gated):
    import torch
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    torch.manual_seed(0)
    hf_cfg = HFT5Config(
        vocab_size=tiny_cfg.vocab_size,
        d_model=tiny_cfg.d_model,
        d_kv=tiny_cfg.d_kv,
        d_ff=tiny_cfg.d_ff,
        num_layers=tiny_cfg.num_layers,
        num_heads=tiny_cfg.num_heads,
        relative_attention_num_buckets=tiny_cfg.relative_attention_num_buckets,
        relative_attention_max_distance=tiny_cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu" if gated else "relu",
        is_encoder_decoder=False,
    )
    return T5EncoderModel(hf_cfg).eval()


@pytest.mark.level(0)
def test_relative_buckets_match_hf():
    from transformers.models.t5.modeling_t5 import T5Attention as HFT5Attention

    import torch

    ours = relative_position_buckets(16, 16, 32, 128)
    ctx = torch.arange(16)[:, None]
    mem = torch.arange(16)[None, :]
    theirs = HFT5Attention._relative_position_bucket(
        mem - ctx, bidirectional=True, num_buckets=32, max_distance=128
    ).numpy()
    np.testing.assert_array_equal(ours, theirs)


@pytest.mark.level(1)
@pytest.mark.parametrize("gated", [False, True], ids=["relu_v1", "gated_gelu_v11"])
def test_t5_encoder_matches_hf(gated):
    """Forward parity with HF T5EncoderModel for both FFN variants
    (T5-11B is relu/v1.0; umT5 is the gated-gelu family)."""
    import torch

    cfg = T5Config.tiny(gated_act=gated)
    hf = _hf_t5(cfg, gated)
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_t5_hf_state_dict(sd, cfg.num_layers))

    enc = T5Encoder(cfg)
    ours = np.asarray(enc.apply(params, jnp.asarray(IDS), jnp.asarray(MASK)))

    with torch.no_grad():
        theirs = hf(
            input_ids=torch.from_numpy(IDS.astype(np.int64)),
            attention_mask=torch.from_numpy(MASK.astype(np.int64)),
        ).last_hidden_state.numpy()
    theirs = theirs * MASK[..., None]
    np.testing.assert_allclose(ours, theirs, atol=3e-5, rtol=1e-4)


@pytest.mark.level(1)
def test_umt5_per_layer_bias_matches_hf():
    """umT5 family: per-layer relative bias (HF UMT5EncoderModel)."""
    import torch
    from transformers import UMT5Config as HFUMT5Config
    from transformers import UMT5EncoderModel

    torch.manual_seed(0)
    cfg = T5Config.tiny(gated_act=True, per_layer_rel_bias=True)
    hf = UMT5EncoderModel(
        HFUMT5Config(
            vocab_size=cfg.vocab_size,
            d_model=cfg.d_model,
            d_kv=cfg.d_kv,
            d_ff=cfg.d_ff,
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            relative_attention_num_buckets=cfg.relative_attention_num_buckets,
            relative_attention_max_distance=cfg.relative_attention_max_distance,
            feed_forward_proj="gated-gelu",
            is_encoder_decoder=False,
        )
    ).eval()
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = jax.tree.map(jnp.asarray, convert_t5_hf_state_dict(sd, cfg.num_layers))
    enc = T5Encoder(cfg)
    ours = np.asarray(enc.apply(params, jnp.asarray(IDS), jnp.asarray(MASK)))
    with torch.no_grad():
        theirs = hf(
            input_ids=torch.from_numpy(IDS.astype(np.int64)),
            attention_mask=torch.from_numpy(MASK.astype(np.int64)),
        ).last_hidden_state.numpy()
    theirs = theirs * MASK[..., None]
    np.testing.assert_allclose(ours, theirs, atol=3e-5, rtol=1e-4)


@pytest.mark.level(0)
def test_true_shape_configs():
    """The released-checkpoint configs init at the true hidden sizes
    (abstractly — no 11B materialization)."""
    for cfg in (T5Config.t5_11b(), T5Config.umt5_xxl()):
        enc = T5Encoder(cfg)
        shapes = jax.eval_shape(
            lambda: enc.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, 4), jnp.int32),
                jnp.ones((1, 4), jnp.int32),
            )
        )
        n = sum(int(np.prod(l.shape)) for l in jax.tree.leaves(shapes))
        assert n > 1e9  # 11B-encoder ~ 4.7e9, umT5-xxl encoder ~ 6.7e9


@pytest.mark.level(1)
def test_offline_encoder_jax_backend_matches_torch_backend(monkeypatch, tmp_path):
    """OfflineT5Encoder glue: the jax backend reproduces the torch backend
    through the same tokenizer + checkpoint."""
    import transformers

    from cosmos_predict2_tpu.text_encoders.t5 import OfflineT5Encoder

    cfg = T5Config.tiny()
    hf = _hf_t5(cfg, gated=False)

    class FakeTok:
        def __call__(self, prompts, **kw):
            n = kw.get("max_length", 8)
            ids = np.zeros((len(prompts), n), dtype=np.int64)
            mask = np.zeros((len(prompts), n), dtype=np.int64)
            for i, p in enumerate(prompts):
                toks = [ord(c) % 251 + 2 for c in p][: n - 1] + [1]
                ids[i, : len(toks)] = toks
                mask[i, : len(toks)] = 1
            return {"input_ids": ids, "attention_mask": mask}

    monkeypatch.setattr(
        transformers.AutoTokenizer, "from_pretrained", staticmethod(lambda path: FakeTok())
    )
    monkeypatch.setattr(
        transformers.T5EncoderModel, "from_pretrained", staticmethod(lambda path, **kw: hf)
    )

    prompts = ["a robot arm", "rain on a window at night"]
    jax_emb = OfflineT5Encoder("fake", max_length=8, backend="jax")(prompts)
    torch_emb = OfflineT5Encoder("fake", max_length=8, backend="torch")(prompts)
    assert jax_emb.shape == torch_emb.shape == (2, 8, cfg.d_model)
    np.testing.assert_allclose(jax_emb, torch_emb, atol=2e-2, rtol=2e-2)  # bf16 tower
