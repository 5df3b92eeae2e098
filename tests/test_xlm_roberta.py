"""XLM-Roberta text encoder (Wan i2v path) vs the ACTUAL reference torch
module (predict2/networks/xlm_roberta.py, clip.py:285-307), seeded random
weights through the converter — not self-generated goldens."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from cosmos_predict2_tpu.text_encoders.xlm_roberta import (
    XLMRoberta,
    XLMRobertaConfig,
    XLMRobertaWithHead,
    convert_xlm_roberta_state_dict,
)
from reference_shims import import_reference

CFG = XLMRobertaConfig.tiny()


def _ids():
    rng = np.random.RandomState(0)
    ids = rng.randint(2, CFG.vocab_size, size=(2, 12))
    ids[0, 9:] = CFG.pad_id  # ragged pad
    ids[1, 5:] = CFG.pad_id
    return ids


@pytest.fixture(scope="module")
def ref_module():
    xlm = import_reference("cosmos_predict2._src.predict2.networks.xlm_roberta")
    torch.manual_seed(0)
    return xlm.XLMRoberta(
        vocab_size=CFG.vocab_size,
        max_seq_len=CFG.max_seq_len,
        type_size=CFG.type_size,
        pad_id=CFG.pad_id,
        dim=CFG.dim,
        num_heads=CFG.num_heads,
        num_layers=CFG.num_layers,
        post_norm=CFG.post_norm,
        dropout=0.0,
        eps=CFG.eps,
    ).eval()


@pytest.mark.level(1)
def test_backbone_matches_reference(ref_module):
    ids = _ids()
    with torch.no_grad():
        ref_out = ref_module(torch.from_numpy(ids)).numpy()

    params = convert_xlm_roberta_state_dict(ref_module.state_dict(), CFG.num_layers)
    params = jax.tree.map(lambda a: jnp.asarray(a), params)
    mine = np.asarray(XLMRoberta(CFG).apply(params, jnp.asarray(ids)))

    # pad positions may differ (ref attends them into garbage; both mask at
    # pooling) — compare non-pad positions
    mask = ids != CFG.pad_id
    diff = np.abs(mine - ref_out)[mask]
    assert diff.max() < 1e-4, f"max diff {diff.max()}"


@pytest.mark.level(1)
def test_with_head_matches_reference(ref_module):
    clip = import_reference("cosmos_predict2._src.predict2.networks.clip")
    torch.manual_seed(1)
    ref = clip.XLMRobertaWithHead(
        vocab_size=CFG.vocab_size,
        max_seq_len=CFG.max_seq_len,
        type_size=CFG.type_size,
        pad_id=CFG.pad_id,
        dim=CFG.dim,
        num_heads=CFG.num_heads,
        num_layers=CFG.num_layers,
        post_norm=CFG.post_norm,
        dropout=0.0,
        eps=CFG.eps,
        out_dim=CFG.out_dim,
    ).eval()
    ids = _ids()
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(ids)).numpy()

    params = convert_xlm_roberta_state_dict(ref.state_dict(), CFG.num_layers, with_head=True)
    params = jax.tree.map(lambda a: jnp.asarray(a), params)
    mine = np.asarray(XLMRobertaWithHead(CFG).apply(params, jnp.asarray(ids)))
    assert mine.shape == ref_out.shape == (2, CFG.out_dim)
    np.testing.assert_allclose(mine, ref_out, rtol=1e-4, atol=1e-5)
