"""Golden-activation dump harness for layer-output parity checks.

The tool for weight-import validation (SURVEY.md §7 step 4): run the DiT on
a fixed input capturing every block's hidden state, save to npz, and diff
two dumps (e.g. this implementation vs activations exported from the torch
reference with the same converted weights). Complements
utils/model_comp.TensorDifference (reference test_helper.py:26-60).
"""

from __future__ import annotations

import numpy as np

from cosmos_predict2_tpu.utils.model_comp import TensorDifference


def dump_dit_activations(net, params, x, timesteps, crossattn_emb, path: str, **net_kwargs) -> dict:
    """Run MiniTrainDIT capturing all per-block hidden states + the output;
    writes an npz at ``path`` and returns the arrays."""
    n_blocks = net.config.num_blocks
    out, intermediates = net.apply(
        params, x, timesteps, crossattn_emb,
        intermediate_feature_ids=tuple(range(n_blocks)), **net_kwargs,
    )
    arrays = {f"block_{i:02d}": np.asarray(a, dtype=np.float32) for i, a in enumerate(intermediates)}
    arrays["output"] = np.asarray(out, dtype=np.float32)
    arrays["input"] = np.asarray(x, dtype=np.float32)
    np.savez_compressed(path, **arrays)
    return arrays


def compare_activation_dumps(path_a: str, path_b: str) -> list[TensorDifference]:
    """Per-tensor max-abs/rel diff between two dumps, sorted worst-first."""
    a, b = np.load(path_a), np.load(path_b)
    keys = sorted(set(a.files) & set(b.files))
    missing = set(a.files) ^ set(b.files)
    diffs = [TensorDifference.compare(a[k], b[k], name=k) for k in keys]
    for k in missing:
        diffs.append(TensorDifference(name=f"MISSING:{k}", max_abs=float("inf"), max_rel=float("inf"), mean_abs=float("inf")))
    return sorted(diffs, key=lambda d: -d.max_abs)
