"""Model comparison / debugging helpers.

Parity with the reference debug tooling: ``compare_models_thoroughly``
(predict2/utils/model_comp.py:19 — weight-diff reporting between two
models) and ``TensorDifference`` (predict2/utils/test_helper.py:26-60 —
max-abs/rel numeric comparison used by kernel-equivalence tests).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np


@dataclasses.dataclass
class TensorDifference:
    name: str
    max_abs: float
    max_rel: float
    mean_abs: float

    @staticmethod
    def compare(a, b, name: str = "") -> "TensorDifference":
        a = np.asarray(a, dtype=np.float64)
        b = np.asarray(b, dtype=np.float64)
        diff = np.abs(a - b)
        denom = np.maximum(np.abs(b), 1e-12)
        return TensorDifference(
            name=name,
            max_abs=float(diff.max()) if diff.size else 0.0,
            max_rel=float((diff / denom).max()) if diff.size else 0.0,
            mean_abs=float(diff.mean()) if diff.size else 0.0,
        )

    def __str__(self):
        return f"{self.name}: max_abs={self.max_abs:.3e} max_rel={self.max_rel:.3e} mean_abs={self.mean_abs:.3e}"


def compare_models_thoroughly(params_a: Any, params_b: Any, atol: float = 0.0) -> list[TensorDifference]:
    """Leaf-by-leaf diff of two param pytrees; returns sorted by max_abs."""
    flat_a = jax.tree_util.tree_flatten_with_path(params_a)[0]
    flat_b = dict(
        (jax.tree_util.keystr(p), v) for p, v in jax.tree_util.tree_flatten_with_path(params_b)[0]
    )
    diffs = []
    for path, leaf in flat_a:
        key = jax.tree_util.keystr(path)
        if key not in flat_b:
            diffs.append(TensorDifference(key + " [MISSING IN B]", float("inf"), float("inf"), float("inf")))
            continue
        other = flat_b.pop(key)
        if np.asarray(leaf).shape != np.asarray(other).shape:
            diffs.append(TensorDifference(key + " [SHAPE MISMATCH]", float("inf"), float("inf"), float("inf")))
            continue
        d = TensorDifference.compare(leaf, other, key)
        if d.max_abs > atol:
            diffs.append(d)
    for key in flat_b:
        diffs.append(TensorDifference(key + " [MISSING IN A]", float("inf"), float("inf"), float("inf")))
    return sorted(diffs, key=lambda d: -d.max_abs)
