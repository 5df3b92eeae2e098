"""LoRA post-training (parameter-efficient fine-tuning).

Capability parity with the reference's peft-based ``add_lora``
(text2world_model_rectified_flow.py:923-1009: rank/alpha, targets
q/k/v/output_proj + mlp.layer1/layer2, fp32 adapters) — rebuilt
functionally: adapters live in their OWN pytree and are merged into the
frozen base weights inside the jitted step (W' = W + alpha/r * A @ B),
so the optimizer/EMA/checkpointing machinery works on the small tree
unchanged. Merging costs a few tiny matmuls per layer, fused by XLA.
"""

from __future__ import annotations

import re
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TARGETS = ("q_proj", "k_proj", "v_proj", "output_proj", "mlp/layer1", "mlp/layer2")


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", p)) for p in path)


def _is_target(path_str: str, targets) -> bool:
    return path_str.endswith("/kernel") and any(t in path_str for t in targets)


def init_lora_params(
    rng: jax.Array,
    params: Any,
    rank: int = 4,
    targets=DEFAULT_TARGETS,
) -> Any:
    """LoRA tree mirroring ``params``: matching kernels get {"a", "b"},
    everything else None. A ~ kaiming-uniform (peft default), B = 0."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    keys = iter(jax.random.split(rng, len(flat)))

    def make(path, leaf):
        key = next(keys)
        if _is_target(_path_str(path), targets) and leaf.ndim == 2:
            fan_in = leaf.shape[0]
            bound = np.sqrt(6.0 / fan_in)  # kaiming uniform with a=sqrt(5) approx
            return {
                "a": jax.random.uniform(key, (leaf.shape[0], rank), jnp.float32, -bound, bound),
                "b": jnp.zeros((rank, leaf.shape[1]), dtype=jnp.float32),
            }
        if _is_target(_path_str(path), targets) and leaf.ndim == 3:
            # scan_blocks stacked kernel (segment, in, out): per-segment-
            # member adapters, batched on the same leading axis
            seg, fan_in, fan_out = leaf.shape
            bound = np.sqrt(6.0 / fan_in)
            return {
                "a": jax.random.uniform(key, (seg, fan_in, rank), jnp.float32, -bound, bound),
                "b": jnp.zeros((seg, rank, fan_out), dtype=jnp.float32),
            }
        return None

    return jax.tree_util.tree_map_with_path(make, params)


def merge_lora(params: Any, lora: Any, alpha: float = 4.0, rank: int = 4) -> Any:
    """W' = W + (alpha / rank) * A @ B on adapted leaves."""
    scale = alpha / rank

    def merge(p, l):
        if l is None:
            return p
        # 2-D kernels: A @ B; 3-D stacked (scan_blocks): batched matmul on
        # the leading segment axis — einsum covers both
        if l["a"].ndim == 2:
            delta = jnp.dot(l["a"], l["b"], preferred_element_type=jnp.float32) * scale
        else:
            delta = jnp.einsum("sir,sro->sio", l["a"], l["b"], preferred_element_type=jnp.float32) * scale
        return (p.astype(jnp.float32) + delta).astype(p.dtype)

    return jax.tree.map(merge, params, lora, is_leaf=lambda x: x is None or isinstance(x, dict) and "a" in x)


def count_lora_params(lora: Any) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(lora))


class LoRAModelWrapper:
    """Adapts a Video2WorldModel so the trainable pytree is the LoRA tree.

    ``training_step(lora, rng, x0, condition)`` merges into the frozen base
    inside jit; use with the standard Trainer by passing the lora tree as
    ``params``.
    """

    def __init__(self, model, base_params, rank: int = 4, alpha: float = 4.0, targets=DEFAULT_TARGETS):
        self.model = model
        self.config = model.config
        self.base_params = base_params
        self.rank = rank
        self.alpha = alpha
        self.targets = targets

    def init_lora(self, rng: jax.Array):
        return init_lora_params(rng, self.base_params, rank=self.rank, targets=self.targets)

    def merged(self, lora):
        return merge_lora(self.base_params, lora, alpha=self.alpha, rank=self.rank)

    def training_step(self, lora, rng, x0, condition):
        return self.model.training_step(self.merged(lora), rng, x0, condition)

    def generate(self, lora, *args, **kwargs):
        return self.model.generate(self.merged(lora), *args, **kwargs)
