"""Parameter-layout conversion for DiT scan-over-blocks.

``DiTConfig(scan_blocks=True)`` rolls consecutive same-config transformer
blocks into ``nn.scan`` segments with STACKED parameters: the unrolled
layout's ``blocks_i`` subtrees become ``blocks_scan{start}/block`` subtrees
whose leaves carry a leading segment-length axis. These helpers convert
between the two layouts, so checkpoints written by either model variant
(or by the torch converter, which emits the unrolled layout —
utils/checkpoint_convert.py) load into the other.

Reference context: the reference's torch DiT is always unrolled
(minimal_v4_dit.py:1250); scan-over-blocks is a TPU/XLA-native compile-time
optimization with no torch counterpart.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def _unwrap(params: dict) -> tuple[dict, bool]:
    if "params" in params and isinstance(params["params"], dict):
        return dict(params["params"]), True
    return dict(params), False


def _rewrap(inner: dict, wrapped: bool) -> dict:
    return {"params": inner} if wrapped else inner


def stack_block_params(params: dict, cfg: Any) -> dict:
    """Unrolled ``blocks_i`` layout -> scanned ``blocks_scan{start}`` layout.

    ``cfg`` is the DiTConfig the scanned model runs with (its
    ``block_segments`` define the stacking). Non-block entries pass through
    untouched; works with or without the top-level ``{"params": ...}``
    wrapper.
    """
    from cosmos_predict2_tpu.networks.dit import block_segments

    inner, wrapped = _unwrap(params)
    covered = {f"blocks_{i}" for i in range(cfg.num_blocks)}
    extra = [k for k in inner if k.startswith("blocks_") and not k.startswith("blocks_scan") and k not in covered]
    if extra:
        # refuse rather than silently truncate a deeper checkpoint
        raise KeyError(
            f"stack_block_params: params carry {sorted(extra)[:3]}... beyond "
            f"cfg.num_blocks={cfg.num_blocks}; depth mismatch"
        )
    mixed = [k for k in inner if k.startswith("blocks_scan")]
    if mixed:
        # a mixed unrolled+stacked tree means a partially converted
        # checkpoint — dropping the stacked subtrees would silently lose
        # parameters, so refuse instead
        raise KeyError(
            f"stack_block_params: params already carry stacked subtrees "
            f"{sorted(mixed)[:3]} alongside unrolled blocks; refusing to "
            f"convert a mixed-layout tree"
        )
    out = {k: v for k, v in inner.items() if not k.startswith("blocks_")}
    for start, count in block_segments(cfg):
        subtrees = []
        for j in range(count):
            key = f"blocks_{start + j}"
            if key not in inner:
                raise KeyError(f"stack_block_params: missing {key} in unrolled params")
            subtrees.append(inner[key])
        out[f"blocks_scan{start}"] = {
            "block": jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *subtrees)
        }
    return _rewrap(out, wrapped)


def unstack_block_params(params: dict, cfg: Any) -> dict:
    """Scanned ``blocks_scan{start}`` layout -> unrolled ``blocks_i`` layout."""
    from cosmos_predict2_tpu.networks.dit import block_segments

    inner, wrapped = _unwrap(params)
    out = {k: v for k, v in inner.items() if not k.startswith("blocks_scan")}
    for start, count in block_segments(cfg):
        key = f"blocks_scan{start}"
        if key not in inner:
            raise KeyError(f"unstack_block_params: missing {key} in scanned params")
        stacked = inner[key]["block"]
        for j in range(count):
            out[f"blocks_{start + j}"] = jax.tree.map(lambda x, _j=j: x[_j], stacked)
    return _rewrap(out, wrapped)


def adapt_block_layout(params: dict, cfg: Any) -> dict:
    """Convert any DiT block subtrees in ``params`` to the layout ``cfg``
    expects (``cfg.scan_blocks`` -> stacked, else unrolled). Recurses so it
    works on whole-model trees (e.g. ``{"params": {"net": {...}}}``) as well
    as bare DiT trees; no-op when the layout already matches. Used by the
    model loader so torch-converted checkpoints (always unrolled) load into
    scanned models transparently."""

    def rec(d):
        if not isinstance(d, dict):
            return d
        # only convert subtrees that are actually the DiT: other modules
        # (Wan DiT, XLM-R, Qwen vision) also name layers blocks_i but lack
        # the DiT's sibling modules
        is_dit = "final_layer" in d or "x_embedder" in d
        has_unrolled = any(k.startswith("blocks_") and not k.startswith("blocks_scan") for k in d)
        has_scan = any(k.startswith("blocks_scan") for k in d)
        if is_dit and has_unrolled and cfg.scan_blocks:
            return stack_block_params(d, cfg)
        if is_dit and has_scan and not cfg.scan_blocks:
            return unstack_block_params(d, cfg)
        return {k: rec(v) for k, v in d.items()}

    return rec(dict(params))
