"""Context parallelism: Ulysses all-to-all attention on a mesh axis.

TPU-native replacement for the reference's Ulysses CP
(cosmos_predict2/_src/predict2/networks/a2a_cp.py:45-226: NCCL
all_to_all_single scattering heads / gathering sequence around
flash-attention, with a side CUDA stream for overlap): here the two
all-to-alls are ``jax.lax.all_to_all`` inside a partial-manual
``shard_map`` over the cp axis only — XLA schedules them on ICI and
overlaps with compute natively, no stream management needed.

Layout: (B, S, H, D). Entering attention each cp shard holds S/c of the
sequence and all H heads; the first all-to-all regroups to full S and H/c
heads; flash attention runs on the full sequence; the second all-to-all
restores (S/c, H).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import PartitionSpec as P

from cosmos_predict2_tpu.ops.attention import dot_product_attention


def ulysses_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    axis_name: str = "cp",
    backend: Optional[str] = None,
    frame_group: int = 0,
    na_video_size: Optional[tuple[int, int, int]] = None,
    na_window: tuple[int, int, int] = (-1, -1, -1),
    na_stride: tuple[int, int, int] = (1, 1, 1),
    na_dilation: tuple[int, int, int] = (1, 1, 1),
    sparse_switch: Optional[jax.Array] = None,
) -> jax.Array:
    """Sequence-parallel self-attention. q,k,v: (B, S, H, D) global view,
    sharded over S on ``axis_name``. Must run inside jit with an ambient
    mesh (jax.set_mesh) that has ``axis_name``.

    With ``na_video_size`` set, the local attention after the head-scatter
    is the sparse neighborhood kernel on the full gathered sequence — the
    reference's ``NattenA2AAttnOp`` composition (a2a_cp.py:222-226).

    ``sparse_switch`` (scan_uniform under CP): a traced replicated boolean
    choosing the NA kernel vs dense attention per scanned block. Both
    branches consume the SAME gathered head-sharded sequence, so the two
    all-to-alls are hoisted OUTSIDE the ``lax.cond`` — the cond body is
    collective-free, which is what makes the uniformly-scanned interleave
    legal under context parallelism (the production sparse_2B recipe at
    cp=4; reference composition a2a_cp.py:222 +
    experiment/resume_text2world/sparse_2B.py:326).
    """
    if sparse_switch is not None and na_video_size is None:
        raise ValueError("sparse_switch requires na_video_size (the sparse branch's geometry)")

    def inner(q, k, v, *flag):
        # local views: (B, S/c, H, D)
        def scatter_heads(t):
            # S/c -> S, H -> H/c
            return jax.lax.all_to_all(t, axis_name, split_axis=2, concat_axis=1, tiled=True)

        def gather_heads(t):
            return jax.lax.all_to_all(t, axis_name, split_axis=1, concat_axis=2, tiled=True)

        ql, kl, vl = scatter_heads(q), scatter_heads(k), scatter_heads(v)
        if na_video_size is not None:
            from cosmos_predict2_tpu.ops.neighborhood_attention import (
                VideoSize,
                neighborhood_attention_auto,
            )

            # backend dispatch (Pallas / gathered XLA / dense reference)
            # lives in the op — off-TPU full-geometry runs must hit the
            # gathered executor, not 57 GB of dense logits per layer
            def _na_fn(q_, k_, v_):
                return neighborhood_attention_auto(
                    q_, k_, v_, VideoSize(*na_video_size), na_window, stride=na_stride, dilation=na_dilation
                )

            if sparse_switch is None:
                out = _na_fn(ql, kl, vl)
            else:
                def _dense_fn(q_, k_, v_):
                    return dot_product_attention(q_, k_, v_, backend=backend)

                out = jax.lax.cond(flag[0], _na_fn, _dense_fn, ql, kl, vl)
        else:
            out = dot_product_attention(ql, kl, vl, backend=backend, frame_group=frame_group)
        return gather_heads(out)

    spec = P(None, axis_name, None, None)
    if sparse_switch is None:
        return jax.shard_map(
            inner,
            in_specs=(spec, spec, spec),
            out_specs=spec,
            axis_names={axis_name},
        )(q, k, v)
    return jax.shard_map(
        inner,
        in_specs=(spec, spec, spec, P()),
        out_specs=spec,
        axis_names={axis_name},
    )(q, k, v, sparse_switch)


def ulysses_kv_cache_attention(
    q: jax.Array,
    k_new: jax.Array,
    v_new: jax.Array,
    kv_cache: dict,
    axis_name: str = "cp",
    cache_grid: tuple[int, int] | None = None,
    cache_window_rows: int = -1,
) -> tuple[jax.Array, dict]:
    """Sequence-parallel STREAMING decode (the interactive CausalDIT's
    KV-cache path under CP — the multi-chip route to real-time 720p,
    PERF.md "Interactive"; reference proxy: interactive/networks/
    ulysses.py DistributedAttention around the cached attention).

    Block q/k_new/v_new: (B, S_blk, H, D) global view, token-sharded over
    ``axis_name``. The ring buffers kv_cache["k"/"v"]: HEAD-MAJOR
    (B, H, S_max, D) global view, HEAD-sharded over ``axis_name`` — the
    (large) cache never crosses chips; only the small new block moves
    through two all-to-alls per step. kv_cache["len"] is a replicated
    scalar.

    ``cache_window_rows`` > 0 composes the sparse cache window
    (flash_attention_kv_cache_window) with the head sharding: after the
    head-scatter each chip holds the FULL block's queries for its local
    heads, so the row-banded window applies per shard unchanged —
    the two interactive levers (CP x GNA sparsity) stack.

    Returns (out token-sharded, new_cache head-sharded). Must run inside
    jit with an ambient mesh holding ``axis_name``.
    """
    mesh = jax.sharding.get_abstract_mesh()
    if axis_name not in mesh.shape:
        raise ValueError(
            f"ulysses_kv_cache_attention needs an ambient mesh with axis "
            f"{axis_name!r} (got {mesh}); run inside `with jax.set_mesh(...)`"
        )
    c = mesh.shape[axis_name]
    _, s_blk, n_heads, _ = q.shape
    if s_blk % c or n_heads % c:
        raise ValueError(
            f"block tokens ({s_blk}) and heads ({n_heads}) must both divide "
            f"the {axis_name}={c} degree for the all-to-alls"
        )

    def inner(q, k, v, k_buf, v_buf, ln):
        scatter = lambda t: jax.lax.all_to_all(t, axis_name, split_axis=2, concat_axis=1, tiled=True)
        gather = lambda t: jax.lax.all_to_all(t, axis_name, split_axis=1, concat_axis=2, tiled=True)
        ql, kl, vl = scatter(q), scatter(k), scatter(v)  # (B, S_blk, H/c, D)
        s_new = kl.shape[1]
        # head-major buffers: transpose only the small new block
        kh = kl.transpose(0, 2, 1, 3).astype(k_buf.dtype)
        vh = vl.transpose(0, 2, 1, 3).astype(v_buf.dtype)
        k_buf = jax.lax.dynamic_update_slice(k_buf, kh, (0, 0, ln[0], 0))
        v_buf = jax.lax.dynamic_update_slice(v_buf, vh, (0, 0, ln[0], 0))
        new_len = ln + s_new
        if cache_window_rows > 0:
            from cosmos_predict2_tpu.ops.flash_attention import flash_attention_kv_cache_window

            assert cache_grid is not None, "cache_window_rows needs cache_grid=(gh, gw)"
            out = flash_attention_kv_cache_window(
                ql, k_buf, v_buf, new_len[0], tuple(cache_grid), cache_window_rows
            )
        elif jax.default_backend() == "tpu":
            from cosmos_predict2_tpu.ops.flash_attention import flash_attention_kv_cache

            out = flash_attention_kv_cache(ql, k_buf, v_buf, new_len[0])
        else:
            from cosmos_predict2_tpu.ops.flash_attention import _kv_cache_reference

            out = _kv_cache_reference(ql, k_buf, v_buf, new_len[0])
        return gather(out), k_buf, v_buf, new_len

    tok = P(None, axis_name, None, None)
    head = P(None, axis_name, None, None)  # (B, H, S, D): heads on dim 1
    ln = jax.numpy.reshape(kv_cache["len"], (1,))
    out, k_buf, v_buf, new_len = jax.shard_map(
        inner,
        in_specs=(tok, tok, tok, head, head, P()),
        out_specs=(tok, head, head, P()),
        axis_names={axis_name},
    )(q, k_new, v_new, kv_cache["k"], kv_cache["v"], ln)
    return out, {"k": k_buf, "v": v_buf, "len": new_len[0]}
