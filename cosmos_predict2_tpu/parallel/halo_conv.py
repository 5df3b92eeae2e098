"""Spatially-sharded convolution with explicit halo exchange.

First-class parity with the reference's VAE context-parallel plugins
(cosmos_predict2/_src/predict2/tokenizers/wan2pt1_2d_plugins.py:139-728:
_Conv3DSafeNewPlugin / _Conv2DSafeNewPlugin / stride-2 variant — ranks
send/recv boundary rows/cols to adjacent ranks over NCCL p2p before each
conv). Here the exchange is a ``jax.lax.ppermute`` of the boundary slab
inside ``shard_map`` — a neighbor copy on the ICI ring that XLA overlaps
with the conv — and the conv itself runs with VALID padding on the sharded
axis so every shard produces exactly its slice of the global output.

Two ways to spatially shard the VAE on TPU:
 * GSPMD: annotate the W axis with a mesh axis and let XLA partition the
   convs (inserts the same halo collectives automatically). Default path,
   tested exact in tests/test_vae_sharded.py.
 * This module: explicit shard_map scheduling, for when the compiler's
   choices need overriding (matches the reference's hand-written plugins).

Edge behavior: ``ppermute`` leaves devices with no incoming link at zero —
exactly the zero padding the global conv applies at the clip borders, so
edge shards need no special casing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _pvary(x, axis_name):
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, (axis_name,), to="varying")
    return x


def halo_exchange_w(x: jax.Array, left: int, right: int, axis_name: str, axis_size: int) -> jax.Array:
    """Concat ``left`` columns from the left neighbor and ``right`` from the
    right onto the local W axis (axis -2 of (..., W, C)). Edge shards get
    zeros — the global zero padding."""
    parts = []
    if left > 0:
        fwd = [(j, j + 1) for j in range(axis_size - 1)]  # my left neighbor -> me
        parts.append(jax.lax.ppermute(x[..., -left:, :], axis_name, fwd))
    parts.append(x)
    if right > 0:
        bwd = [(j + 1, j) for j in range(axis_size - 1)]  # my right neighbor -> me
        parts.append(jax.lax.ppermute(x[..., :right, :], axis_name, bwd))
    return jnp.concatenate(parts, axis=-2) if len(parts) > 1 else x


def conv_w_sharded(
    x: jax.Array,
    kernel: jax.Array,
    stride_w: int = 1,
    pad_w: tuple[int, int] = (1, 1),
    other_strides: tuple[int, ...] = (),
    other_pads: tuple[tuple[int, int], ...] = (),
    axis_name: str = "cp",
) -> jax.Array:
    """Convolution with the W axis (second-to-last) sharded on ``axis_name``.

    x: (B, *spatial, W, C) channels-last global view, W sharded.
    kernel: (*spatial_k, kw, C_in, C_out) (flax HWIO-style).
    pad_w = (lo, hi): the *global* W padding of the equivalent unsharded
    conv. Requires hi == max(0, kw - stride_w - lo) (true for the VAE's
    SAME stride-1 and (0,1)-padded stride-2 convs) and the local W divisible
    by stride_w.
    """
    lo, hi = pad_w
    kw = kernel.shape[-3]
    need_right = max(0, kw - stride_w - lo)
    if hi != need_right:
        raise ValueError(f"pad_w hi={hi} must equal kw-stride-lo={need_right} for halo sharding")

    mesh = jax.sharding.get_abstract_mesh()
    axis_size = dict(zip(mesh.axis_names, mesh.axis_sizes))[axis_name]
    n_spatial = x.ndim - 2  # dims between B and C (includes W)

    def inner(xl, k):
        k = _pvary(k, axis_name)
        h = halo_exchange_w(xl, lo, need_right, axis_name, axis_size)
        dn = jax.lax.conv_dimension_numbers(
            h.shape, k.shape,
            ("N" + "".join("DHW"[3 - n_spatial + i] for i in range(n_spatial)) + "C",
             "".join("DHW"[3 - n_spatial + i] for i in range(n_spatial)) + "IO",
             "N" + "".join("DHW"[3 - n_spatial + i] for i in range(n_spatial)) + "C"),
        )
        strides = tuple(other_strides) + (stride_w,)
        pads = tuple(other_pads) + ((0, 0),)  # W halo already materialized
        return jax.lax.conv_general_dilated(h, k, strides, pads, dimension_numbers=dn)

    spec = P(*([None] * (x.ndim - 2)), axis_name, None)
    return jax.shard_map(
        inner,
        in_specs=(spec, P()),
        out_specs=spec,
        axis_names={axis_name},
    )(x, kernel)


def conv3d_w_sharded(
    x: jax.Array,
    kernel: jax.Array,
    strides: tuple[int, int, int] = (1, 1, 1),
    pads: tuple[tuple[int, int], ...] = ((1, 1), (1, 1), (1, 1)),
    axis_name: str = "cp",
) -> jax.Array:
    """3D conv (B, T, H, W, C) with W sharded; pads = ((t), (h), (w)) global."""
    return conv_w_sharded(
        x, kernel, stride_w=strides[2], pad_w=pads[2],
        other_strides=strides[:2], other_pads=pads[:2], axis_name=axis_name,
    )
