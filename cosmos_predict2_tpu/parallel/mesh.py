"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's process-group zoo (megatron
``parallel_state`` + torch DeviceMesh + FSDP2 wrappers + NCCL CP groups,
see SURVEY.md §2.9): one ``jax.sharding.Mesh`` with axes

    (dp, fsdp, cp, tp)

* dp    — pure data parallel (replicated params)
* fsdp  — data parallel with sharded params/optimizer (ZeRO-3): params are
          sharded over this axis; XLA all-gathers them on use and
          reduce-scatters gradients, same comm pattern as FSDP2.
* cp    — context parallel over video tokens (latent T); attention runs
          Ulysses all-to-all inside shard_map (parallel/cp.py).
* tp    — tensor parallel (attention heads / mlp hidden).

Batch is sharded over (dp, fsdp); sequence over cp; weights over fsdp
(+ tp). `jax.sharding.use_mesh(mesh)` is expected around jitted calls so
nested shard_map collectives can find the mesh.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS_DP = "dp"
AXIS_FSDP = "fsdp"
AXIS_CP = "cp"
AXIS_TP = "tp"
MESH_AXES = (AXIS_DP, AXIS_FSDP, AXIS_CP, AXIS_TP)


def make_mesh(
    dp: int = 1,
    fsdp: int = 1,
    cp: int = 1,
    tp: int = 1,
    devices: Optional[list] = None,
    pp: int = 1,
) -> Mesh:
    """Build the (dp, fsdp, cp, tp) device mesh.

    ``pp`` is interface parity with the reference's
    ``pipeline_model_parallel_size`` plumbing (imaginaire/trainer.py:86,
    reason1/parallelisms/parallel_dims.py:25-138): the reference threads
    the knob but implements no pipeline schedule for any model, and
    neither do we — the mesh has no pp axis. Validated == 1 so a config
    that asks for pipeline parallelism fails loudly at mesh build, exactly
    where ParallelDims.__post_init__ validates it there.
    """
    if pp != 1:
        raise ValueError(
            f"pipeline_model_parallel_size={pp} requested, but no pipeline "
            "schedule exists (parity: the reference also only threads the "
            "knob); use fsdp/cp/tp axes instead"
        )
    devices = devices if devices is not None else jax.devices()
    total = dp * fsdp * cp * tp
    if total != len(devices):
        raise ValueError(f"mesh {dp}x{fsdp}x{cp}x{tp}={total} != {len(devices)} devices")
    dev_array = np.asarray(devices).reshape(dp, fsdp, cp, tp)
    return Mesh(dev_array, MESH_AXES)


def single_device_mesh() -> Mesh:
    return make_mesh(1, 1, 1, 1, devices=jax.devices()[:1])


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim over (dp, fsdp); replicated elsewhere."""
    return NamedSharding(mesh, P((AXIS_DP, AXIS_FSDP)))


def latent_sharding(mesh: Mesh) -> NamedSharding:
    """(B, C, T, H, W) latents: batch over (dp, fsdp), T over cp."""
    return NamedSharding(mesh, P((AXIS_DP, AXIS_FSDP), None, AXIS_CP))


def param_sharding_rules(path: tuple, leaf) -> P:
    """FSDP(+TP) sharding for transformer parameters by name.

    Covers the DiT (q_proj/…/output_proj, mlp layer1/layer2), the Wan DiT
    (q/k/v/o, ffn_0/ffn_2) and the Qwen text encoder (q/k/v/o_proj,
    gate/up/down_proj — the reference's ColwiseParallel/RowwiseParallel
    plan, reason1/parallelisms/parallelize_qwen.py:114-238). Every >=1D
    param is sharded over fsdp on its largest dim; attention and MLP
    kernels are additionally tensor-parallel over tp:
      qkv kernels (in, heads*dim): out dim over tp (column parallel)
      attention out kernel (heads*dim, out): in dim over tp (row parallel)
      mlp in kernels (d, ff): out over tp;  mlp out (ff, d): in over tp
    """
    names = [getattr(p, "key", str(p)) for p in path]
    joined = "/" + "/".join(names) + "/"
    ndim = getattr(leaf, "ndim", 0)
    if ndim < 1:
        return P()
    if ndim == 1:
        # biases / norm weights: replicate (cheap)
        return P()
    # 2D kernels
    col_keys = ("q_proj", "k_proj", "v_proj", "layer1", "gate_proj", "up_proj", "ffn_0", "/q/", "/k/", "/v/", "/k_img/", "/v_img/")
    row_keys = ("output_proj", "layer2", "o_proj", "down_proj", "ffn_2", "/o/")
    tp_axis = None
    if any(k in joined for k in col_keys):
        tp_axis = 1  # column parallel
    elif any(k in joined for k in row_keys):
        tp_axis = 0  # row parallel
    shape = leaf.shape
    # fsdp: shard the largest remaining dim
    if tp_axis is None:
        fsdp_axis = int(np.argmax(shape))
        spec = [None] * ndim
        spec[fsdp_axis] = AXIS_FSDP
        return P(*spec)
    fsdp_axis = 1 - tp_axis
    spec = [None] * ndim
    spec[tp_axis] = AXIS_TP
    spec[fsdp_axis] = AXIS_FSDP
    return P(*spec)


def shard_params(params, mesh: Mesh):
    """Apply param_sharding_rules across a param pytree."""

    def to_sharded(path, leaf):
        spec = param_sharding_rules(path, leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(to_sharded, params)


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree (for jit in_shardings/out_shardings)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, param_sharding_rules(path, leaf)), params
    )


def divisible_cp(state_t: int, mesh: Mesh) -> bool:
    return state_t % mesh.shape[AXIS_CP] == 0
