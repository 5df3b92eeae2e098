"""JAX -> torch-layout checkpoint export (inverse of checkpoint_convert).

Two jobs:

1. Export trained JAX params back into the reference's consolidated torch
   state-dict layout (counterpart of the reference's
   scripts/convert_distcp_to_pt.py direction), so weights trained here are
   loadable by the CUDA reference.
2. Manufacture *synthetic* torch checkpoints at the TRUE released tensor
   shapes (from nothing but a flax shape template) for offline round-trip
   tests and for the released-weights verifier's self-test — the converter
   contract is pinned end-to-end without network access.

Each ``export_*`` function is the exact inverse of the corresponding
``convert_*`` in checkpoint_convert.py; a round-trip
``convert(export(params)) == params`` test runs at the real 2B/VAE shapes.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

Array = Any


def _t(w: Array) -> Array:  # flax kernel (in, out) -> torch Linear (out, in)
    return np.ascontiguousarray(np.transpose(np.asarray(w)))


def _conv3d(w: Array) -> Array:  # DHWIO -> OIDHW
    return np.ascontiguousarray(np.transpose(np.asarray(w), (4, 3, 0, 1, 2)))


def _conv2d(w: Array) -> Array:  # HWIO -> OIHW
    return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))


def _unwrap(params: Mapping) -> Mapping:
    return params["params"] if "params" in params else params


# ------------------------------- DiT -------------------------------


def _lin(sd: dict, node: Mapping, torch_name: str) -> None:
    sd[f"{torch_name}.weight"] = _t(node["kernel"])
    if "bias" in node:
        sd[f"{torch_name}.bias"] = np.asarray(node["bias"])


def export_dit_state_dict(params: Mapping, prefix: str = "") -> dict[str, Array]:
    """Inverse of checkpoint_convert.convert_dit_state_dict. ``prefix`` is
    prepended to every key (e.g. ``net_ema.`` for the consolidated form)."""
    p = _unwrap(params)
    sd: dict[str, Array] = {}
    _lin(sd, p["x_embedder"], "x_embedder.proj.1")
    _lin(sd, p["t_embedder"]["linear_1"], "t_embedder.1.linear_1")
    _lin(sd, p["t_embedder"]["linear_2"], "t_embedder.1.linear_2")
    sd["t_embedding_norm.weight"] = np.asarray(p["t_embedding_norm"]["weight"])
    if "crossattn_proj" in p:
        _lin(sd, p["crossattn_proj"], "crossattn_proj.0")
    for name in ("action_embedder_B_D", "action_embedder_B_3D"):
        if name in p:
            _lin(sd, p[name]["fc1"], f"{name}.fc1")
            _lin(sd, p[name]["fc2"], f"{name}.fc2")
    if "view_embeddings" in p:
        sd["view_embeddings.weight"] = np.asarray(p["view_embeddings"])
    if "extra_pos_embedder" in p:
        for k in ("pos_emb_h", "pos_emb_w", "pos_emb_t"):
            sd[f"extra_pos_embedder.{k}"] = np.asarray(p["extra_pos_embedder"][k])

    num_blocks = sum(1 for k in p if k.startswith("blocks_") and not k.startswith("blocks_scan"))
    for i in range(num_blocks):
        b = p[f"blocks_{i}"]
        for attn in ("self_attn", "cross_attn"):
            a = b[attn]
            for proj in ("q_proj", "k_proj", "v_proj", "output_proj"):
                sd[f"blocks.{i}.{attn}.{proj}.weight"] = _t(a[proj]["kernel"])
            sd[f"blocks.{i}.{attn}.q_norm.weight"] = np.asarray(a["q_norm"]["weight"])
            sd[f"blocks.{i}.{attn}.k_norm.weight"] = np.asarray(a["k_norm"]["weight"])
        sd[f"blocks.{i}.mlp.layer1.weight"] = _t(b["mlp"]["layer1"]["kernel"])
        sd[f"blocks.{i}.mlp.layer2.weight"] = _t(b["mlp"]["layer2"]["kernel"])
        if "cam_encoder" in b:
            sd[f"blocks.{i}.cam_encoder.weight"] = _t(b["cam_encoder"]["kernel"])
        for mod in ("adaln_modulation_self_attn", "adaln_modulation_cross_attn", "adaln_modulation_mlp"):
            sd[f"blocks.{i}.{mod}.1.weight"] = _t(b[mod]["linear_1"]["kernel"])
            if "linear_2" in b[mod]:
                sd[f"blocks.{i}.{mod}.2.weight"] = _t(b[mod]["linear_2"]["kernel"])

    fl = p["final_layer"]
    sd["final_layer.linear.weight"] = _t(fl["linear"]["kernel"])
    sd["final_layer.adaln_modulation.1.weight"] = _t(fl["adaln_modulation"]["linear_1"]["kernel"])
    if "linear_2" in fl["adaln_modulation"]:
        sd["final_layer.adaln_modulation.2.weight"] = _t(fl["adaln_modulation"]["linear_2"]["kernel"])
    if prefix:
        sd = {prefix + k: v for k, v in sd.items()}
    return sd


# ------------------------------- VAE -------------------------------


def _res(sd: dict, node: Mapping, prefix: str) -> None:
    sd[f"{prefix}.residual.0.gamma"] = np.asarray(node["norm1"]["gamma"])
    sd[f"{prefix}.residual.2.weight"] = _conv3d(node["conv1"]["weight"])
    sd[f"{prefix}.residual.2.bias"] = np.asarray(node["conv1"]["bias"])
    sd[f"{prefix}.residual.3.gamma"] = np.asarray(node["norm2"]["gamma"])
    sd[f"{prefix}.residual.6.weight"] = _conv3d(node["conv2"]["weight"])
    sd[f"{prefix}.residual.6.bias"] = np.asarray(node["conv2"]["bias"])
    if "shortcut" in node:
        sd[f"{prefix}.shortcut.weight"] = _conv3d(node["shortcut"]["weight"])
        sd[f"{prefix}.shortcut.bias"] = np.asarray(node["shortcut"]["bias"])


def _attn(sd: dict, node: Mapping, prefix: str) -> None:
    sd[f"{prefix}.norm.gamma"] = np.asarray(node["norm"]["gamma"])
    sd[f"{prefix}.to_qkv.weight"] = _conv2d(node["to_qkv"]["weight"])
    sd[f"{prefix}.to_qkv.bias"] = np.asarray(node["to_qkv"]["bias"])
    sd[f"{prefix}.proj.weight"] = _conv2d(node["proj"]["weight"])
    sd[f"{prefix}.proj.bias"] = np.asarray(node["proj"]["bias"])


def _resample(sd: dict, node: Mapping, prefix: str) -> None:
    sd[f"{prefix}.resample.1.weight"] = _conv2d(node["conv"]["weight"])
    sd[f"{prefix}.resample.1.bias"] = np.asarray(node["conv"]["bias"])
    if "time_conv" in node:
        sd[f"{prefix}.time_conv.weight"] = _conv3d(node["time_conv"]["weight"])
        sd[f"{prefix}.time_conv.bias"] = np.asarray(node["time_conv"]["bias"])


def _cc(sd: dict, node: Mapping, prefix: str) -> None:
    sd[f"{prefix}.weight"] = _conv3d(node["weight"])
    sd[f"{prefix}.bias"] = np.asarray(node["bias"])


def export_vae_state_dict(
    params: Mapping, num_res_blocks: int = 2, num_stages: int = 4
) -> dict[str, Array]:
    """Inverse of checkpoint_convert.convert_vae_state_dict."""
    p = _unwrap(params)
    sd: dict[str, Array] = {}

    enc = p["encoder"]
    _cc(sd, enc["conv1"], "encoder.conv1")
    li = 0
    for stage in range(num_stages):
        for _ in range(num_res_blocks):
            _res(sd, enc[f"down_{li}"], f"encoder.downsamples.{li}")
            li += 1
        if stage != num_stages - 1:
            _resample(sd, enc[f"down_{li}"], f"encoder.downsamples.{li}")
            li += 1
    _res(sd, enc["mid_res1"], "encoder.middle.0")
    _attn(sd, enc["mid_attn"], "encoder.middle.1")
    _res(sd, enc["mid_res2"], "encoder.middle.2")
    sd["encoder.head.0.gamma"] = np.asarray(enc["head_norm"]["gamma"])
    _cc(sd, enc["head_conv"], "encoder.head.2")

    dec = p["decoder"]
    _cc(sd, dec["conv1"], "decoder.conv1")
    _res(sd, dec["mid_res1"], "decoder.middle.0")
    _attn(sd, dec["mid_attn"], "decoder.middle.1")
    _res(sd, dec["mid_res2"], "decoder.middle.2")
    li = 0
    for stage in range(num_stages):
        for _ in range(num_res_blocks + 1):
            _res(sd, dec[f"up_{li}"], f"decoder.upsamples.{li}")
            li += 1
        if stage != num_stages - 1:
            _resample(sd, dec[f"up_{li}"], f"decoder.upsamples.{li}")
            li += 1
    sd["decoder.head.0.gamma"] = np.asarray(dec["head_norm"]["gamma"])
    _cc(sd, dec["head_conv"], "decoder.head.2")

    _cc(sd, p["conv1"], "conv1")
    _cc(sd, p["conv2"], "conv2")
    return sd


# --------------------------- file writing ---------------------------


def save_torch_state_dict(sd: Mapping[str, Array], path: str) -> None:
    """Write a torch-loadable .pt (weights_only-compatible)."""
    import torch

    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, path)


# ------------------- synthetic full-shape checkpoints -------------------


def patterned_like(tree: Any, salt: int = 0) -> Any:
    """Fill a shape template (ShapeDtypeStruct / array tree) with cheap
    deterministic values that vary along every axis — catches transpose and
    axis-order bugs without generating gigabytes of randoms."""
    import jax

    leaves, treedef = jax.tree_util.tree_flatten(tree)

    def fill(i: int, leaf: Any) -> np.ndarray:
        shape = tuple(leaf.shape)
        out = np.zeros(shape, dtype=np.float32)
        # add a distinct low-cost ramp along each axis (broadcast, O(n))
        for ax, n in enumerate(shape):
            ramp = ((np.arange(n, dtype=np.float32) % 251) - 125.0) / 251.0
            out += ramp.reshape((n,) + (1,) * (len(shape) - ax - 1)) * (0.5 ** ax)
        return out + ((i * 131 + salt) % 997 - 498) / 997.0

    return jax.tree_util.tree_unflatten(treedef, [fill(i, l) for i, l in enumerate(leaves)])
