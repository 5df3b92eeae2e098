"""Default config groups + released experiment recipes.

Parity with the reference registry (predict2/configs/video2world/config.py
:37-103 and defaults/{net,model,conditioner}.py, configs/common/defaults/*):
net 2B/14B/mini presets, the rectified-flow video2world model group, the
fusedadamw optimizer group, wan2pt1 tokenizer, and the flagship 2B
experiment (buttercup reason-embeddings v1p1 rectified flow,
experiment/reason_embeddings/model_2B_reason_1p1_rectified_flow.py:86-140).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from cosmos_predict2_tpu.configs.registry import (
    Experiment,
    compose,
    get_node,
    register,
    register_experiment,
    resolve_experiment,
)
from cosmos_predict2_tpu.data.mock import MockDataConfig
from cosmos_predict2_tpu.models.video2world import RFModelConfig
from cosmos_predict2_tpu.networks.dit import DiTConfig
from cosmos_predict2_tpu.schedulers.rectified_flow import RectifiedFlowConfig
from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAEConfig
from cosmos_predict2_tpu.training.optim import OptimizerConfig
from cosmos_predict2_tpu.training.trainer import TrainerConfig


@dataclasses.dataclass(frozen=True)
class JobConfig:
    project: str = "cosmos_predict2_tpu"
    group: str = "debug"
    name: str = "default"
    output_root: str = "outputs"


@dataclasses.dataclass(frozen=True)
class Config:
    """Top-level config tree (reference imaginaire/config.py:397)."""

    job: JobConfig = JobConfig()
    trainer: TrainerConfig = TrainerConfig()
    model: RFModelConfig = RFModelConfig()
    tokenizer: WanVAEConfig = WanVAEConfig()
    data_train: MockDataConfig = MockDataConfig()
    # mesh axis sizes (dp inferred from remaining devices)
    fsdp_shard_size: int = 1
    cp_size: int = 1
    tp_size: int = 1
    # interface parity with the reference's pipeline_model_parallel_size
    # plumbing (imaginaire/trainer.py:86, parallel_dims.py:25-138): no
    # pipeline schedule exists there or here — parallel/mesh.py::make_mesh
    # validates this == 1 and raises otherwise
    pp_size: int = 1


# ------------------------------- groups -------------------------------

_NET_2B = DiTConfig(
    model_channels=2048,
    num_heads=16,
    num_blocks=28,
    use_adaln_lora=True,
    adaln_lora_dim=256,
)
_NET_14B = dataclasses.replace(_NET_2B, model_channels=5120, num_heads=40, num_blocks=36)
_NET_MINI = dataclasses.replace(_NET_2B, model_channels=1024, num_heads=8, num_blocks=2)

register("net", "cosmos_v1_2B", _NET_2B)
register("net", "cosmos_v1_14B", _NET_14B)
register("net", "mini_net", _NET_MINI)

register(
    "model",
    "fsdp_rectified_flow",
    RFModelConfig(
        net=_NET_2B,
        rectified_flow=RectifiedFlowConfig(shift=5.0, train_time_distribution="logitnormal"),
        state_t=24,
        resolution="720",
        loss_scale=10.0,
        min_num_conditional_frames=0,
        max_num_conditional_frames=2,
        conditional_frames_probs=((0, 0.5), (1, 0.25), (2, 0.25)),
    ),
)

register("optimizer", "fusedadamw", OptimizerConfig(lr=2 ** (-14.5), weight_decay=0.001))
register("tokenizer", "wan2pt1_tokenizer", WanVAEConfig())
# tiny tokenizer for smoke/mock runs (full-size VAE compiles are expensive
# on small hosts and irrelevant for plumbing checks)
register("tokenizer", "mock_tokenizer", dataclasses.replace(WanVAEConfig(), dim=16))
register("data_train", "mock", MockDataConfig())

from cosmos_predict2_tpu.data.local_dataset import LocalVideoDatasetConfig  # noqa: E402

# post-training on a local folder of clips (docs/post_training.md layout:
# videos/ metas/ t5_xxl/; reference cosmos_predict2/experiments data recipes)
register("data_train", "local_video", LocalVideoDatasetConfig())


# ----------------------------- experiments -----------------------------

register_experiment(
    Experiment(
        name="predict2_video2world_2b_rectified_flow",
        groups={"net": "cosmos_v1_2B", "model": "fsdp_rectified_flow", "optimizer": "fusedadamw"},
        overrides={
            "model.net.rope_h_extrapolation_ratio": 3.0,
            "model.net.rope_w_extrapolation_ratio": 3.0,
            "model.net.rope_t_extrapolation_ratio": 1.0,
            "model.net.rope_enable_fps_modulation": False,
            "model.net.use_crossattn_projection": True,
            "model.net.crossattn_proj_in_channels": 100352,
            "model.net.crossattn_emb_channels": 1024,
            "trainer.optimizer.lr": 2 ** (-14.5),
            "trainer.optimizer.f_max": (0.5,),
            "trainer.optimizer.f_min": (0.2,),
            "trainer.optimizer.warm_up_steps": (2000,),
            "trainer.optimizer.cycle_lengths": (100000,),
        },
    )
)

register_experiment(
    Experiment(
        name="predict2_video2world_14b_rectified_flow",
        base="predict2_video2world_2b_rectified_flow",
        groups={"net": "cosmos_v1_14B"},
    )
)

register_experiment(
    Experiment(
        name="predict2_video2world_2b_sparse",
        base="predict2_video2world_2b_rectified_flow",
        overrides={
            # GNA sparse-attention interleave, production tuning
            # (reference configs/.../resume_text2world/sparse_2B.py:326-327:
            # n_dense_blocks=7, window (-1,12,24), stride (1,4,8),
            # base_size (-1,44,80))
            "model.net.n_dense_blocks": 7,
            "model.net.natten_window": (-1, 12, 24),
            "model.net.natten_stride": (1, 4, 8),
            "model.net.natten_base_size": (-1, 44, 80),
        },
    )
)

register_experiment(
    Experiment(
        name="predict2_video2world_14b_sparse",
        base="predict2_video2world_14b_rectified_flow",
        overrides={
            # reference sparse_14B.py:226-227 (n_dense_blocks=9)
            "model.net.n_dense_blocks": 9,
            "model.net.natten_window": (-1, 12, 24),
            "model.net.natten_stride": (1, 4, 8),
            "model.net.natten_base_size": (-1, 44, 80),
        },
    )
)

# per-layer GNA parameter list for the all-sparse 14B release
# (reference sparse_14B.py:68-105, NATTEN_PARAMETERS_14B_COMB02): layers
# 0-10 dilated full-sub-grid windows, 11-12 mixed stride/dilation, 13+
# strided windows of growing size, layer 27 dense. Entries are
# (window, stride, dilation, base_size) or None (dense).
_B = (-1, 44, 80)


def _comb02_layer(i: int):
    if i <= 10:
        return ((-1, 4, 16), (1, 1, 1), (1, 11, 5), _B)
    if i <= 12:
        return ((-1, 12, 16), (1, 4, 1), (1, 1, 5), _B)
    if i == 27:
        return None
    big = {24, 26, 28, 31, 32, 34}  # window (-1, 28, 56) layers
    mid = {23, 25, 29, 30, 33, 35}  # window (-1, 20, 40) layers
    if i in big:
        return ((-1, 28, 56), (1, 4, 8), (1, 1, 1), _B)
    if i in mid:
        return ((-1, 20, 40), (1, 4, 8), (1, 1, 1), _B)
    return ((-1, 12, 24), (1, 4, 8), (1, 1, 1), _B)


register_experiment(
    Experiment(
        name="predict2_video2world_14b_sparse_comb02",
        base="predict2_video2world_14b_rectified_flow",
        overrides={
            "model.net.natten_parameters": tuple(_comb02_layer(i) for i in range(36)),
        },
    )
)

register_experiment(
    Experiment(
        name="predict2_video2world_2b_action_conditioned",
        base="predict2_video2world_2b_rectified_flow",
        overrides={
            # robot action vectors enter the t-embedding + AdaLN-LoRA
            # (reference action/networks/action_conditioned_minimal_v1_lvg_dit.py:47-112)
            "model.net.action_dim": 7 * 12,
            "model.net.concat_condition_mask": True,
            "model.state_t": 4,
        },
    )
)

register_experiment(
    Experiment(
        name="predict2_video2world_2b_camera_conditioned",
        base="predict2_video2world_2b_rectified_flow",
        overrides={
            # per-block cam_encoder on Plücker-ray maps
            # (reference camera/networks/minimal_v4_dit_camera_conditioned.py:1189)
            "model.net.camera_dim": 6,
        },
    )
)

register_experiment(
    Experiment(
        name="predict2_multiview_2b_7views",
        base="predict2_video2world_2b_rectified_flow",
        overrides={
            # 7-camera packing with per-view RoPE + view embeddings
            # (reference predict2_multiview configs, buttercup experiments)
            "model.net.n_views": 7,
            "model.net.concat_view_embedding": True,
            "model.net.view_condition_dim": 6,
            "model.net.concat_condition_mask": True,
            "model.state_t": 56,  # 8 latent frames x 7 views
        },
    )
)

register_experiment(
    Experiment(
        name="predict2_interactive_2b_causal",
        base="predict2_video2world_2b_rectified_flow",
        overrides={
            # temporal block-causal attention for KV-cache streaming
            # (reference interactive/networks/dit_causal.py:569)
            "model.net.temporal_causal": True,
            "model.net.num_frame_per_block": 1,
        },
    )
)

register_experiment(
    Experiment(
        name="error-free_mock_data_smoke",
        groups={
            "net": "mini_net",
            "model": "fsdp_rectified_flow",
            "optimizer": "fusedadamw",
            "tokenizer": "mock_tokenizer",
        },
        overrides={
            "model.state_t": 4,
            "trainer.max_iter": 3,
            "trainer.logging_iter": 1,
            "data_train.num_frames": 13,
            "data_train.height": 64,
            "data_train.width": 64,
        },
    )
)


# released-checkpoint experiment names (imported last, mirroring the
# reference's "experiments imported last so experiment=<name> resolves"
# pattern, predict2/configs/video2world/config.py:97-103)
import cosmos_predict2_tpu.configs.released_experiments  # noqa: E402,F401


def make_config(experiment: str | None = None, overrides: list[str] | None = None) -> Config:
    """Compose the full config: defaults -> experiment -> dotlist overrides."""
    cfg = Config()
    if experiment is not None:
        exp = resolve_experiment(experiment)
        replacements: dict[str, Any] = {}
        if "model" in exp.groups:
            model = get_node("model", exp.groups["model"])
            if "net" in exp.groups:
                model = dataclasses.replace(model, net=get_node("net", exp.groups["net"]))
            replacements["model"] = model
        if "optimizer" in exp.groups:
            replacements["trainer"] = dataclasses.replace(
                cfg.trainer, optimizer=get_node("optimizer", exp.groups["optimizer"])
            )
        if "tokenizer" in exp.groups:
            replacements["tokenizer"] = get_node("tokenizer", exp.groups["tokenizer"])
        if "data_train" in exp.groups:
            replacements["data_train"] = get_node("data_train", exp.groups["data_train"])
        cfg = dataclasses.replace(cfg, **replacements)
        cfg = compose(cfg, exp.overrides)
        cfg = dataclasses.replace(cfg, job=dataclasses.replace(cfg.job, name=experiment))
    # dot-free "group=name" tokens select registry nodes (Hydra-style group
    # override grammar, e.g. "data_train=local_video tokenizer=mock_tokenizer")
    field_overrides = []
    for o in overrides or []:
        key, _, value = o.partition("=")
        if "." not in key and key in ("net", "model", "optimizer", "tokenizer", "data_train"):
            if key == "net":
                cfg = dataclasses.replace(
                    cfg, model=dataclasses.replace(cfg.model, net=get_node("net", value))
                )
            elif key == "optimizer":
                cfg = dataclasses.replace(
                    cfg, trainer=dataclasses.replace(cfg.trainer, optimizer=get_node("optimizer", value))
                )
            elif key == "model":
                cfg = dataclasses.replace(cfg, model=get_node("model", value))
            else:
                cfg = dataclasses.replace(cfg, **{key: get_node(key, value)})
        else:
            field_overrides.append(o)
    cfg = compose(cfg, field_overrides)
    return cfg
