"""Released-experiment catalog: every checkpoint-DB entry resolves.

The reference rebuilds the exact training config from the experiment name
recorded with each released checkpoint (predict2/utils/model_loader.py:
33-58; imaginaire/utils/checkpoint_db.py). These tests pin that contract:
``resolve_experiment``/``make_config`` round-trips for the entire DB, and
the flagship recipes carry the reference's key settings.
"""

import dataclasses

import pytest

from cosmos_predict2_tpu.configs.defaults import make_config
from cosmos_predict2_tpu.configs.registry import list_experiments, resolve_experiment
from cosmos_predict2_tpu.utils.checkpoint_db import find_by_experiment, list_checkpoints


def _db_experiments():
    return sorted({e.experiment for e in list_checkpoints() if e.experiment != "-"})


@pytest.mark.level(0)
def test_every_db_entry_resolves():
    missing = [n for n in _db_experiments() if n not in list_experiments()]
    assert not missing, f"checkpoint-DB experiments without a recipe: {missing}"


@pytest.mark.level(0)
@pytest.mark.parametrize("name", _db_experiments())
def test_db_experiment_builds_config(name):
    exp = resolve_experiment(name)
    assert exp is not None
    cfg = make_config(name)
    assert cfg.job.name == name
    # find_by_experiment round-trip: the DB entry that points at this
    # experiment must exist (the model-loader contract both ways)
    entry = find_by_experiment(name)
    assert entry is not None and entry.experiment == name


@pytest.mark.level(0)
def test_flagship_2b_recipe_snapshot():
    """Key fields of the 2.5-2B base recipe (reference
    model_2B_reason_1p1_rectified_flow.py:86-180,441-463)."""
    cfg = make_config(
        "Stage-c_pt_4-reason_embeddings-v1p1-Index-26-Size-2B-Res-720-Fps-16"
        "-Note-T2V_high_sigma_loss_reweighted_1_1_rectified_flow_only_resume2"
    )
    m = cfg.model
    assert m.net.model_channels == 2048 and m.net.num_heads == 16 and m.net.num_blocks == 28
    assert m.state_t == 24 and m.resolution == "720"
    assert m.loss_scale == 10.0
    assert m.use_high_sigma_strategy and m.high_sigma_ratio == 0.05
    assert m.conditional_frames_probs == ((0, 0.5), (1, 0.25), (2, 0.25))
    assert m.net.rope_h_extrapolation_ratio == 3.0
    assert m.net.use_crossattn_projection and m.net.crossattn_proj_in_channels == 100352
    assert cfg.trainer.optimizer.lr == 2 ** (-14.5)


@pytest.mark.level(0)
def test_14b_recipe_snapshot():
    cfg = make_config(
        "Stage-c_pt_4-reason_embeddings-v1p1-Index-43-Size-14B-Res-720-Fps-16"
        "_resume_from_reason1p1_rectified_flow_shift5_high_sigma"
    )
    assert cfg.model.net.model_channels == 5120
    assert cfg.model.net.num_blocks == 36
    assert cfg.model.use_high_sigma_strategy


@pytest.mark.level(0)
def test_sparse_resume_family():
    """sparse_2B.py:279-533 — n_dense 7/6/4 over the GNA production window."""
    for idx, nd in ((200, 7), (201, 6), (202, 4)):
        cfg = make_config(
            f"Stage-c_pt_4-Index-{idx}-Size-2B-Res-720-Fps-16"
            f"-Note-HQ_V3_from_22_sparse-attn_{nd}dense"
        )
        assert cfg.model.net.n_dense_blocks == nd
        assert cfg.model.net.natten_window == (-1, 12, 24)
        assert cfg.model.net.natten_stride == (1, 4, 8)


@pytest.mark.level(0)
def test_rf_with_edm_ckpt_recipe():
    """SFT_2B_RF.py:753-770 — pinned conditional-frame timestep + Karras sigmas."""
    cfg = make_config("Stage-c_pt_4-Index-2-Size-2B-Res-720-Fps-16-Note-rf_with_edm_ckpt")
    assert cfg.model.conditional_frame_timestep == 0.1
    assert cfg.model.use_karras_sigma_at_inference


@pytest.mark.level(0)
def test_lora_posttrain_recipe():
    """cosmos_nemo_assets_lora.py:48-123 — rank 32 / alpha 32 adapters."""
    cfg = make_config("predict2_lora_training_2b_cosmos_nemo_assets")
    assert cfg.model.use_lora
    assert cfg.model.lora_rank == 32 and cfg.model.lora_alpha == 32.0
    assert cfg.data_train.num_frames == 93
    assert cfg.trainer.save_iter == 200


@pytest.mark.level(0)
def test_multiview_buttercup_recipe():
    cfg = make_config(
        "buttercup_predict2p5_2b_7views_res720p_fps30_t8_joint_alpamayo1capviewprefix"
        "_allcapsviewprefix_29frames_nofps_uniform_dropoutt0"
    )
    assert cfg.model.net.n_views == 7
    assert cfg.model.state_t == 56
    assert not cfg.model.net.rope_enable_fps_modulation
    assert cfg.model.rectified_flow.train_time_distribution == "uniform"


@pytest.mark.level(0)
def test_interactive_recipes_are_causal():
    for name in (
        "cosmos_predict2p5_2B_action_conditioned_gr00t_gr1_customized_13frame_sf_warmup",
        "cosmos_predict2p5_2B_action_gr00t_gr1_warmup",
    ):
        cfg = make_config(name)
        assert cfg.model.net.temporal_causal
        assert cfg.model.net.action_dim == 84


@pytest.mark.level(1)
def test_lora_training_smoke():
    """The LoRA recipe actually trains end-to-end (2 iterations on mock
    data, tiny geometry) through train.launch's LoRA branch."""
    from cosmos_predict2_tpu.training import train as train_mod

    cfg = make_config(
        "predict2_lora_training_2b_cosmos_nemo_assets",
        [
            "data_train.num_frames=9",
            "data_train.height=32",
            "data_train.width=32",
            "data_train.text_len=8",
            "trainer.max_iter=2",
            "trainer.logging_iter=1",
            "trainer.save_iter=0",
        ],
    )
    # shrink net + tokenizer for CPU
    from cosmos_predict2_tpu.configs.registry import get_node

    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            net=get_node("net", "mini_net"),
            use_lora=True,
            lora_rank=2,
        ),
        tokenizer=get_node("tokenizer", "mock_tokenizer"),
    )
    state = train_mod.launch(cfg)
    assert state is not None
