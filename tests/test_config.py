"""Config system tests: groups, experiments, dotlist overrides, CLI parity."""

import dataclasses

import pytest

from cosmos_predict2_tpu.configs.defaults import Config, make_config
from cosmos_predict2_tpu.configs.registry import apply_override, compose, list_experiments


@pytest.mark.level(0)
def test_default_config():
    cfg = make_config()
    assert cfg.model.state_ch == 16
    assert cfg.trainer.optimizer.lr == pytest.approx(2 ** (-14.5))


@pytest.mark.level(0)
def test_experiment_composition():
    cfg = make_config("predict2_video2world_2b_rectified_flow")
    assert cfg.model.net.model_channels == 2048
    assert cfg.model.net.num_blocks == 28
    assert cfg.model.net.use_crossattn_projection
    assert cfg.model.net.crossattn_proj_in_channels == 100352
    assert not cfg.model.net.rope_enable_fps_modulation
    assert cfg.model.net.rope_h_extrapolation_ratio == 3.0
    assert cfg.model.state_t == 24
    assert cfg.job.name == "predict2_video2world_2b_rectified_flow"


@pytest.mark.level(0)
def test_experiment_inheritance():
    cfg = make_config("predict2_video2world_14b_rectified_flow")
    assert cfg.model.net.model_channels == 5120
    assert cfg.model.net.num_blocks == 36
    # inherited override from the 2B base
    assert cfg.model.net.use_crossattn_projection


@pytest.mark.level(0)
def test_dotlist_overrides_cli_style():
    cfg = make_config(
        "error-free_mock_data_smoke",
        overrides=["trainer.max_iter=7", "model.loss_scale=2.5", "job.group=test"],
    )
    assert cfg.trainer.max_iter == 7  # string coerced to int
    assert cfg.model.loss_scale == 2.5
    assert cfg.job.group == "test"


@pytest.mark.level(0)
def test_override_unknown_field_raises():
    with pytest.raises(AttributeError):
        make_config(overrides=["model.not_a_field=1"])


@pytest.mark.level(0)
def test_experiments_registered():
    names = list_experiments()
    assert "predict2_video2world_2b_rectified_flow" in names
    assert "error-free_mock_data_smoke" in names


@pytest.mark.level(1)
def test_train_cli_dryrun_and_smoke(tmp_path, monkeypatch):
    """Docs-as-tests style: run the actual CLI (reference tests/docs_test.py pattern)."""
    from cosmos_predict2_tpu.training import train

    assert train.main(["--experiment=error-free_mock_data_smoke", "--dryrun"]) == 0

    monkeypatch.setenv("COSMOS_SMOKE", "1")
    import importlib

    import cosmos_predict2_tpu.utils.flags as flags

    importlib.reload(flags)
    assert train.main(
        [
            "--experiment=error-free_mock_data_smoke",
            "data_train.num_frames=5",
            "data_train.height=32",
            "data_train.width=32",
        ]
    ) == 0


@pytest.mark.level(0)
def test_variant_experiments_resolve():
    from cosmos_predict2_tpu.configs.defaults import make_config

    cfg = make_config("predict2_video2world_2b_action_conditioned")
    assert cfg.model.net.action_dim == 84 and cfg.model.state_t == 4
    cfg = make_config("predict2_video2world_2b_camera_conditioned")
    assert cfg.model.net.camera_dim == 6
    cfg = make_config("predict2_multiview_2b_7views")
    assert cfg.model.net.n_views == 7 and cfg.model.state_t == 56
    cfg = make_config("predict2_interactive_2b_causal")
    assert cfg.model.net.temporal_causal
    # base fields inherit through the chain
    assert cfg.model.net.model_channels == 2048
    assert cfg.model.net.crossattn_proj_in_channels == 100352
