"""Released-checkpoint experiment catalog.

Every checkpoint in the release DB (utils/checkpoint_db.py) records the
experiment that produced it; the reference rebuilds the exact training
config from that name at inference time (predict2/utils/model_loader.py:
33-58).  This module registers each released experiment name — the long
"Stage-c_pt_4-..." / "buttercup_..." identifiers — as a recipe over the
local config groups, so ``resolve_experiment``/``make_config`` round-trips
for the entire DB, plus the reference's OSS post-training recipes
(cosmos_predict2/experiments/), the sparse-resume family
(configs/video2world/experiment/resume_text2world/sparse_2B.py) and the
DMD2 TrigFlow distillation runs
(distill/configs/experiment/experiments_dmd2_trigflow.py).

Where the reference ships a real config for the name, the recipe mirrors
its deltas (cited per entry).  A few DB entries are registry-only in the
reference too (the Transfer2.5 control branches live in the cosmos-transfer
repo; the interactive gr00t runs ship weights without configs) — those are
registered from their variant metadata so the model-loader contract holds
here even where the reference's own registry cannot resolve them.
"""

from __future__ import annotations

from cosmos_predict2_tpu.configs.registry import Experiment, register_experiment

# ---------------------------------------------------------------------------
# 2B base family (reference configs/video2world/experiment/reason_embeddings/
# model_2B_reason_1p1_rectified_flow.py:86-460)
# ---------------------------------------------------------------------------

# Index-26 RF-only pretrain: the recipe behind both 2.5-2B base releases.
# Deltas vs the plain 2B RF recipe (ref :86-180): high-sigma strategy on
# (LOGUNIFORM200_100000, ratio 0.05), loss reweighting, state_t 24, 720p.
_HIGH_SIGMA = {
    "model.use_high_sigma_strategy": True,
    "model.high_sigma_ratio": 0.05,
}

register_experiment(
    Experiment(
        name=(
            "Stage-c_pt_4-reason_embeddings-v1p1-Index-26-Size-2B-Res-720-Fps-16"
            "-Note-T2V_high_sigma_loss_reweighted_1_1_rectified_flow_only"
        ),
        base="predict2_video2world_2b_rectified_flow",
        overrides=dict(_HIGH_SIGMA),
    )
)

# resume2 of the same run (ref :441-463): identical architecture/recipe,
# resumed from iter 37k — produced nvidia/Cosmos-Predict2.5-2B/base/pre-trained.
register_experiment(
    Experiment(
        name=(
            "Stage-c_pt_4-reason_embeddings-v1p1-Index-26-Size-2B-Res-720-Fps-16"
            "-Note-T2V_high_sigma_loss_reweighted_1_1_rectified_flow_only_resume2"
        ),
        base=(
            "Stage-c_pt_4-reason_embeddings-v1p1-Index-26-Size-2B-Res-720-Fps-16"
            "-Note-T2V_high_sigma_loss_reweighted_1_1_rectified_flow_only"
        ),
    )
)

# RF inference over an EDM-trained checkpoint (reference
# specialized_model/SFT_2B_RF.py:753-770): pins the conditional-frame
# timestep and switches sampling to the Karras sigma schedule.
register_experiment(
    Experiment(
        name="Stage-c_pt_4-Index-2-Size-2B-Res-720-Fps-16-Note-rf_with_edm_ckpt",
        base="predict2_video2world_2b_rectified_flow",
        overrides={
            "model.conditional_frame_timestep": 0.1,
            "model.use_karras_sigma_at_inference": True,
        },
    )
)

# ---------------------------------------------------------------------------
# 14B base (reference reason_embeddings/model_14b_reason_1p1_rectified_flow.py
# :495-509: resume of the shift-5 RF run with the high-sigma strategy on)
# ---------------------------------------------------------------------------

register_experiment(
    Experiment(
        name=(
            "Stage-c_pt_4-reason_embeddings-v1p1-Index-43-Size-14B-Res-720-Fps-16"
            "_resume_from_reason1p1_rectified_flow_shift5_high_sigma"
        ),
        base="predict2_video2world_14b_rectified_flow",
        overrides=dict(_HIGH_SIGMA),
    )
)

# ---------------------------------------------------------------------------
# Sparse-attention resume family (reference resume_text2world/sparse_2B.py:
# 279,406,533 — GNA interleave over the Index-26 base, n_dense 7/6/4)
# ---------------------------------------------------------------------------

for _idx, _ndense in ((200, 7), (201, 6), (202, 4)):
    register_experiment(
        Experiment(
            name=(
                f"Stage-c_pt_4-Index-{_idx}-Size-2B-Res-720-Fps-16"
                f"-Note-HQ_V3_from_22_sparse-attn_{_ndense}dense"
            ),
            base="predict2_video2world_2b_sparse",
            overrides={"model.net.n_dense_blocks": _ndense},
        )
    )

# ---------------------------------------------------------------------------
# Auto multiview "buttercup" (reference predict2_multiview/configs/vid2vid/
# experiment/buttercup/buttercup2p5_rectified_flow.py:529-566): 7 views,
# 29 frames/view (state_t 8/view), fps 30, RoPE fps-modulation off.
# ---------------------------------------------------------------------------

_BUTTERCUP = {
    "model.net.rope_enable_fps_modulation": False,
    "model.state_t": 56,  # 8 latent frames x 7 views
}

register_experiment(
    Experiment(
        name=(
            "buttercup_predict2p5_2b_7views_res720p_fps30_t8_from48kfps30mv_condprobs0442"
            "_joint_alpamayo1capnoviewprefix_allcapsviewprefix_29frames_nofps"
        ),
        base="predict2_multiview_2b_7views",
        overrides=dict(_BUTTERCUP),
    )
)

register_experiment(
    Experiment(
        name=(
            "buttercup_predict2p5_2b_7views_res720p_fps30_t8_joint_alpamayo1capviewprefix"
            "_allcapsviewprefix_29frames_nofps_uniform_dropoutt0"
        ),
        base="predict2_multiview_2b_7views",
        # uniform time sampling + conditional-frame dropout-to-0
        # (ref buttercup2p5_rectified_flow.py:552-566)
        overrides={
            **_BUTTERCUP,
            "model.rectified_flow.train_time_distribution": "uniform",
            "model.min_num_conditional_frames": 0,
        },
    )
)

# Transfer2.5 auto multiview (DB-only in the reference; the producing
# configs live in the cosmos-transfer repo). fps 10, same 7-view geometry.
for _name in (
    "buttercup_transfer2p5_2b_mv_7views_res720p_fps10_t8_fromfinetuned12knofpsuniform"
    "_mads720pmulticaps29frames_world_scenario_nofps_uniform",
    "buttercup_transfer2p5_2b_mv_7views_res720p_fps10_t8_frombase5knofps"
    "_mads720pmulticaps29frames_world_scenario_resumefrom21k",
):
    register_experiment(
        Experiment(name=_name, base="predict2_multiview_2b_7views", overrides=dict(_BUTTERCUP))
    )

# ---------------------------------------------------------------------------
# Robot multicamera (reference camera/configs/camera_conditioned/experiment/
# exp_2b.py:263,329 — camera-conditioned RF video2video, 720p fps16)
# ---------------------------------------------------------------------------

for _name in (
    "multicamera_video2video_rectified_flow_2b_res_720_fps16_s3_multicam_syncam",
    "multicamera_video2video_rectified_flow_2b_res_720_fps16_s3_agibot",
):
    register_experiment(
        Experiment(name=_name, base="predict2_video2world_2b_camera_conditioned")
    )

# ---------------------------------------------------------------------------
# Action-conditioned robot V2W (reference action/configs/action_conditioned/
# experiment/exp_2B_action_conditioned_rectify_flow.py — bridge, 13 frames
# at 256x320 => state_t 4)
# ---------------------------------------------------------------------------

register_experiment(
    Experiment(
        name=(
            "cosmos_predict2p5_2B_reason_embeddings_action_conditioned"
            "_rectified_flow_bridge_13frame_256x320"
        ),
        base="predict2_video2world_2b_action_conditioned",
    )
)

# Interactive self-forcing gr00t runs (weights released, configs DB-only in
# the reference — imaginaire/utils/checkpoint_db.py interactive entries):
# causal DiT + action conditioning, 13-frame blocks at 256-res.
_INTERACTIVE = {
    "model.net.action_dim": 7 * 12,
    "model.state_t": 4,
}

for _name in (
    "cosmos_predict2p5_2B_action_conditioned_gr00t_gr1_customized_13frame_sf_warmup",
    "cosmos_predict2p5_2B_action_gr00t_gr1_warmup",
):
    register_experiment(
        Experiment(name=_name, base="predict2_interactive_2b_causal", overrides=dict(_INTERACTIVE))
    )

# ---------------------------------------------------------------------------
# Transfer2.5 control branches (edge/seg/blur/depth). DB-only in the
# reference (producing configs live in cosmos-transfer); registered over the
# 2B base so the checkpoint->config contract resolves. t24 = state_t 24.
# ---------------------------------------------------------------------------

for _name in (
    "edge_720p_t24_spaced_layer4_cr1pt1_sdev2_lowsigma0.05_nonuniform_hqv3p1_20250714_64N_rectified_flow_mock_data",
    "seg_720p_t24_spaced_layer4_cr1pt1_sdev2_lowsigma0.05_nonuniform_hqv4p2_20250823_64N_rectified_flow",
    "vis_720p_t24_spaced_layer4_cr1pt1_sdev2_lowsigma0.05_nonuniform_hqv3p1_20250714_64N_rectified_flow",
    "depth_720p_t24_spaced_layer4_cr1pt1_sdev2_lowsigma0.05_nonuniform_hqv4p1_20250823_64N_rectified_flow",
):
    register_experiment(
        Experiment(name=_name, base="predict2_video2world_2b_rectified_flow")
    )

# ---------------------------------------------------------------------------
# DMD2 TrigFlow distillation (reference distill/configs/experiment/
# experiments_dmd2_trigflow.py:274,298): 4-step student over the 2B base;
# the _w_discriminator variant adds the GAN head on DiT features.
# ---------------------------------------------------------------------------

register_experiment(
    Experiment(
        name="dmd2_trigflow_distill_cosmos_predict2_2B_bidirectional",
        base="predict2_video2world_2b_rectified_flow",
        overrides={"model.sampling_num_steps": 4},
    )
)

register_experiment(
    Experiment(
        name="dmd2_trigflow_distill_cosmos_predict2_2B_bidirectional_w_discriminator",
        base="dmd2_trigflow_distill_cosmos_predict2_2B_bidirectional",
    )
)

# ---------------------------------------------------------------------------
# OSS post-training recipes (reference cosmos_predict2/experiments/):
# user-facing fine-tunes over the released base checkpoint. Data here is
# the local-folder dataset at post-training geometry (93 frames 704x1280);
# the recipes keep the documented iteration budget and save cadence
# (cosmos_nemo_assets.py:49-117).
# ---------------------------------------------------------------------------

_POSTTRAIN = {
    "trainer.max_iter": 1000,
    "trainer.save_iter": 200,
    "data_train.num_frames": 93,
    "data_train.height": 704,
    "data_train.width": 1280,
    "data_train.batch_size": 1,
}

register_experiment(
    Experiment(
        name="predict2_video2world_training_2b_cosmos_nemo_assets",
        base=(
            "Stage-c_pt_4-reason_embeddings-v1p1-Index-26-Size-2B-Res-720-Fps-16"
            "-Note-T2V_high_sigma_loss_reweighted_1_1_rectified_flow_only_resume2"
        ),
        overrides=dict(_POSTTRAIN),
    )
)

# LoRA post-training (cosmos_nemo_assets_lora.py:48-123: rank 32, alpha 32,
# q/k/v/output_proj + both MLP layers)
register_experiment(
    Experiment(
        name="predict2_lora_training_2b_cosmos_nemo_assets",
        base="predict2_video2world_training_2b_cosmos_nemo_assets",
        overrides={
            "model.use_lora": True,
            "model.lora_rank": 32,
            "model.lora_alpha": 32.0,
        },
    )
)

# groot GR1 480p post-train (groot.py:49-123)
register_experiment(
    Experiment(
        name="predict2_video2world_training_2b_groot_gr1_480",
        base="predict2_video2world_training_2b_cosmos_nemo_assets",
        overrides={"data_train.height": 432, "data_train.width": 768},
    )
)

# action-conditioned bridge post-train (action.py:29-43)
register_experiment(
    Experiment(
        name="ac_reason_embeddings_rectified_flow_2b_256_320",
        base="predict2_video2world_2b_action_conditioned",
        overrides={
            "trainer.max_iter": 1000,
            "trainer.save_iter": 200,
            "data_train.num_frames": 13,
            "data_train.height": 256,
            "data_train.width": 320,
            "data_train.batch_size": 1,
        },
    )
)

# multiview waymo post-train (multiview/waymo.py:25-76)
register_experiment(
    Experiment(
        name="predict2_multiview_post_train_waymo",
        base="predict2_multiview_2b_7views",
        overrides={
            "trainer.max_iter": 1000,
            "trainer.save_iter": 200,
            "data_train.batch_size": 1,
        },
    )
)
