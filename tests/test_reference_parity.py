"""Numerics parity against the ACTUAL reference implementation (torch, CPU).

Round-1 golden tests were self-referential (generated their own .npz).
These tests import the reference's pure-torch modules through
tests/reference_shims.py and pin the JAX implementations to them with
seeded random weights:

* FlowUniPCMultistepScheduler (reference models/fm_solvers_unipc.py:15-766)
  vs schedulers/unipc.py — sigma schedule + full 35-step trajectory with a
  deterministic fake velocity model.
* WanVAE_ (reference tokenizers/wan2pt1.py:469-592) vs tokenizers/wan_vae.py
  — encode and decode activations through utils/checkpoint_convert.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_shims import import_reference  # tests/ is on sys.path under pytest


# --------------------------------------------------------------------------
# UniPC
# --------------------------------------------------------------------------


def _ref_scheduler(num_steps: int, shift: float, order: int = 2):
    m = import_reference("cosmos_predict2._src.predict2.models.fm_solvers_unipc")
    s = m.FlowUniPCMultistepScheduler(num_train_timesteps=1000, solver_order=order)
    s.set_timesteps(num_steps, device="cpu", shift=shift)
    return s


@pytest.mark.level(1)
@pytest.mark.parametrize("num_steps,shift", [(35, 5.0), (10, 3.0)])
def test_unipc_schedule_matches_reference(num_steps, shift):
    from cosmos_predict2_tpu.schedulers import unipc

    ref = _ref_scheduler(num_steps, shift)
    mine = unipc.set_timesteps(num_steps, shift=shift)

    np.testing.assert_allclose(
        np.asarray(mine.sigmas), ref.sigmas.numpy(), rtol=0, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(mine.timesteps).astype(np.int64), ref.timesteps.numpy()
    )


def _fake_velocity_np(x: np.ndarray, t: float) -> np.ndarray:
    # deterministic, mildly nonlinear; identical math in torch and jax
    return np.sin(1.3 * x) * np.float32(0.5 + t / 2000.0) + np.float32(0.05) * x


@pytest.mark.level(1)
@pytest.mark.parametrize("num_steps", [8, 35])
def test_unipc_trajectory_matches_reference(num_steps):
    from cosmos_predict2_tpu.schedulers import unipc

    shape = (1, 4, 2, 6, 6)
    rng = np.random.RandomState(0)
    x0 = rng.randn(*shape).astype(np.float32)

    # --- reference loop ---
    ref = _ref_scheduler(num_steps, shift=5.0)
    x = torch.from_numpy(x0.copy())
    with torch.no_grad():
        for t in ref.timesteps:
            v = torch.sin(1.3 * x) * float(0.5 + float(t) / 2000.0) + 0.05 * x
            x = ref.step(v, t, x).prev_sample
    ref_out = x.numpy()

    # --- JAX scan ---
    coeffs = unipc.set_timesteps(num_steps, shift=5.0)

    def velocity_fn(x, t):
        return jnp.sin(1.3 * x) * (0.5 + t / 2000.0) + 0.05 * x

    mine = np.asarray(unipc.sample(velocity_fn, jnp.asarray(x0), coeffs))

    assert np.max(np.abs(mine - ref_out)) < 2e-3, (
        f"max diff {np.max(np.abs(mine - ref_out))}, "
        f"ref range [{ref_out.min():.3f},{ref_out.max():.3f}]"
    )


# --------------------------------------------------------------------------
# MiniTrainDIT — the flagship network
# --------------------------------------------------------------------------


@pytest.mark.level(1)
def test_dit_forward_matches_reference():
    """Full reference MiniTrainDIT (minimal_v4_dit.py:1250-1741) on CPU with
    atten_backend='torch' vs the JAX DiT through convert_dit_state_dict:
    RoPE (TE apply_rotary_pos_emb semantics), q/k RMSNorm, AdaLN-LoRA,
    patchify/unpatchify, timestep embedding — all pinned at once."""
    dit_mod = import_reference("cosmos_predict2._src.predict2.networks.minimal_v4_dit")
    torch.manual_seed(0)
    ref = dit_mod.MiniTrainDIT(
        max_img_h=64,
        max_img_w=64,
        max_frames=8,
        in_channels=16,
        out_channels=16,
        patch_spatial=2,
        patch_temporal=1,
        concat_padding_mask=True,
        model_channels=64,
        num_blocks=2,
        num_heads=2,
        atten_backend="torch",
        crossattn_emb_channels=1024,
        pos_emb_cls="rope3d",
        use_adaln_lora=True,
        adaln_lora_dim=16,
        rope_enable_fps_modulation=False,
    ).eval()

    rng = np.random.RandomState(3)
    x = rng.randn(1, 16, 2, 8, 8).astype(np.float32)
    ts = np.array([700.0], dtype=np.float32)
    ctx = (rng.randn(1, 8, 1024) * 0.05).astype(np.float32)
    pad = np.zeros((1, 8, 8), dtype=np.float32)

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x),
            torch.from_numpy(ts),
            torch.from_numpy(ctx),
            padding_mask=torch.from_numpy(pad),
        ).numpy()

    import dataclasses

    from cosmos_predict2_tpu.networks.dit import DiTConfig, MiniTrainDIT
    from cosmos_predict2_tpu.utils.checkpoint_convert import convert_dit_state_dict

    cfg = DiTConfig(
        model_channels=64,
        num_heads=2,
        num_blocks=2,
        use_adaln_lora=True,
        adaln_lora_dim=16,
        rope_enable_fps_modulation=False,
        dtype=jnp.float32,
        remat="none",
    )
    params = convert_dit_state_dict({k: v.numpy() for k, v in ref.state_dict().items()}, 2)
    params = jax.tree.map(lambda a: jnp.asarray(a, dtype=jnp.float32), params)
    mine = np.asarray(
        MiniTrainDIT(cfg).apply(
            params, jnp.asarray(x), jnp.asarray(ts), jnp.asarray(ctx), padding_mask=jnp.asarray(pad[:, None])
        )
    )

    assert mine.shape == ref_out.shape
    scale = np.abs(ref_out).max()
    diff = np.abs(mine - ref_out).max()
    assert diff < 2e-4 * max(scale, 1.0), f"DiT max diff {diff}, ref scale {scale}"


@pytest.mark.level(1)
def test_causal_dit_forward_matches_reference():
    """Reference CausalDIT (interactive/networks/dit_causal.py:569-958,
    atten_backend='torch': per-frame tril causal mask over the token grid,
    per-frame timesteps) vs our temporal_causal MiniTrainDIT through the
    same weight converter — the interactive family's core net pinned
    against reference code."""
    dit_mod = import_reference("cosmos_predict2._src.predict2.interactive.networks.dit_causal")
    torch.manual_seed(0)
    ref = dit_mod.CausalDIT(
        max_img_h=64,
        max_img_w=64,
        max_frames=8,
        in_channels=16,
        out_channels=16,
        patch_spatial=2,
        patch_temporal=1,
        concat_padding_mask=True,
        model_channels=64,
        num_blocks=2,
        num_heads=2,
        atten_backend="torch",
        crossattn_emb_channels=1024,
        pos_emb_cls="rope3d",
        use_adaln_lora=True,
        adaln_lora_dim=16,
        rope_enable_fps_modulation=False,
    ).eval()

    rng = np.random.RandomState(3)
    x = rng.randn(1, 16, 3, 8, 8).astype(np.float32)
    ts = np.full((1, 3), 700.0, dtype=np.float32)  # per-frame timesteps
    ctx = (rng.randn(1, 8, 1024) * 0.05).astype(np.float32)
    pad = np.zeros((1, 8, 8), dtype=np.float32)
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x),
            torch.from_numpy(ts),
            torch.from_numpy(ctx),
            padding_mask=torch.from_numpy(pad),
        ).numpy()

    from cosmos_predict2_tpu.networks.dit import DiTConfig, MiniTrainDIT
    from cosmos_predict2_tpu.utils.checkpoint_convert import convert_dit_state_dict

    cfg = DiTConfig(
        model_channels=64,
        num_heads=2,
        num_blocks=2,
        use_adaln_lora=True,
        adaln_lora_dim=16,
        rope_enable_fps_modulation=False,
        dtype=jnp.float32,
        remat="none",
        temporal_causal=True,
        num_frame_per_block=1,
    )
    params = convert_dit_state_dict({k: v.numpy() for k, v in ref.state_dict().items()}, 2)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    mine = np.asarray(
        MiniTrainDIT(cfg).apply(
            params, jnp.asarray(x), jnp.asarray(ts), jnp.asarray(ctx), padding_mask=jnp.asarray(pad[:, None])
        )
    )

    assert mine.shape == ref_out.shape
    scale = np.abs(ref_out).max()
    diff = np.abs(mine - ref_out).max()
    assert diff < 2e-4 * max(scale, 1.0), f"CausalDIT max diff {diff}, ref scale {scale}"


@pytest.mark.level(1)
def test_camera_dit_forward_matches_reference():
    """Reference CameraMiniTrainDIT (camera/networks/
    minimal_v4_dit_camera_conditioned.py:1250+): per-block bias-free
    cam_encoder on the per-token Plücker camera embedding, added to the
    normalized hidden states before self-attention — vs our camera_dim knob
    through the converter (output verified camera-sensitive)."""
    mod = import_reference(
        "cosmos_predict2._src.predict2.camera.networks.minimal_v4_dit_camera_conditioned"
    )
    torch.manual_seed(0)
    ref = mod.CameraMiniTrainDIT(
        max_img_h=64,
        max_img_w=64,
        max_frames=8,
        in_channels=16,
        out_channels=16,
        patch_spatial=2,
        patch_temporal=1,
        concat_padding_mask=True,
        model_channels=64,
        num_blocks=2,
        num_heads=2,
        atten_backend="torch",
        crossattn_emb_channels=1024,
        pos_emb_cls="rope3d",
        use_adaln_lora=True,
        adaln_lora_dim=16,
        rope_enable_fps_modulation=False,
    ).eval()

    rng = np.random.RandomState(3)
    x = rng.randn(1, 16, 2, 8, 8).astype(np.float32)
    ts = np.array([700.0], dtype=np.float32)
    ctx = (rng.randn(1, 8, 1024) * 0.05).astype(np.float32)
    pad = np.zeros((1, 8, 8), dtype=np.float32)
    cam = (rng.randn(1, 2, 4, 4, 1536) * 0.1).astype(np.float32)  # (B,T,Hp,Wp,cam_dim)
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x),
            torch.from_numpy(ts),
            torch.from_numpy(ctx),
            padding_mask=torch.from_numpy(pad),
            camera=torch.from_numpy(cam),
        ).numpy()
        ref_out2 = ref(
            torch.from_numpy(x),
            torch.from_numpy(ts),
            torch.from_numpy(ctx),
            padding_mask=torch.from_numpy(pad),
            camera=torch.from_numpy(cam * 3.0),
        ).numpy()
    assert np.abs(ref_out - ref_out2).max() > 1e-2  # camera path is live

    from cosmos_predict2_tpu.networks.dit import DiTConfig, MiniTrainDIT
    from cosmos_predict2_tpu.utils.checkpoint_convert import convert_dit_state_dict

    cfg = DiTConfig(
        model_channels=64,
        num_heads=2,
        num_blocks=2,
        use_adaln_lora=True,
        adaln_lora_dim=16,
        rope_enable_fps_modulation=False,
        dtype=jnp.float32,
        remat="none",
        camera_dim=1536,
    )
    params = convert_dit_state_dict({k: v.numpy() for k, v in ref.state_dict().items()}, 2)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    mine = np.asarray(
        MiniTrainDIT(cfg).apply(
            params,
            jnp.asarray(x),
            jnp.asarray(ts),
            jnp.asarray(ctx),
            padding_mask=jnp.asarray(pad[:, None]),
            camera=jnp.asarray(cam),
        )
    )

    assert mine.shape == ref_out.shape
    scale = np.abs(ref_out).max()
    diff = np.abs(mine - ref_out).max()
    assert diff < 2e-4 * max(scale, 1.0), f"CameraDiT max diff {diff}, ref scale {scale}"


@pytest.mark.level(1)
def test_causal_dit_with_conditional_mask_matches_reference():
    """CausalDITwithConditionalMask (dit_causal.py:1020-1058): condition
    mask concatenated as an extra input channel + timestep scaling, on top
    of the causal mask — vs our concat_condition_mask/timestep_scale knobs."""
    dit_mod = import_reference("cosmos_predict2._src.predict2.interactive.networks.dit_causal")
    torch.manual_seed(0)
    ref = dit_mod.CausalDITwithConditionalMask(
        max_img_h=64,
        max_img_w=64,
        max_frames=8,
        in_channels=16,
        out_channels=16,
        patch_spatial=2,
        patch_temporal=1,
        concat_padding_mask=True,
        model_channels=64,
        num_blocks=2,
        num_heads=2,
        atten_backend="torch",
        crossattn_emb_channels=1024,
        pos_emb_cls="rope3d",
        use_adaln_lora=True,
        adaln_lora_dim=16,
        rope_enable_fps_modulation=False,
        timestep_scale=0.001,
    ).eval()

    rng = np.random.RandomState(3)
    x = rng.randn(1, 16, 3, 8, 8).astype(np.float32)
    ts = np.full((1, 3), 700.0, dtype=np.float32)
    ctx = (rng.randn(1, 8, 1024) * 0.05).astype(np.float32)
    pad = np.zeros((1, 8, 8), dtype=np.float32)
    cond_mask = np.zeros((1, 1, 3, 8, 8), dtype=np.float32)
    cond_mask[:, :, :1] = 1.0  # frame 0 conditioned
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x),
            torch.from_numpy(ts),
            torch.from_numpy(ctx),
            condition_video_input_mask_B_C_T_H_W=torch.from_numpy(cond_mask),
            padding_mask=torch.from_numpy(pad),
        ).numpy()

    from cosmos_predict2_tpu.networks.dit import DiTConfig, MiniTrainDIT
    from cosmos_predict2_tpu.utils.checkpoint_convert import convert_dit_state_dict

    cfg = DiTConfig(
        model_channels=64,
        num_heads=2,
        num_blocks=2,
        use_adaln_lora=True,
        adaln_lora_dim=16,
        rope_enable_fps_modulation=False,
        dtype=jnp.float32,
        remat="none",
        temporal_causal=True,
        num_frame_per_block=1,
        concat_condition_mask=True,
        timestep_scale=0.001,
    )
    params = convert_dit_state_dict({k: v.numpy() for k, v in ref.state_dict().items()}, 2)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    mine = np.asarray(
        MiniTrainDIT(cfg).apply(
            params,
            jnp.asarray(x),
            jnp.asarray(ts),
            jnp.asarray(ctx),
            padding_mask=jnp.asarray(pad[:, None]),
            condition_mask=jnp.asarray(cond_mask),
        )
    )

    assert mine.shape == ref_out.shape
    scale = np.abs(ref_out).max()
    diff = np.abs(mine - ref_out).max()
    assert diff < 2e-4 * max(scale, 1.0), f"CausalDIT+mask max diff {diff}, ref scale {scale}"


@pytest.mark.level(1)
def test_action_causal_dit_forward_matches_reference():
    """Reference ActionChunkCausalDIT (interactive/networks/
    dit_action_causal.py:61-190): PER-LATENT-FRAME action embeddings (actions
    grouped by temporal_compression_ratio, zero-padded frame 0, added to the
    t-embedding and AdaLN-LoRA streams) on top of the causal mask — vs our
    action_per_latent_frame=True causal DiT with converted weights.
    Frame 0 is causally isolated from actions; frames 1+ are action-modulated
    (verified: output is action-sensitive)."""
    mod = import_reference("cosmos_predict2._src.predict2.interactive.networks.dit_action_causal")
    torch.manual_seed(0)
    ref = mod.ActionChunkCausalDIT(
        max_img_h=64,
        max_img_w=64,
        max_frames=8,
        in_channels=16,
        out_channels=16,
        patch_spatial=2,
        patch_temporal=1,
        concat_padding_mask=True,
        model_channels=64,
        num_blocks=2,
        num_heads=2,
        atten_backend="torch",
        crossattn_emb_channels=1024,
        pos_emb_cls="rope3d",
        use_adaln_lora=True,
        adaln_lora_dim=16,
        rope_enable_fps_modulation=False,
        action_dim=8,
        temporal_compression_ratio=4,
    ).eval()

    rng = np.random.RandomState(3)
    x = rng.randn(1, 16, 3, 8, 8).astype(np.float32)
    ts = np.full((1, 3), 700.0, dtype=np.float32)
    ctx = (rng.randn(1, 8, 1024) * 0.05).astype(np.float32)
    pad = np.zeros((1, 8, 8), dtype=np.float32)
    act = (rng.randn(1, 8, 8) * 0.3).astype(np.float32)  # (B, (T-1)*4, action_dim)
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x),
            torch.from_numpy(ts),
            torch.from_numpy(ctx),
            padding_mask=torch.from_numpy(pad),
            action=torch.from_numpy(act),
        ).numpy()
        # sanity: the action path is live (frames 1+ react to actions)
        ref_out2 = ref(
            torch.from_numpy(x),
            torch.from_numpy(ts),
            torch.from_numpy(ctx),
            padding_mask=torch.from_numpy(pad),
            action=torch.from_numpy(act * 5.0),
        ).numpy()
    assert np.abs(ref_out - ref_out2).max() > 1e-2

    from cosmos_predict2_tpu.networks.dit import DiTConfig, MiniTrainDIT
    from cosmos_predict2_tpu.utils.checkpoint_convert import convert_dit_state_dict

    cfg = DiTConfig(
        model_channels=64,
        num_heads=2,
        num_blocks=2,
        use_adaln_lora=True,
        adaln_lora_dim=16,
        rope_enable_fps_modulation=False,
        dtype=jnp.float32,
        remat="none",
        temporal_causal=True,
        num_frame_per_block=1,
        action_dim=8,
        action_per_latent_frame=True,
        num_action_per_latent_frame=4,
    )
    params = convert_dit_state_dict({k: v.numpy() for k, v in ref.state_dict().items()}, 2)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    mine = np.asarray(
        MiniTrainDIT(cfg).apply(
            params,
            jnp.asarray(x),
            jnp.asarray(ts),
            jnp.asarray(ctx),
            padding_mask=jnp.asarray(pad[:, None]),
            action=jnp.asarray(act),
        )
    )

    assert mine.shape == ref_out.shape
    scale = np.abs(ref_out).max()
    diff = np.abs(mine - ref_out).max()
    assert diff < 2e-4 * max(scale, 1.0), f"ActionCausalDIT max diff {diff}, ref scale {scale}"


# --------------------------------------------------------------------------
# Wan2.1 VAE
# --------------------------------------------------------------------------


def _ref_vae(dim=16):
    wan = import_reference("cosmos_predict2._src.predict2.tokenizers.wan2pt1")
    torch.manual_seed(0)
    model = wan.WanVAE_(
        dim=dim,
        z_dim=16,
        dim_mult=[1, 2, 4, 4],
        num_res_blocks=2,
        attn_scales=[],
        temperal_downsample=[False, True, True],
    ).eval()
    return model


def _jax_vae(dim=16):
    from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE, WanVAEConfig

    return WanVAE(WanVAEConfig(dim=dim, z_dim=16, dtype=jnp.float32))


def _scale():
    from cosmos_predict2_tpu.tokenizers.wan_vae import WAN_LATENT_MEAN, WAN_LATENT_STD

    mean = torch.from_numpy(WAN_LATENT_MEAN.copy())
    inv_std = torch.from_numpy((1.0 / WAN_LATENT_STD).copy())
    return [mean, inv_std]


@pytest.fixture(scope="module")
def vae_pair():
    from cosmos_predict2_tpu.utils.checkpoint_convert import convert_vae_state_dict

    ref = _ref_vae()
    sd = {k: v.float() for k, v in ref.state_dict().items()}
    params = convert_vae_state_dict(sd)
    params = jax.tree.map(lambda a: jnp.asarray(a, dtype=jnp.float32), params)
    return ref, _jax_vae(), params


@pytest.mark.level(1)
def test_wan_vae_encode_matches_reference(vae_pair):
    ref, net, params = vae_pair
    rng = np.random.RandomState(1)
    x = rng.uniform(-1, 1, size=(1, 3, 9, 32, 32)).astype(np.float32)

    with torch.no_grad():
        ref_mu = ref.encode(torch.from_numpy(x), _scale()).numpy()  # (B,16,t,h,w)

    x_jax = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))  # (B,T,H,W,3)
    mine = net.apply(params, x_jax, method=net.encode)  # (B,t,h,w,16)
    mine = np.transpose(np.asarray(mine), (0, 4, 1, 2, 3))

    assert mine.shape == ref_mu.shape
    diff = np.max(np.abs(mine - ref_mu))
    scale = np.max(np.abs(ref_mu))
    assert diff < 1e-3 * max(scale, 1.0), f"encode max diff {diff}, ref scale {scale}"


@pytest.mark.level(1)
def test_wan_vae_decode_matches_reference(vae_pair):
    ref, net, params = vae_pair
    rng = np.random.RandomState(2)
    z = rng.randn(1, 16, 3, 4, 4).astype(np.float32)

    with torch.no_grad():
        ref_px = ref.decode(torch.from_numpy(z), _scale()).numpy()  # (B,3,T,H,W)

    z_jax = jnp.asarray(np.transpose(z, (0, 2, 3, 4, 1)))  # (B,t,h,w,16)
    mine = net.apply(params, z_jax, method=net.decode)
    mine = np.transpose(np.asarray(mine), (0, 4, 1, 2, 3))

    assert mine.shape == ref_px.shape
    diff = np.max(np.abs(mine - ref_px))
    scale = np.max(np.abs(ref_px))
    assert diff < 1e-3 * max(scale, 1.0), f"decode max diff {diff}, ref scale {scale}"


# ---------------------------------------------------------------------------
# TrigFlow denoiser scalings (distillation)
# ---------------------------------------------------------------------------


def test_trigflow_scalings_match_reference():
    ds = import_reference("cosmos_predict2._src.predict2.modules.denoiser_scaling")
    from cosmos_predict2_tpu.models.distillation import trigflow_scalings_edm, trigflow_scalings_rf

    t = np.linspace(0.05, np.pi / 2 - 0.05, 17).astype(np.float32)
    for sigma_data in (1.0, 0.5):
        ref = ds.EDM_sCMWrapper(sigma_data)(torch.from_numpy(t))
        mine = trigflow_scalings_edm(jnp.asarray(t), sigma_data)
        for r, m in zip(ref, mine):
            np.testing.assert_allclose(np.asarray(m), r.numpy(), rtol=1e-6, atol=1e-6)
        ref = ds.RectifiedFlow_sCMWrapper(sigma_data)(torch.from_numpy(t))
        mine = trigflow_scalings_rf(jnp.asarray(t), sigma_data)
        for r, m in zip(ref, mine):
            np.testing.assert_allclose(np.asarray(m), r.numpy(), rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# Legacy EDM "2ab" multistep solver
# ---------------------------------------------------------------------------


def test_edm_2ab_sampler_matches_reference():
    """Our scan-based EDM sampler vs a torch loop built from the reference's
    own order2_fn/reg_x0_euler_step (imaginaire/functional/multi_step.py:27-49)
    driving the same schedule + sample_clean step (res_sampler.py:185-190,
    215-258; no churn)."""
    ms = import_reference("cosmos_predict2._src.imaginaire.functional.multi_step")
    from cosmos_predict2_tpu.schedulers import edm_sampler

    num_steps = 9
    sigmas = edm_sampler.karras_rev_ts(0.002, 80.0, num_steps, 7.0)  # (n+1,)
    rng = np.random.RandomState(0)
    x_init = (rng.randn(2, 3, 4, 4) * sigmas[0]).astype(np.float64)
    W = rng.randn(4, 4).astype(np.float64) * 0.2

    def x0_fn_torch(x, sigma):
        s = sigma.reshape(-1, 1, 1, 1).to(torch.float64)
        return torch.tanh(x / (1.0 + s)) + (x @ torch.from_numpy(W)) / (1.0 + s * s)

    def x0_fn_jax(x, sigma):
        s = jnp.float64(sigma) if jnp.ndim(sigma) == 0 else sigma
        return jnp.tanh(x / (1.0 + s)) + (x @ jnp.asarray(W)) / (1.0 + s * s)

    # reference loop (differential_equation_solver semantics, is_multi, "2ab")
    x = torch.from_numpy(x_init)
    ones = torch.ones(x.shape[0], dtype=torch.float64)
    x0_preds = []
    for i in range(num_steps):
        s_cur, s_next = float(sigmas[i]), float(sigmas[i + 1])
        x0 = x0_fn_torch(x, s_cur * ones)
        x, x0_preds = ms.order2_fn(x, s_cur * ones, s_next * ones, x0, x0_preds)
    ref = x0_fn_torch(x, float(sigmas[-1]) * ones).numpy()  # sample_clean

    # our sampler computes in float32 (coefficients precomputed in float64)
    mine = edm_sampler.sample(
        x0_fn_jax,
        jnp.asarray(x_init, jnp.float32),
        num_steps=num_steps,
        sample_clean=True,
    )
    np.testing.assert_allclose(np.asarray(mine, np.float64), ref, rtol=2e-4, atol=2e-4)


# --------------------------------------------------------------------------
# Wan2.2 VAE
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def wan22_pair():
    from cosmos_predict2_tpu.tokenizers.wan22_vae import Wan22VAE, Wan22VAEConfig
    from cosmos_predict2_tpu.utils.checkpoint_convert import convert_wan22_vae_state_dict

    wan22 = import_reference("cosmos_predict2._src.predict2.tokenizers.wan2pt2")
    torch.manual_seed(0)
    ref = wan22.WanVAE_(
        dim=8, dec_dim=8, z_dim=48, dim_mult=[1, 2, 4, 4], num_res_blocks=2,
        attn_scales=[], temperal_downsample=[False, True, True],
    ).eval()
    params = convert_wan22_vae_state_dict({k: v.float() for k, v in ref.state_dict().items()})
    params = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), dtype=jnp.float32), params)
    net = Wan22VAE(Wan22VAEConfig(dim=8, dec_dim=8, dtype=jnp.float32))
    return ref, net, params


def _wan22_scale():
    from cosmos_predict2_tpu.tokenizers.wan22_vae import WAN22_LATENT_MEAN, WAN22_LATENT_STD

    return [torch.from_numpy(np.asarray(WAN22_LATENT_MEAN).copy()),
            torch.from_numpy((1.0 / np.asarray(WAN22_LATENT_STD)).copy())]


@pytest.mark.level(1)
def test_wan22_vae_encode_matches_reference(wan22_pair):
    """Wan2.2 (4x16x16, 48ch) encode: our one-shot causally-padded conv
    formulation vs the reference's feat-cache chunked loop
    (wan2pt2.py:733-767)."""
    ref, net, params = wan22_pair
    rng = np.random.RandomState(3)
    x = rng.uniform(-1, 1, size=(1, 3, 9, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_mu = ref.encode(torch.from_numpy(x), _wan22_scale()).numpy()  # (B,48,t,h,w)
    x_jax = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    mine = net.apply(params, x_jax, method=net.encode)
    mine = np.transpose(np.asarray(mine), (0, 4, 1, 2, 3))
    assert mine.shape == ref_mu.shape
    diff = np.max(np.abs(mine - ref_mu))
    scale = np.max(np.abs(ref_mu))
    assert diff < 2e-3 * max(scale, 1.0), f"wan2.2 encode max diff {diff}, ref scale {scale}"


@pytest.mark.level(1)
def test_wan22_vae_decode_matches_reference(wan22_pair):
    ref, net, params = wan22_pair
    rng = np.random.RandomState(4)
    z = rng.randn(1, 48, 3, 2, 2).astype(np.float32)
    with torch.no_grad():
        ref_out = ref.decode(torch.from_numpy(z), _wan22_scale()).numpy()  # (B,3,T,H,W)
    z_jax = jnp.asarray(np.transpose(z, (0, 2, 3, 4, 1)))
    mine = net.apply(params, z_jax, method=net.decode)
    mine = np.transpose(np.asarray(mine), (0, 4, 1, 2, 3))
    assert mine.shape == ref_out.shape
    diff = np.max(np.abs(mine - ref_out))
    scale = np.max(np.abs(ref_out))
    assert diff < 2e-3 * max(scale, 1.0), f"wan2.2 decode max diff {diff}, ref scale {scale}"


# --------------------------------------------------------------------------
# Text-encoder pooling (VERDICT r2 weak #5a)
# --------------------------------------------------------------------------


@pytest.mark.level(1)
def test_text_pooling_matches_reference():
    """The reference's compute_text_embeddings_online normalize+pool math
    (text_encoders/text_encoder.py:196-220: per-layer mean-normalize of
    hidden_states[1:], then FULL_CONCAT / MEAN_POOLING /
    POOL_EVERY_N_LAYERS_AND_CONCAT) vs pool_hidden_states, on identical
    seeded hidden states driven through the REAL reference method with a
    faked tokenizer/model."""
    from types import SimpleNamespace

    from reference_shims import install_reason1_shims

    install_reason1_shims()
    import importlib

    te_mod = importlib.import_module("cosmos_predict2._src.predict2.text_encoders.text_encoder")
    Strategy = te_mod.EmbeddingConcatStrategy

    B, S, D, n_layers = 2, te_mod.NUM_EMBEDDING_PADDING_TOKENS, 64, 5
    rng = np.random.RandomState(11)
    # hidden_states[0] is the token embedding the reference SKIPS — make it
    # wild so any off-by-one in the layer slice fails loudly
    hs = [torch.from_numpy((rng.randn(B, S, D) * (100.0 if i == 0 else 1.0)).astype(np.float32))
          for i in range(n_layers + 1)]

    class _FakeTok:
        pad_id = 0

        def apply_chat_template(self, conversations, **kw):
            return {"input_ids": np.arange(7, dtype=np.int64)}

    class _FakeModel:
        tokenizer = _FakeTok()

        def to(self, *a, **k):
            return self

        def __call__(self, input_ids, _):
            return None, {"hidden_states": hs}

    # the reference moves input ids to cuda; run the literal code on CPU
    orig_to = torch.Tensor.to

    def cpu_to(self, *args, **kwargs):
        if kwargs.get("device") == "cuda":
            kwargs["device"] = "cpu"
        args = tuple("cpu" if a == "cuda" else a for a in args)
        return orig_to(self, *args, **kwargs)

    from cosmos_predict2_tpu.text_encoders.qwen import pool_hidden_states

    torch.Tensor.to = cpu_to
    try:
        for strategy, n_group in ((Strategy.FULL_CONCAT, 5), (Strategy.MEAN_POOLING, 5),
                                  (Strategy.POOL_EVERY_N_LAYERS_AND_CONCAT, 2)):
            te = object.__new__(te_mod.TextEncoder)
            te.config = SimpleNamespace(embedding_concat_strategy=str(strategy), n_layers_per_group=n_group)
            te.model = _FakeModel()
            te.device = "cpu"
            ref = te.compute_text_embeddings_online({"caption": ["a", "b"]}, "caption").numpy()

            mine = np.asarray(
                pool_hidden_states([jnp.asarray(h.numpy()) for h in hs], str(strategy), n_layers_per_group=n_group)
            )
            assert mine.shape == ref.shape, (str(strategy), mine.shape, ref.shape)
            np.testing.assert_allclose(mine, ref, rtol=2e-5, atol=2e-5, err_msg=str(strategy))
    finally:
        torch.Tensor.to = orig_to


# --------------------------------------------------------------------------
# Video2World denoise semantics (VERDICT r2 weak #5b)
# --------------------------------------------------------------------------


def _fake_net_torch(x, timesteps, emb):
    """Deterministic stand-in net, same math as _fake_net_jax."""
    B, C, T, H, W = x.shape
    t = timesteps.reshape(B, -1)
    if t.shape[1] == 1:
        t = t.expand(B, T)
    t_term = t.reshape(B, 1, T, 1, 1) / 1000.0
    return torch.sin(x) * 0.7 + x * t_term + emb.mean() * 0.01


class _FakeNetJax:
    """Duck-typed .apply matching MiniTrainDIT's call signature."""

    def apply(self, params, x, timesteps, emb, fps=None, padding_mask=None, **kw):
        B, C, T, H, W = x.shape
        t = jnp.reshape(timesteps, (B, -1))
        if t.shape[1] == 1:
            t = jnp.broadcast_to(t, (B, T))
        t_term = t.reshape(B, 1, T, 1, 1) / 1000.0
        return jnp.sin(x) * 0.7 + x * t_term + jnp.mean(emb) * 0.01


@pytest.mark.level(1)
@pytest.mark.parametrize(
    "cond_timestep,use_vc,num_cond_frames",
    [(-1.0, True, 2), (125.0, True, 2), (125.0, False, 1), (-1.0, True, 0)],
)
def test_v2w_denoise_semantics_match_reference(cond_timestep, use_vc, num_cond_frames):
    """FRAME_REPLACE input masking, conditional-frame timestep pinning,
    gt-velocity output replacement, and the CFG velocity combine vs the
    REAL reference Video2WorldModelRectifiedFlow.denoise
    (video2world_model_rectified_flow.py:77-212) driven with the real
    Video2WorldCondition mask construction (configs/video2world/defaults/
    conditioner.py:45-131), identical seeded tensors, and the same
    deterministic stand-in network on both sides."""
    from types import SimpleNamespace

    from reference_shims import install_model_shims

    install_model_shims()
    import importlib

    m = importlib.import_module("cosmos_predict2._src.predict2.models.video2world_model_rectified_flow")
    cond_mod = importlib.import_module(
        "cosmos_predict2._src.predict2.configs.video2world.defaults.conditioner"
    )

    B, C, T, H, W = 2, 4, 6, 8, 8
    rng = np.random.RandomState(5)
    xt = rng.randn(B, C, T, H, W).astype(np.float32)
    noise = rng.randn(B, C, T, H, W).astype(np.float32)
    gt = rng.randn(B, C, T, H, W).astype(np.float32)
    emb = (rng.randn(B, 8, 16) * 0.3).astype(np.float32)
    ts = np.full((B,), 700.0, dtype=np.float32)

    # ---- reference side: real condition class + real denoise method ----
    ref_model = object.__new__(m.Video2WorldModelRectifiedFlow)
    ref_model.config = SimpleNamespace(
        conditional_frame_timestep=cond_timestep, denoise_replace_gt_frames=True
    )
    ref_model.tensor_kwargs = {"dtype": torch.float32}
    ref_model.net = lambda x_B_C_T_H_W, timesteps_B_T, crossattn_emb=None, **kw: _fake_net_torch(
        x_B_C_T_H_W, timesteps_B_T, crossattn_emb
    )

    ref_cond = cond_mod.Video2WorldCondition(
        crossattn_emb=torch.from_numpy(emb), use_video_condition=torch.tensor(use_vc)
    ).set_video_condition(
        gt_frames=torch.from_numpy(gt),
        random_min_num_conditional_frames=0,
        random_max_num_conditional_frames=0,
        num_conditional_frames=num_cond_frames,
    )
    ts_ref = torch.from_numpy(ts).reshape(B, 1, 1, 1, 1)
    with torch.no_grad():
        ref_out = ref_model.denoise(
            torch.from_numpy(noise), torch.from_numpy(xt), ts_ref, ref_cond
        ).numpy()

    # ---- JAX side ----
    import dataclasses as dc

    from cosmos_predict2_tpu.conditioning.conditioner import DataType, make_condition
    from cosmos_predict2_tpu.models.video2world import RFModelConfig, Video2WorldModel
    from cosmos_predict2_tpu.networks.dit import PRESETS

    cfg = RFModelConfig(
        net=dc.replace(PRESETS["test"], dtype=jnp.float32, remat="none"),
        conditional_frame_timestep=cond_timestep,
        denoise_replace_gt_frames=True,
    )
    model = Video2WorldModel(cfg)
    model.net = _FakeNetJax()

    my_cond = make_condition(jnp.asarray(emb), data_type=DataType.VIDEO).set_video_condition(
        jnp.asarray(gt), num_cond_frames
    )
    my_cond = my_cond.replace(use_video_condition=jnp.asarray(use_vc))
    mine = np.asarray(
        model.denoise(None, jnp.asarray(noise), jnp.asarray(xt), jnp.asarray(ts), my_cond)
    )

    # mask construction parity: reference (B,1,T,H,W) == mine (B,1,T,1,1) broadcast
    ref_mask = ref_cond.condition_video_input_mask_B_C_T_H_W.numpy()
    my_mask = np.broadcast_to(np.asarray(my_cond.condition_video_mask), ref_mask.shape)
    np.testing.assert_array_equal(ref_mask, my_mask)

    np.testing.assert_allclose(mine, ref_out, rtol=1e-5, atol=1e-5)

    # CFG velocity combine (reference get_velocity_fn_from_batch:206-212:
    # cond + g * (cond - uncond)) on a second "uncond" denoise
    ref_uncond = cond_mod.Video2WorldCondition(
        crossattn_emb=torch.zeros_like(torch.from_numpy(emb)),
        use_video_condition=torch.tensor(use_vc),
    ).set_video_condition(
        gt_frames=torch.from_numpy(gt),
        random_min_num_conditional_frames=0,
        random_max_num_conditional_frames=0,
        num_conditional_frames=num_cond_frames,
    )
    with torch.no_grad():
        ref_uv = ref_model.denoise(
            torch.from_numpy(noise), torch.from_numpy(xt), ts_ref, ref_uncond
        ).numpy()
    guidance = 7.0
    ref_velocity = ref_out + guidance * (ref_out - ref_uv)

    my_uncond = make_condition(jnp.zeros_like(jnp.asarray(emb)), data_type=DataType.VIDEO).set_video_condition(
        jnp.asarray(gt), num_cond_frames
    ).replace(use_video_condition=jnp.asarray(use_vc))
    my_uv = np.asarray(
        model.denoise(None, jnp.asarray(noise), jnp.asarray(xt), jnp.asarray(ts), my_uncond)
    )
    my_velocity = mine + guidance * (mine - my_uv)
    np.testing.assert_allclose(my_velocity, ref_velocity, rtol=1e-4, atol=1e-4)


# --------------------------------------------------------------------------
# Action-conditioned DiT forward (VERDICT r2 weak #5c, part 1)
# --------------------------------------------------------------------------


@pytest.mark.level(1)
def test_action_dit_forward_matches_reference():
    """Full reference ActionConditionedMinimalV1LVGDiT on CPU
    (action/networks/action_conditioned_minimal_v1_lvg_dit.py:47-184:
    +1 condition-mask input channel, timestep_scale, two GELU-tanh action
    MLPs added to t-embedding and AdaLN-LoRA) vs the JAX DiT with
    action_dim/concat_condition_mask through convert_dit_state_dict."""
    from reference_shims import install_model_shims

    install_model_shims()
    import importlib

    mod = importlib.import_module(
        "cosmos_predict2._src.predict2.action.networks.action_conditioned_minimal_v1_lvg_dit"
    )
    cond_mod = importlib.import_module("cosmos_predict2._src.predict2.conditioner")

    action_dim, n_act = 6, 4
    torch.manual_seed(0)
    ref = mod.ActionConditionedMinimalV1LVGDiT(
        max_img_h=64,
        max_img_w=64,
        max_frames=8,
        in_channels=16,
        out_channels=16,
        patch_spatial=2,
        patch_temporal=1,
        concat_padding_mask=True,
        model_channels=64,
        num_blocks=2,
        num_heads=2,
        atten_backend="torch",
        crossattn_emb_channels=1024,
        pos_emb_cls="rope3d",
        use_adaln_lora=True,
        adaln_lora_dim=16,
        rope_enable_fps_modulation=False,
        timestep_scale=0.25,
        action_dim=action_dim,
        num_action_per_chunk=n_act,
    ).eval()

    rng = np.random.RandomState(7)
    x = rng.randn(1, 16, 2, 8, 8).astype(np.float32)
    ts = np.array([700.0], dtype=np.float32)
    ctx = (rng.randn(1, 8, 1024) * 0.05).astype(np.float32)
    pad = np.zeros((1, 8, 8), dtype=np.float32)
    action = (rng.randn(1, n_act, action_dim) * 0.5).astype(np.float32)
    cond_mask = np.zeros((1, 1, 2, 8, 8), dtype=np.float32)
    cond_mask[:, :, 0] = 1.0

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x),
            torch.from_numpy(ts),
            torch.from_numpy(ctx),
            condition_video_input_mask_B_C_T_H_W=torch.from_numpy(cond_mask),
            padding_mask=torch.from_numpy(pad),
            data_type=cond_mod.DataType.VIDEO,
            action=torch.from_numpy(action),
        ).numpy()

    import dataclasses

    from cosmos_predict2_tpu.networks.dit import DiTConfig, MiniTrainDIT
    from cosmos_predict2_tpu.utils.checkpoint_convert import convert_dit_state_dict

    cfg = DiTConfig(
        model_channels=64,
        num_heads=2,
        num_blocks=2,
        use_adaln_lora=True,
        adaln_lora_dim=16,
        rope_enable_fps_modulation=False,
        dtype=jnp.float32,
        remat="none",
        timestep_scale=0.25,
        action_dim=action_dim,
        num_action_per_chunk=n_act,
        concat_condition_mask=True,
    )
    params = convert_dit_state_dict({k: v.numpy() for k, v in ref.state_dict().items()}, 2)
    params = jax.tree.map(lambda a: jnp.asarray(a, dtype=jnp.float32), params)
    mine = np.asarray(
        MiniTrainDIT(cfg).apply(
            params,
            jnp.asarray(x),
            jnp.asarray(ts),
            jnp.asarray(ctx),
            padding_mask=jnp.asarray(pad[:, None]),
            condition_mask=jnp.asarray(cond_mask[:, 0][:, None]),
            action=jnp.asarray(action),
        )
    )

    assert mine.shape == ref_out.shape
    scale = np.abs(ref_out).max()
    diff = np.abs(mine - ref_out).max()
    assert diff < 2e-4 * max(scale, 1.0), f"action DiT max diff {diff}, ref scale {scale}"


# --------------------------------------------------------------------------
# Multiview DiT forward (VERDICT r2 weak #5c, part 2)
# --------------------------------------------------------------------------


@pytest.mark.level(1)
def test_multiview_dit_forward_matches_reference():
    """Full reference MultiViewDiT on CPU (predict2_multiview/networks/
    multiview_dit.py:268-540: per-view tiled RoPE, learned view-embedding
    channels concatenated after cond/padding masks, per-view cross-attention
    reshape B (V L) D -> (V B) L D) vs the JAX DiT with
    n_views/concat_view_embedding through convert_dit_state_dict."""
    from reference_shims import install_model_shims

    install_model_shims()
    import importlib

    mv_mod = importlib.import_module("cosmos_predict2._src.predict2_multiview.networks.multiview_dit")
    cond_mod = importlib.import_module("cosmos_predict2._src.predict2.conditioner")

    V, Tv = 3, 2
    torch.manual_seed(0)
    ref = mv_mod.MultiViewDiT(
        max_img_h=64,
        max_img_w=64,
        max_frames=8,
        in_channels=16,
        out_channels=16,
        patch_spatial=2,
        patch_temporal=1,
        concat_padding_mask=True,
        model_channels=64,
        num_blocks=2,
        num_heads=2,
        atten_backend="torch",
        crossattn_emb_channels=1024,
        pos_emb_cls="rope3d",
        use_adaln_lora=True,
        adaln_lora_dim=16,
        rope_enable_fps_modulation=False,
        state_t=Tv,
        n_cameras_emb=4,
        view_condition_dim=2,
        concat_view_embedding=True,
    ).eval()

    rng = np.random.RandomState(9)
    x = rng.randn(1, 16, V * Tv, 8, 8).astype(np.float32)
    ts = np.array([700.0], dtype=np.float32)
    # per-view captions: (B, V*512, D) in the reference cross-attn layout —
    # shrink the per-view length via the n_cameras = context//512 trick is
    # hardcoded; use 512 per view as the reference expects
    ctx = (rng.randn(1, V * 512, 1024) * 0.05).astype(np.float32)
    pad = np.zeros((1, 8, 8), dtype=np.float32)
    cond_mask = np.zeros((1, 1, V * Tv, 8, 8), dtype=np.float32)
    cond_mask[:, :, 0] = 1.0  # first frame of view 0

    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x),
            torch.from_numpy(ts),
            torch.from_numpy(ctx),
            condition_video_input_mask_B_C_T_H_W=torch.from_numpy(cond_mask),
            padding_mask=torch.from_numpy(pad),
            data_type=cond_mod.DataType.VIDEO,
        ).numpy()

    from cosmos_predict2_tpu.networks.dit import DiTConfig, MiniTrainDIT
    from cosmos_predict2_tpu.utils.checkpoint_convert import convert_dit_state_dict

    cfg = DiTConfig(
        model_channels=64,
        num_heads=2,
        num_blocks=2,
        use_adaln_lora=True,
        adaln_lora_dim=16,
        rope_enable_fps_modulation=False,
        dtype=jnp.float32,
        remat="none",
        n_views=V,
        n_cameras_emb=4,
        view_condition_dim=2,
        concat_view_embedding=True,
        concat_condition_mask=True,
    )
    params = convert_dit_state_dict({k: v.numpy() for k, v in ref.state_dict().items()}, 2)
    params = jax.tree.map(lambda a: jnp.asarray(a, dtype=jnp.float32), params)
    mine = np.asarray(
        MiniTrainDIT(cfg).apply(
            params,
            jnp.asarray(x),
            jnp.asarray(ts),
            jnp.asarray(ctx),
            padding_mask=jnp.asarray(pad[:, None]),
            condition_mask=jnp.asarray(cond_mask[:, 0][:, None]),
        )
    )

    assert mine.shape == ref_out.shape
    scale = np.abs(ref_out).max()
    diff = np.abs(mine - ref_out).max()
    assert diff < 2e-4 * max(scale, 1.0), f"multiview DiT max diff {diff}, ref scale {scale}"


# --------------------------------------------------------------------------
# Wan2.1 DiT (WanModel)
# --------------------------------------------------------------------------


@pytest.mark.level(1)
@pytest.mark.parametrize("mode", ["t2v", "i2v"])
def test_wan_dit_forward_matches_reference(mode):
    """Reference WanModel (networks/wan2pt1.py:646-900: interleaved
    flash-rotary RoPE, Wan RMS/LayerNorms, 6-way time modulation, i2v CLIP
    image cross-attention with k_img/v_img) vs our networks/wan_dit.WanModel
    through convert_wan_dit_state_dict. The head is zero-initialized, so
    weights are re-randomized to make the comparison non-vacuous."""
    # the reference rope hardcodes .cuda(); run it on CPU
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        wan = import_reference("cosmos_predict2._src.predict2.networks.wan2pt1")
        torch.manual_seed(0)
        i2v = mode == "i2v"
        ref = wan.WanModel(
            model_type=mode,
            patch_size=(1, 2, 2),
            text_len=16,
            in_dim=32 if i2v else 16,
            dim=64,
            ffn_dim=128,
            freq_dim=32,
            text_dim=48,
            out_dim=16,
            num_heads=2,
            num_layers=2,
            qk_norm=True,
            cross_attn_norm=True,
            concat_padding_mask=False,
            attention_backend="transformer_engine",
        ).eval()
        g = torch.Generator().manual_seed(7)
        sd = {k: torch.randn(v.shape, generator=g) * 0.05 for k, v in ref.state_dict().items()}
        ref.load_state_dict(sd)

        rng = np.random.RandomState(3)
        x = rng.randn(1, 16, 2, 8, 8).astype(np.float32)
        ts = np.array([[700.0]], dtype=np.float32)
        ctx = (rng.randn(1, 16, 48) * 0.05).astype(np.float32)
        kwargs_ref, kwargs_mine = {}, {}
        if i2v:
            y = rng.randn(1, 16, 2, 8, 8).astype(np.float32)
            clip = (rng.randn(1, 257, 1280) * 0.05).astype(np.float32)
            kwargs_ref = dict(
                y_B_C_T_H_W=torch.from_numpy(y),
                frame_cond_crossattn_emb_B_L_D=torch.from_numpy(clip),
            )
            kwargs_mine = dict(y_B_C_T_H_W=jnp.asarray(y), frame_cond_crossattn_emb=jnp.asarray(clip))
        with torch.no_grad():
            ref_out = ref(
                torch.from_numpy(x), torch.from_numpy(ts), torch.from_numpy(ctx), **kwargs_ref
            ).numpy()
        assert np.abs(ref_out).max() > 1e-3  # non-vacuous after re-randomize
    finally:
        torch.Tensor.cuda = orig_cuda

    from cosmos_predict2_tpu.networks.wan_dit import WanConfig, WanModel
    from cosmos_predict2_tpu.utils.checkpoint_convert import convert_wan_dit_state_dict

    cfg = WanConfig(
        model_type=mode,
        in_dim=32 if i2v else 16,
        dim=64,
        ffn_dim=128,
        freq_dim=32,
        text_dim=48,
        out_dim=16,
        num_heads=2,
        num_layers=2,
        text_len=16,
        concat_padding_mask=False,
        dtype=jnp.float32,
    )
    params = convert_wan_dit_state_dict(
        {k: v.numpy() for k, v in sd.items()}, 2, i2v=i2v, extra_in_channels=0
    )
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    mine = np.asarray(
        WanModel(cfg).apply(params, jnp.asarray(x), jnp.asarray(ts), jnp.asarray(ctx), **kwargs_mine)
    )

    assert mine.shape == ref_out.shape
    scale = np.abs(ref_out).max()
    diff = np.abs(mine - ref_out).max()
    assert diff < 2e-4 * max(scale, 1.0), f"WanModel[{mode}] max diff {diff}, ref scale {scale}"
