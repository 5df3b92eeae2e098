"""Action-conditioned robot Video2World.

Capability parity with the reference action stack
(cosmos_predict2/_src/predict2/action/ + cosmos_predict2/action_conditioned.py):
the DiT gains two action-embedding MLPs added to the timestep embedding and
AdaLN-LoRA term and concatenates the conditioning mask as an extra input
channel (action_conditioned_minimal_v1_lvg_dit.py:47-112; wired through
DiTConfig.action_dim / concat_condition_mask here), and the public API
converts absolute robot states (xyz + euler + gripper) into scaled relative
actions between consecutive frames (action_conditioned.py:42-130).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

import numpy as np

from cosmos_predict2_tpu.models.video2world import RFModelConfig, Video2WorldModel
from cosmos_predict2_tpu.networks.dit import DiTConfig


def euler2rotm(rpy: np.ndarray) -> np.ndarray:
    """Euler roll-pitch-yaw (XYZ intrinsic, i.e. R = Rz @ Ry @ Rx) -> 3x3."""
    r, p, y = rpy
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return rz @ ry @ rx


def rotm2euler(R: np.ndarray) -> np.ndarray:
    """3x3 rotation -> roll-pitch-yaw (inverse of euler2rotm)."""
    sy = np.sqrt(R[0, 0] ** 2 + R[1, 0] ** 2)
    if sy > 1e-6:
        roll = np.arctan2(R[2, 1], R[2, 2])
        pitch = np.arctan2(-R[2, 0], sy)
        yaw = np.arctan2(R[1, 0], R[0, 0])
    else:  # gimbal lock
        roll = np.arctan2(-R[1, 2], R[1, 1])
        pitch = np.arctan2(-R[2, 0], sy)
        yaw = 0.0
    return np.array([roll, pitch, yaw])


def rotm2quat(R: np.ndarray) -> np.ndarray:
    """3x3 rotation -> quaternion (w, x, y, z)."""
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    if w > 1e-8:
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:
        x = np.sqrt(max(0.0, 1.0 + R[0, 0] - R[1, 1] - R[2, 2])) / 2.0
        y = R[0, 1] / (2 * x) if x > 1e-8 else 0.0
        z = R[0, 2] / (2 * x) if x > 1e-8 else 0.0
    return np.array([w, x, y, z])


def relative_actions_from_states(
    arm_states: np.ndarray,  # (L, 6): xyz + rpy
    gripper_states: np.ndarray,  # (L,)
    use_quat: bool = False,
    action_scaler: float = 20.0,
    gripper_scale: float = 1.0,
) -> np.ndarray:
    """Relative actions between consecutive states (reference _get_actions).

    Each action = [prev_frame-relative xyz (3), relative rotation (3 euler or
    4 quat), gripper (1)], scaled by action_scaler (gripper by gripper_scale).
    Returns (L-1, 7) or (L-1, 8).
    """
    L = arm_states.shape[0]
    dim = 8 if use_quat else 7
    actions = np.zeros((L - 1, dim))
    for k in range(1, L):
        prev_rotm = euler2rotm(arm_states[k - 1, 3:6])
        curr_rotm = euler2rotm(arm_states[k, 3:6])
        rel_xyz = prev_rotm.T @ (arm_states[k, 0:3] - arm_states[k - 1, 0:3])
        rel_rotm = prev_rotm.T @ curr_rotm
        actions[k - 1, 0:3] = rel_xyz
        if use_quat:
            actions[k - 1, 3:7] = rotm2quat(rel_rotm)
            actions[k - 1, 7] = gripper_states[k]
        else:
            actions[k - 1, 3:6] = rotm2euler(rel_rotm)
            actions[k - 1, 6] = gripper_states[k]
    scale = np.full(dim, action_scaler)
    scale[-1] = gripper_scale
    return actions * scale


def action_conditioned_model_config(
    base_net: DiTConfig,
    action_dim: int = 7,
    num_action_per_chunk: int = 12,
    **model_kwargs,
) -> RFModelConfig:
    """RFModelConfig for the action-conditioned variant: the net gets the
    action embedders and the extra condition-mask input channel."""
    net = dataclasses.replace(
        base_net,
        concat_condition_mask=True,
        action_dim=action_dim,
        num_action_per_chunk=num_action_per_chunk,
    )
    return RFModelConfig(net=net, **model_kwargs)


class ActionConditionedVideo2WorldModel(Video2WorldModel):
    """Same training/sampling flow; the action rides in condition.action."""


def get_action_sequence_from_states(
    arm_states: np.ndarray,
    gripper_states: np.ndarray,
    fps_downsample_ratio: int = 1,
    use_quat: bool = False,
    action_scaler: float = 20.0,
    gripper_scale: float = 1.0,
) -> np.ndarray:
    """Dataset robot states -> scaled relative-action sequence (reference
    cosmos_predict2/action_conditioned.py:106-129): optionally fps-downsample
    the state track, then take per-step relative actions."""
    r = fps_downsample_ratio
    return relative_actions_from_states(
        arm_states[::r], gripper_states[::r],
        use_quat=use_quat, action_scaler=action_scaler, gripper_scale=gripper_scale,
    )


class ActionConditionedInference:
    """Robot video prediction: first frame(s) + action sequence -> clip
    (reference cosmos_predict2/action_conditioned.py:205-320 inference())."""

    def __init__(self, model: ActionConditionedVideo2WorldModel, params, vae, vae_params, text_encoder=None):
        self.model = model
        self.params = params
        self.vae = vae
        self.vae_params = vae_params
        self.text_encoder = text_encoder
        self._jit = jax.jit(self._impl, static_argnames=("num_steps", "num_conditional_frames"))

    def _impl(self, params, vae_params, video_pm1, text_emb, actions, noise, guidance,
              num_steps: int, num_conditional_frames: int):
        from cosmos_predict2_tpu.conditioning.conditioner import DataType, make_condition
        from cosmos_predict2_tpu.tokenizers.wan_vae import WanVAE

        latents = self.vae.apply(vae_params, video_pm1, method=WanVAE.encode)
        gt = latents.transpose(0, 4, 1, 2, 3).astype(jnp.float32)
        condition = make_condition(text_emb, data_type=DataType.VIDEO)
        condition = condition.replace(gt_frames=gt, action=actions)
        samples = self.model.generate(
            params, noise, condition, guidance=guidance, num_steps=num_steps,
            num_conditional_frames=num_conditional_frames,
        )
        frames = self.vae.apply(
            vae_params, samples.astype(jnp.bfloat16).transpose(0, 2, 3, 4, 1), method=WanVAE.decode
        )
        return frames

    def generate(
        self,
        video_u8: np.ndarray,  # (1, T, H, W, 3) conditioning frames (rest zeros)
        actions: np.ndarray,  # (T_act, action_dim) from get_action_sequence_from_states
        prompt_emb: jax.Array,
        guidance: float = 3.0,
        num_steps: int = 35,
        num_conditional_frames: int = 1,
        seed: int = 1,
    ) -> np.ndarray:
        from cosmos_predict2_tpu.utils.misc import arch_invariant_rand

        mc = self.model.config
        B, T, H, W, _ = video_u8.shape
        video = jnp.asarray(video_u8, jnp.float32) / 127.5 - 1.0
        latent_shape = (B, mc.state_ch, 1 + (T - 1) // 4, H // 8, W // 8)
        noise = arch_invariant_rand(latent_shape, seed=seed)
        act = jnp.asarray(actions, jnp.float32)[None] if actions.ndim == 2 else jnp.asarray(actions, jnp.float32)
        frames = self._jit(
            self.params, self.vae_params, video, prompt_emb, act, noise,
            jnp.float32(guidance), num_steps=num_steps, num_conditional_frames=num_conditional_frames,
        )
        return np.asarray((frames[0] + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
