"""Camera / rigid-transform / quaternion math and volume rendering, JAX-native.

TPU-first re-design of the reference camera library
(reference: cosmos_predict2/_src/imaginaire/modules/camera.py:82-660 and
volume_render.py:19-142). Key differences from the torch original:

* Pure functions over ``jnp`` arrays — everything is jit/vmap/grad
  compatible; there is no numpy/torch dual dispatch layer (JAX accepts
  numpy inputs natively) and no ``no_grad`` context (callers use
  ``lax.stop_gradient`` if they need it).
* Validity checks (`det(R) == 1`, unit quaternion) are *not* inline
  asserts — data-dependent asserts would break tracing. They are exposed
  as separate ``check_*`` helpers returning boolean arrays, usable with
  ``chex``/host callbacks at the call site.
* All math runs in float32 and casts back to the input dtype, matching
  the reference's mixed-precision policy (camera.py:103-137).

Conventions (identical to the reference, camera.py:82-91):
  poses are world-to-camera [R|t] with shape [..., 3, 4], OpenCV axes;
  points are row vectors with homogeneous coordinate on the right, so
  transforms apply as ``points_hom @ pose.T``; quaternions are (x,y,z,w).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array


def _f32(x: Array) -> Array:
    return jnp.asarray(x, jnp.float32)


# --------------------------------------------------------------------------
# validity checks (host-friendly; return bool arrays instead of asserting)
# --------------------------------------------------------------------------


def check_valid_pose(cam_pose: Array, atol: float = 1e-4) -> Array:
    """``det(R)`` close to 1 per pose (reference camera.py:95-115)."""
    if cam_pose.shape[-2:] != (3, 4):
        raise ValueError(f"pose must be [...,3,4], got {cam_pose.shape}")
    det = jnp.linalg.det(_f32(cam_pose[..., :3]))
    return jnp.isfinite(det) & (jnp.abs(det - 1.0) < atol)


def check_unit_quaternion(q: Array, atol: float = 1e-5) -> Array:
    if q.shape[-1] != 4:
        raise ValueError(f"quaternion must be [...,4], got {q.shape}")
    return jnp.abs(jnp.linalg.norm(_f32(q), axis=-1) - 1.0) < atol


# --------------------------------------------------------------------------
# poses
# --------------------------------------------------------------------------


def invert_pose(cam_pose: Array) -> Array:
    """Invert a world2cam [R|t] -> cam2world [Rᵀ|-Rᵀt] (camera.py:119-138)."""
    dtype = jnp.asarray(cam_pose).dtype
    R, t = _f32(cam_pose[..., :3]), _f32(cam_pose[..., 3:])
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = -R_inv @ t
    return jnp.concatenate([R_inv, t_inv], axis=-1).astype(dtype)


def compose_poses(cam_poses: list[Array]) -> Array:
    """Compose rigid transforms; result applies ``poses[0]`` first
    (camera.py:142-168): ``pose_new(x) = pose_N ∘ … ∘ pose_1(x)``."""
    first = jnp.asarray(cam_poses[0])
    R_new, t_new = _f32(first[..., :3]), _f32(first[..., 3:])
    for pose in cam_poses[1:]:
        R, t = _f32(pose[..., :3]), _f32(pose[..., 3:])
        R_new = R @ R_new
        t_new = R @ t_new + t
    return jnp.concatenate([R_new, t_new], axis=-1).astype(first.dtype)


def get_camera_center(cam_pose: Array) -> Array:
    """Camera center in world coords: ``-Rᵀ t`` (camera.py:266-278)."""
    R, t = _f32(cam_pose[..., :3]), _f32(cam_pose[..., 3:])
    center = (-jnp.swapaxes(R, -1, -2) @ t)[..., 0]
    return center.astype(jnp.asarray(cam_pose).dtype)


def get_relative_poses_wrt_frame0(cam_pose: Array) -> Array:
    """Re-express per-view poses in the first camera's frame; view 0 becomes
    [I|0] (camera.py:240-262): ``pose_rel_i = pose_i ∘ pose_0⁻¹``."""
    pose_ref_inv = invert_pose(cam_pose[..., 0, :, :])
    return compose_poses([pose_ref_inv[..., None, :, :], cam_pose])


# --------------------------------------------------------------------------
# point transforms
# --------------------------------------------------------------------------


def to_homogeneous(points: Array) -> Array:
    ones = jnp.ones_like(points[..., :1])
    return jnp.concatenate([points, ones], axis=-1)


def world2camera(points: Array, cam_pose: Array) -> Array:
    """x_cam = [x_world|1] @ [R|t]ᵀ (camera.py:299-314)."""
    out = _f32(to_homogeneous(points)) @ jnp.swapaxes(_f32(cam_pose), -1, -2)
    return out.astype(jnp.asarray(points).dtype)


def camera2world(points: Array, cam_pose: Array) -> Array:
    pose_inv = invert_pose(cam_pose)
    out = _f32(to_homogeneous(points)) @ jnp.swapaxes(_f32(pose_inv), -1, -2)
    dtype = jnp.asarray(points).dtype
    # keep f32 for half dtypes to avoid double-quantization (camera.py:333-337)
    if dtype in (jnp.bfloat16, jnp.float16):
        return out
    return out.astype(dtype)


def camera2image(points: Array, cam_intr: Array) -> Array:
    out = _f32(points) @ jnp.swapaxes(_f32(cam_intr), -1, -2)
    return out.astype(jnp.asarray(points).dtype)


def image2camera(points: Array, cam_intr: Array) -> Array:
    K_inv = jnp.linalg.inv(_f32(cam_intr))
    out = _f32(points) @ jnp.swapaxes(K_inv, -1, -2)
    return out.astype(jnp.asarray(points).dtype)


# --------------------------------------------------------------------------
# intrinsics / extrinsics <-> parameter vectors
# --------------------------------------------------------------------------


def intrinsic_params_to_matrices(params: Array) -> Array:
    """(fx, fy, cx, cy) -> K [...,3,3] (camera.py:378-395)."""
    fx, fy, cx, cy = (params[..., i] for i in range(4))
    one, zero = jnp.ones_like(fx), jnp.zeros_like(fx)
    K = jnp.stack(
        [
            jnp.stack([fx, zero, cx], axis=-1),
            jnp.stack([zero, fy, cy], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )
    return K


def intrinsic_matrices_to_params(cam_intr: Array) -> Array:
    """K -> (fx, fy, cx, cy) (camera.py:399-427)."""
    return jnp.stack(
        [cam_intr[..., 0, 0], cam_intr[..., 1, 1], cam_intr[..., 0, 2], cam_intr[..., 1, 2]],
        axis=-1,
    )


def extrinsic_params_to_matrices(qxyzw_t: Array) -> Array:
    """(qx,qy,qz,qw, tx,ty,tz) -> world2cam [R|t] (camera.py:431-447)."""
    R = quaternion_to_rotation_matrix(qxyzw_t[..., :4])
    t = _f32(qxyzw_t[..., 4:7])[..., None]
    return jnp.concatenate([R.astype(jnp.float32), t], axis=-1).astype(jnp.asarray(qxyzw_t).dtype)


def extrinsic_matrices_to_params(cam_pose: Array) -> Array:
    """world2cam [R|t] -> (qx,qy,qz,qw, tx,ty,tz) (camera.py:451-465)."""
    q = quaternion_from_rotation_matrix(cam_pose[..., :3])
    t = cam_pose[..., 3]
    return jnp.concatenate([q, t], axis=-1)


# --------------------------------------------------------------------------
# rays
# --------------------------------------------------------------------------


def get_camera_rays(cam_pose: Array, cam_intr: Array, image_size: tuple[int, int]) -> Array:
    """Unit world-space ray directions through pixel centers, flattened to
    [..., H*W, 3] (camera.py:172-210)."""
    H, W = image_size
    y = jnp.arange(H, dtype=jnp.float32) + 0.5
    x = jnp.arange(W, dtype=jnp.float32) + 0.5
    yg, xg = jnp.meshgrid(y, x, indexing="ij")
    xy = jnp.stack([xg, yg], axis=-1).reshape(-1, 2)  # [HW, 2]
    xy = jnp.broadcast_to(xy, (*cam_pose.shape[:-2], H * W, 2))
    grid_cam = image2camera(to_homogeneous(xy), cam_intr)  # pixel centers at depth 1
    grid_world = camera2world(grid_cam, cam_pose)
    center = get_camera_center(cam_pose)[..., None, :]
    rays = _f32(grid_world) - _f32(center)
    norms = jnp.linalg.norm(rays, axis=-1, keepdims=True)
    rays = rays / jnp.maximum(norms, 1e-8)
    return rays.astype(jnp.asarray(cam_pose).dtype)


def get_plucker_rays(cam_pose: Array, cam_intr: Array, image_size: tuple[int, int]) -> Array:
    """Plücker coordinates [moment | direction], [..., H*W, 6]
    (camera.py:214-236): m = o × d with o the camera center."""
    rays = get_camera_rays(cam_pose, cam_intr, image_size)
    center = jnp.broadcast_to(get_camera_center(cam_pose)[..., None, :], rays.shape)
    moment = jnp.cross(_f32(center), _f32(rays))
    return jnp.concatenate([moment.astype(rays.dtype), rays], axis=-1)


# --------------------------------------------------------------------------
# quaternions (x, y, z, w)
# --------------------------------------------------------------------------


def quaternion_normalize(q: Array, eps: float = 1e-8) -> Array:
    q32 = _f32(q)
    norm = jnp.maximum(jnp.linalg.norm(q32, axis=-1, keepdims=True), eps)
    return (q32 / norm).astype(jnp.asarray(q).dtype)


def quaternion_to_rotation_matrix(q: Array) -> Array:
    """(camera.py:519-552)"""
    qx, qy, qz, qw = (_f32(q[..., i]) for i in range(4))
    r = [
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)],
        [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)],
        [2 * (qx * qz - qy * qw), 2 * (qx * qw + qy * qz), 1 - 2 * (qx * qx + qy * qy)],
    ]
    R = jnp.stack([jnp.stack(row, axis=-1) for row in r], axis=-2)
    return R.astype(jnp.asarray(q).dtype)


def quaternion_from_rotation_matrix(R: Array, eps: float = 1e-6) -> Array:
    """Branch-free (where-based) Shepperd's method (camera.py:556-615).

    The four candidate solutions are all computed and selected with
    ``jnp.where`` — same structure as the reference's torch.where ladder,
    and jit-safe (no data-dependent control flow).
    """
    R32 = _f32(R)
    m00, m11, m22 = R32[..., 0, 0], R32[..., 1, 1], R32[..., 2, 2]
    trace = m00 + m11 + m22

    def _safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 0.0) + eps)

    s0 = _safe_sqrt(trace + 1.0) * 2.0
    c0 = (0.25 * s0, (R32[..., 2, 1] - R32[..., 1, 2]) / s0, (R32[..., 0, 2] - R32[..., 2, 0]) / s0, (R32[..., 1, 0] - R32[..., 0, 1]) / s0)

    s1 = _safe_sqrt(1.0 + m00 - m11 - m22) * 2.0
    c1 = ((R32[..., 2, 1] - R32[..., 1, 2]) / s1, 0.25 * s1, (R32[..., 0, 1] + R32[..., 1, 0]) / s1, (R32[..., 0, 2] + R32[..., 2, 0]) / s1)

    s2 = _safe_sqrt(1.0 + m11 - m00 - m22) * 2.0
    c2 = ((R32[..., 0, 2] - R32[..., 2, 0]) / s2, (R32[..., 0, 1] + R32[..., 1, 0]) / s2, 0.25 * s2, (R32[..., 1, 2] + R32[..., 2, 1]) / s2)

    s3 = _safe_sqrt(1.0 + m22 - m00 - m11) * 2.0
    c3 = ((R32[..., 1, 0] - R32[..., 0, 1]) / s3, (R32[..., 0, 2] + R32[..., 2, 0]) / s3, (R32[..., 1, 2] + R32[..., 2, 1]) / s3, 0.25 * s3)

    cond0 = trace > 0
    cond1 = (~cond0) & (m00 > m11) & (m00 > m22)
    cond2 = (~cond0) & (~cond1) & (m11 > m22)

    # candidate order per component: (w, x, y, z)
    def select(i):
        return jnp.where(cond0, c0[i], jnp.where(cond1, c1[i], jnp.where(cond2, c2[i], c3[i])))

    qw, qx, qy, qz = select(0), select(1), select(2), select(3)
    q = jnp.stack([qx, qy, qz, qw], axis=-1)
    return quaternion_normalize(q).astype(jnp.asarray(R).dtype)


def quaternion_invert(q: Array) -> Array:
    """Conjugate (unit quaternions) (camera.py:619-635)."""
    return jnp.concatenate([-q[..., :3], q[..., 3:]], axis=-1)


def quaternion_multiply(q1: Array, q2: Array) -> Array:
    """Hamilton product q1 ⊗ q2, renormalized (camera.py:639-660)."""
    x1, y1, z1, w1 = (q1[..., i] for i in range(4))
    x2, y2, z2, w2 = (q2[..., i] for i in range(4))
    qx = w1 * x2 + w2 * x1 + y1 * z2 - z1 * y2
    qy = w1 * y2 + w2 * y1 + z1 * x2 - x1 * z2
    qz = w1 * z2 + w2 * z1 + x1 * y2 - y1 * x2
    qw = w1 * w2 - (x1 * x2 + y1 * y2 + z1 * z2)
    return quaternion_normalize(jnp.stack([qx, qy, qz, qw], axis=-1))


# --------------------------------------------------------------------------
# volume rendering (reference volume_render.py:19-142)
# --------------------------------------------------------------------------


def sample_dists(
    near: Array, far: Array, num_samples: int, *, stratified: bool = False, key: Array | None = None
) -> Array:
    """Sample distances along rays in [near, far); midpoint or stratified
    (volume_render.py:122-142). ``key`` is required when stratified."""
    shape = (*near.shape[:-1], num_samples)
    if stratified:
        if key is None:
            raise ValueError("stratified sampling needs an explicit PRNG key")
        rands = jax.random.uniform(key, shape, dtype=jnp.float32)
    else:
        rands = jnp.full(shape, 0.5, dtype=jnp.float32)
    base = jnp.arange(num_samples, dtype=jnp.float32)
    rands = (rands + base) / num_samples
    return rands * (_f32(far) - _f32(near)) + _f32(near)


def volume_rendering_alphas(densities: Array, dists: Array, dist_far: Array | None = None) -> Array:
    """Quadrature alphas ``1 - exp(-σ·Δ)`` (volume_render.py:65-87)."""
    if dist_far is None:
        dist_far = jnp.full_like(dists[..., :1, :], 1e10)
    d = jnp.concatenate([dists, dist_far], axis=-2)
    intervals = d[..., 1:, :] - d[..., :-1, :]
    return 1.0 - jnp.exp(-densities * intervals)


def alpha_compositing_weights(alphas: Array) -> Array:
    """w_i = α_i ∏_{j<i}(1-α_j); cumprod in fp32 (volume_render.py:90-103)."""
    alphas_front = jnp.concatenate([jnp.zeros_like(alphas[..., :1, :]), alphas[..., :-1, :]], axis=-2)
    visibility = jnp.cumprod(_f32(1.0 - alphas_front), axis=-2)
    return (alphas * visibility).astype(jnp.asarray(alphas).dtype)


def composite(quantities: Array, weights: Array) -> Array:
    """Weighted sum over the sample axis (volume_render.py:106-118)."""
    return jnp.sum(quantities * weights, axis=-2)


def volume_render_rays(
    nerf: Callable[[Array, Array], tuple[Array, Array]],
    center: Array,
    ray_unit: Array,
    near: Array,
    far: Array,
    num_samples: int,
    *,
    stratified: bool = False,
    solid_background: bool = False,
    key: Array | None = None,
) -> tuple[Array, Array, Array, Array, Array]:
    """Volume-render rays through a radiance field (volume_render.py:19-62).

    ``nerf(points, ray_dirs) -> (rgbs [...,N,3], densities [...,N,1])`` is any
    callable (e.g. a bound Flax apply). Returns (rgb, opacity, weights,
    points, dists) exactly like the reference.
    """
    dists = jax.lax.stop_gradient(sample_dists(near, far, num_samples, stratified=stratified, key=key))
    points = center[..., None, :] + ray_unit[..., None, :] * dists[..., None]
    ray_dirs = jnp.broadcast_to(ray_unit[..., None, :], points.shape)
    rgbs, densities = nerf(points, ray_dirs)
    dist_far = None if solid_background else far[..., None]
    alphas = volume_rendering_alphas(densities, dists[..., None], dist_far=dist_far)
    weights = alpha_compositing_weights(alphas)
    opacity = composite(jnp.ones_like(weights), weights)
    rgb = composite(rgbs, weights)
    return rgb, opacity, weights, points, dists
