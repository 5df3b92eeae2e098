"""Camera math + volume rendering vs the torch reference (CPU parity).

Pins cosmos_predict2_tpu/utils/camera_math.py to the reference
imaginaire/modules/camera.py and volume_render.py through the
tests/reference_shims.py import path (no self-generated goldens).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from reference_shims import import_reference

from cosmos_predict2_tpu.utils import camera_math as cm


@pytest.fixture(scope="module")
def ref_camera():
    mod = import_reference("cosmos_predict2._src.imaginaire.modules.camera")
    return mod.Camera, mod.Quaternion


@pytest.fixture(scope="module")
def ref_volume():
    return import_reference("cosmos_predict2._src.imaginaire.modules.volume_render")


def random_poses(n=5, seed=0):
    rng = np.random.default_rng(seed)
    # random unit quaternions -> valid rotations
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    R = np.asarray(cm.quaternion_to_rotation_matrix(jnp.asarray(q, jnp.float32)))
    t = rng.normal(size=(n, 3, 1)).astype(np.float32)
    return np.concatenate([R, t], axis=-1).astype(np.float32), q.astype(np.float32)


def intr(n=5, seed=1):
    rng = np.random.default_rng(seed)
    f = rng.uniform(80, 200, size=(n, 2)).astype(np.float32)
    c = rng.uniform(20, 60, size=(n, 2)).astype(np.float32)
    return np.stack([f[:, 0], f[:, 1], c[:, 0], c[:, 1]], axis=-1)


def test_pose_ops_match_reference(ref_camera):
    Camera, _ = ref_camera
    poses, _ = random_poses()
    np.testing.assert_allclose(np.asarray(cm.invert_pose(poses)), Camera.invert_pose(poses), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(cm.get_camera_center(poses)), Camera.get_camera_center(poses), atol=1e-5
    )
    other, _ = random_poses(seed=7)
    np.testing.assert_allclose(
        np.asarray(cm.compose_poses([poses, other])),
        Camera.compose_poses([poses, other]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(cm.get_relative_poses_wrt_frame0(poses)),
        Camera.get_relative_poses_wrt_frame0(poses),
        atol=1e-5,
    )
    assert bool(cm.check_valid_pose(poses).all())


def test_point_transforms_match_reference(ref_camera):
    Camera, _ = ref_camera
    poses, _ = random_poses()
    K = np.asarray(cm.intrinsic_params_to_matrices(jnp.asarray(intr())))
    pts = np.random.default_rng(2).normal(size=(5, 11, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(cm.world2camera(pts, poses)), Camera.world2camera(pts, poses), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(cm.camera2world(pts, poses)), Camera.camera2world(pts, poses), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(cm.camera2image(pts, K)), Camera.camera2image(pts, K), rtol=1e-5, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(cm.image2camera(pts, K)), Camera.image2camera(pts, K), atol=1e-5
    )
    # round trip world -> camera -> world
    np.testing.assert_allclose(
        np.asarray(cm.camera2world(cm.world2camera(pts, poses), poses)), pts, atol=1e-4
    )


def test_intrinsic_param_round_trip(ref_camera):
    Camera, _ = ref_camera
    p = intr()
    K = cm.intrinsic_params_to_matrices(jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(K), Camera.intrinsic_params_to_matrices(p), atol=1e-6)
    np.testing.assert_allclose(np.asarray(cm.intrinsic_matrices_to_params(K)), p, atol=1e-6)


def test_quaternions_match_reference(ref_camera):
    _, Quaternion = ref_camera
    _, q = random_poses()
    R = cm.quaternion_to_rotation_matrix(jnp.asarray(q))
    np.testing.assert_allclose(np.asarray(R), Quaternion.to_rotation_matrix(q), atol=1e-5)
    # from_rotation_matrix: compare up to sign (q and -q are the same rotation)
    q_back = np.asarray(cm.quaternion_from_rotation_matrix(R))
    q_ref = Quaternion.from_rotation_matrix(np.asarray(R))
    sign = np.sign(np.sum(q_back * q_ref, axis=-1, keepdims=True))
    np.testing.assert_allclose(q_back * sign, q_ref, atol=1e-4)
    # multiply / invert
    q2 = np.roll(q, 1, axis=0)
    np.testing.assert_allclose(
        np.asarray(cm.quaternion_multiply(q, q2)), Quaternion.multiply(q, q2), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(cm.quaternion_invert(q)), Quaternion.invert(q), atol=1e-6)
    # rotation round-trips through extrinsic params
    poses, _ = random_poses(seed=3)
    params = cm.extrinsic_matrices_to_params(poses)
    poses_back = cm.extrinsic_params_to_matrices(params)
    np.testing.assert_allclose(np.asarray(poses_back), poses, atol=1e-4)


def test_rays_match_reference(ref_camera):
    Camera, _ = ref_camera
    poses, _ = random_poses(n=3)
    K = np.asarray(cm.intrinsic_params_to_matrices(jnp.asarray(intr(n=3))))
    size = (6, 8)
    np.testing.assert_allclose(
        np.asarray(cm.get_camera_rays(poses, K, size)),
        Camera.get_camera_rays(poses, K, size),
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(cm.get_plucker_rays(poses, K, size)),
        Camera.get_plucker_rays(poses, K, size),
        atol=1e-4,
    )


def test_volume_render_matches_reference(ref_volume):
    rng = np.random.default_rng(4)
    n_rays, n_samples = 13, 9
    # rank-4 [B,HW,N,1] sample tensors: the reference's compositing hardcodes
    # the sample axis as dim=2 (volume_render.py:99), so batch must be 2-D
    center = rng.normal(size=(1, n_rays, 3)).astype(np.float32)
    d = rng.normal(size=(1, n_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    near = np.full((1, n_rays, 1), 0.5, np.float32)
    far = np.full((1, n_rays, 1), 4.0, np.float32)

    W = rng.normal(size=(4, 3)).astype(np.float32) * 0.3  # rows: rgb x3, density x1

    def nerf_jax(points, rays):
        rgb = jnp.tanh(points @ jnp.asarray(W[:3].T))
        dens = jax.nn.softplus(points @ jnp.asarray(W[3:].T))
        return rgb, dens

    class NerfTorch(torch.nn.Module):
        def forward(self, points, rays):
            Wt = torch.from_numpy(W)
            return torch.tanh(points @ Wt[:3].T), torch.nn.functional.softplus(points @ Wt[3:].T)

    for solid in (False, True):
        rgb_j, op_j, w_j, pts_j, dists_j = cm.volume_render_rays(
            nerf_jax, center, d, near, far, n_samples, solid_background=solid
        )
        rgb_t, op_t, w_t, pts_t, dists_t = ref_volume.volume_render_rays(
            NerfTorch(),
            torch.from_numpy(center),
            torch.from_numpy(d),
            torch.from_numpy(near),
            torch.from_numpy(far),
            n_samples,
            stratified=False,
            solid_background=solid,
        )
        np.testing.assert_allclose(np.asarray(dists_j), dists_t.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(pts_j), pts_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(w_j), w_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(op_j), op_t.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(rgb_j), rgb_t.numpy(), atol=1e-5)
        if solid:
            np.testing.assert_allclose(np.asarray(op_j), np.ones_like(np.asarray(op_j)), atol=1e-5)


def test_volume_render_is_differentiable():
    # the torch reference relies on autograd; check jax.grad flows through
    center = jnp.zeros((4, 3))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1))
    near = jnp.full((4, 1), 0.1)
    far = jnp.full((4, 1), 2.0)

    def loss(w):
        def nerf(points, rays):
            return jnp.tanh(points * w), jax.nn.softplus(points[..., :1] * w)

        rgb, *_ = cm.volume_render_rays(nerf, center, d, near, far, 5)
        return jnp.sum(rgb**2)

    g = jax.grad(loss)(1.3)
    assert np.isfinite(float(g)) and abs(float(g)) > 0
