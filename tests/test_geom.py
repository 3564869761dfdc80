"""Geometry core vs numpy oracle."""

import numpy as np
import jax.numpy as jnp

from pdc_tpu.geom.camera import (
    CameraIntrinsics,
    default_K_matrix,
    flat_to_uv,
    project_to_image,
    unproject_to_camera,
    uv_to_flat,
)
from pdc_tpu.geom.transforms import (
    invert_se3,
    pose_angle,
    pose_distance,
    quaternion_from_matrix,
    quaternion_matrix,
    se3_from_dict,
    se3_from_quat_trans,
    transform_points,
)
from oracle import oracle_project, oracle_unproject


def test_unproject_project_roundtrip(rng):
    K = default_K_matrix()
    uv = rng.uniform([0, 0], [640, 480], size=(100, 2)).astype(np.float32)
    z = rng.uniform(0.3, 3.0, size=100).astype(np.float32)
    pts = unproject_to_camera(uv, z, K)
    uv2, z2 = project_to_image(pts, K)
    np.testing.assert_allclose(np.asarray(uv2), uv, rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(z2), z, rtol=1e-5)


def test_unproject_matches_oracle(rng):
    K = default_K_matrix()
    for _ in range(20):
        u, v = rng.randint(0, 640), rng.randint(0, 480)
        z = rng.uniform(0.3, 3.0)
        ours = np.asarray(unproject_to_camera(np.array([u, v]), np.array(z), K))
        theirs = oracle_unproject(u, v, z, K)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_project_matches_oracle(rng):
    K = default_K_matrix()
    for _ in range(20):
        p = rng.uniform([-1, -1, 0.3], [1, 1, 3.0])
        uv_ours, z_ours = project_to_image(p, K)
        uv_oracle, z_oracle = oracle_project(p, K)
        np.testing.assert_allclose(np.asarray(uv_ours), uv_oracle, rtol=1e-4, atol=1e-3)
        assert abs(float(z_ours) - z_oracle) < 1e-5


def test_quaternion_roundtrip(rng):
    for _ in range(50):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        R = quaternion_matrix(q)
        # valid rotation
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        assert np.linalg.det(R) > 0.999
        q2 = quaternion_from_matrix(R)
        # q and -q are the same rotation
        if np.dot(q, q2) < 0:
            q2 = -q2
        np.testing.assert_allclose(q, q2, atol=1e-8)


def test_se3_invert_and_transform(rng):
    q = rng.randn(4)
    T = se3_from_quat_trans(q / np.linalg.norm(q), rng.randn(3))
    T_inv = invert_se3(T)
    np.testing.assert_allclose(T @ T_inv, np.eye(4), atol=1e-10)

    pts = rng.randn(10, 3).astype(np.float32)
    out = np.asarray(transform_points(jnp.asarray(T), pts))
    expected = (T[:3, :3] @ pts.T).T + T[:3, 3]
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)

    back = np.asarray(transform_points(jnp.asarray(invert_se3(T)), out))
    np.testing.assert_allclose(back, pts, rtol=1e-3, atol=1e-4)


def test_se3_from_dict():
    d = {
        "quaternion": {"w": 1.0, "x": 0.0, "y": 0.0, "z": 0.0},
        "translation": {"x": 1.0, "y": 2.0, "z": 3.0},
    }
    T = se3_from_dict(d)
    np.testing.assert_allclose(T[:3, :3], np.eye(3))
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3])


def test_pose_distance_and_angle():
    T_a = np.eye(4)
    T_b = np.eye(4)
    T_b[:3, 3] = [3.0, 4.0, 0.0]
    assert abs(pose_distance(T_a, T_b) - 5.0) < 1e-12
    # 90 degree rotation about z
    T_c = np.eye(4)
    T_c[:3, :3] = quaternion_matrix([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    assert abs(pose_angle(T_a, T_c) - np.pi / 2) < 1e-6


def test_flat_index_convention():
    W = 640
    uv = jnp.array([[3, 2], [0, 0], [639, 479]])
    flat = uv_to_flat(uv, W)
    np.testing.assert_array_equal(np.asarray(flat), [2 * 640 + 3, 0, 479 * 640 + 639])
    back = flat_to_uv(flat, W)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(uv))


def test_camera_intrinsics_from_dict():
    cfg = {
        "camera_matrix": {"data": [500.0, 0, 320.0, 0, 501.0, 240.0, 0, 0, 1]},
        "image_width": 640,
        "image_height": 480,
    }
    ci = CameraIntrinsics.from_dict(cfg)
    assert ci.fx == 500.0 and ci.fy == 501.0 and ci.cx == 320.0 and ci.cy == 240.0
    K = ci.K
    assert K[0, 0] == 500.0 and K[1, 2] == 240.0
