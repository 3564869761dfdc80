"""Pure-numpy reference oracles for the projective correspondence math.

Plays the role of the reference's ``test/numpy_correspondence_finder.py``
(a slow single-pixel implementation used to validate the vectorized path) —
written independently from first principles of the pinhole model so that the
jitted XLA implementation is checked against a second derivation, not against
itself.
"""

import numpy as np

DEPTH_SCALE = 1000.0
OCCLUSION_MARGIN = 0.003


def oracle_unproject(u, v, z, K):
    K_inv = np.linalg.inv(K)
    return z * (K_inv @ np.array([u, v, 1.0]))


def oracle_project(p_cam, K):
    scaled = np.array([p_cam[0] / p_cam[2], p_cam[1] / p_cam[2], 1.0])
    uv = (K @ scaled)[:2]
    return uv, p_cam[2]


def oracle_correspondence(u_a, v_a, depth_a, pose_a, depth_b, pose_b, K):
    """Single-pixel correspondence: returns (u_b, v_b) floats or None if the
    candidate fails any of the three validity stages."""
    H, W = depth_a.shape
    z_a = float(depth_a[v_a, u_a])
    if not np.issubdtype(depth_a.dtype, np.floating):
        z_a /= DEPTH_SCALE
    if z_a <= 0:
        return None  # stage 1: no depth return

    p_cam_a = oracle_unproject(u_a, v_a, z_a, K)
    p_world = pose_a[:3, :3] @ p_cam_a + pose_a[:3, 3]
    world_to_b = np.linalg.inv(pose_b)
    p_cam_b = world_to_b[:3, :3] @ p_world + world_to_b[:3, 3]
    if p_cam_b[2] <= 0:
        return None
    uv_b, z_b = oracle_project(p_cam_b, K)

    eps = 1e-3
    if not (0.0 <= uv_b[0] <= W - eps and 0.0 <= uv_b[1] <= H - eps):
        return None  # stage 2: out of FOV

    u_b_int, v_b_int = int(uv_b[0]), int(uv_b[1])
    z_rendered = float(depth_b[v_b_int, u_b_int])
    if not np.issubdtype(depth_b.dtype, np.floating):
        z_rendered /= DEPTH_SCALE
    if z_rendered <= 0 or z_rendered < z_b - OCCLUSION_MARGIN:
        return None  # stage 3: occluded or no b return

    return uv_b
