"""SE(3) / quaternion utilities.

A compact, original implementation of the subset of rigid-transform math the
framework needs (the reference vendors the 1,900-line Gohlke
``transformations.py``; we need only quaternion<->matrix, SE(3) compose/invert,
and pose distances — reference call sites: ``utils.py:204-275``).

Quaternion convention: (w, x, y, z), matching the reference's pose_data.yaml
files (``utils.py:204-225`` homogenous_transform_from_dict).

Host-side variants operate on numpy; the jnp variants are jit-safe.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def quaternion_matrix(q):
    """Rotation matrix (3x3, numpy) from a (not necessarily unit) quaternion
    (w, x, y, z)."""
    q = np.asarray(q, dtype=np.float64)
    n = np.dot(q, q)
    if n < 1e-12:
        return np.eye(3)
    w, x, y, z = q / np.sqrt(n)
    return _quat_to_mat_np(w, x, y, z)


def _quat_to_mat_np(w, x, y, z):
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def quaternion_from_matrix(R):
    """Quaternion (w, x, y, z) from a 3x3 (or 4x4) rotation matrix, numpy.

    Uses Shepperd's numerically-stable branch selection.
    """
    R = np.asarray(R, dtype=np.float64)[:3, :3]
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2.0
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2.0
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2.0
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2.0
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def se3_from_quat_trans(quat_wxyz, translation):
    """4x4 homogeneous transform (numpy) from quaternion + translation."""
    T = np.eye(4)
    w, x, y, z = np.asarray(quat_wxyz, dtype=np.float64)
    T[:3, :3] = _quat_to_mat_np(w, x, y, z)
    T[:3, 3] = np.asarray(translation, dtype=np.float64)
    return T


def se3_from_dict(d):
    """4x4 camera-to-world transform from a pose_data.yaml entry.

    Format (reference utils.py:204-225):
        {"quaternion": {"w": .., "x": .., "y": .., "z": ..},
         "translation": {"x": .., "y": .., "z": ..}}

    The rotation key may be spelled ``quaternion``, ``orientation`` or
    ``rotation`` depending on the producing convention (reference
    utils.getQuaternionFromDict, utils.py:78-95).
    """
    q = None
    for name in ("quaternion", "orientation", "rotation"):
        if name in d:
            q = d[name]
            break
    if q is None:
        raise ValueError(
            "pose dict has no quaternion/orientation/rotation key: "
            f"{sorted(d)}")
    t = d["translation"]
    return se3_from_quat_trans(
        [q["w"], q["x"], q["y"], q["z"]], [t["x"], t["y"], t["z"]]
    )


def dict_from_se3(T):
    """Inverse of :func:`se3_from_dict` (used when writing synthetic scenes)."""
    T = np.asarray(T)
    q = quaternion_from_matrix(T[:3, :3])
    return {
        "quaternion": {"w": float(q[0]), "x": float(q[1]), "y": float(q[2]), "z": float(q[3])},
        "translation": {"x": float(T[0, 3]), "y": float(T[1, 3]), "z": float(T[2, 3])},
    }


def invert_se3(T):
    """Invert a 4x4 homogeneous transform. Works for numpy and jnp inputs.

    Reference: correspondence_finder.py:52-60 ``invert_transform``.
    """
    xp = jnp if isinstance(T, jnp.ndarray) else np
    R = T[:3, :3]
    t = T[:3, 3]
    Rt = xp.swapaxes(R, -1, -2)
    out = xp.eye(4, dtype=T.dtype)
    if xp is jnp:
        out = out.at[:3, :3].set(Rt)
        out = out.at[:3, 3].set(-Rt @ t)
    else:
        out = out.copy()
        out[:3, :3] = Rt
        out[:3, 3] = -Rt @ t
    return out


def transform_points(T, points):
    """Apply a 4x4 homogeneous transform to [..., 3] points (jnp, jit-safe).

    Reference: correspondence_finder.py:62-66 ``apply_transform_torch``.
    """
    points = jnp.asarray(points, dtype=jnp.float32)
    T = jnp.asarray(T, dtype=jnp.float32)
    return points @ T[:3, :3].T + T[:3, 3]


def pose_distance(T_a, T_b):
    """Euclidean distance between translations (reference utils.py:227-246)."""
    T_a, T_b = np.asarray(T_a), np.asarray(T_b)
    return float(np.linalg.norm(T_a[:3, 3] - T_b[:3, 3]))


def pose_angle(T_a, T_b):
    """Relative rotation angle in radians (reference utils.py:248-275
    ``compute_angle_between_poses``)."""
    T_a, T_b = np.asarray(T_a), np.asarray(T_b)
    R_rel = T_a[:3, :3].T @ T_b[:3, :3]
    c = (np.trace(R_rel) - 1.0) / 2.0
    return float(np.arccos(np.clip(c, -1.0, 1.0)))
