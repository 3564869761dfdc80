"""Pinhole camera model — pure-jnp, batched over pixels.

Replaces the reference's per-call numpy/torch pinhole math
(``correspondence_finder.py:123-248``, ``utils.py:395-427`` CameraIntrinsics).
All functions are shape-polymorphic over leading axes and jit-safe.

Conventions (same as the reference, see its doc/coordinate_conventions.md):
  * pixel coordinates are (u, v) = (column/right, row/down)
  * camera frame is RDF (x right, y down, z forward)
  * a flattened pixel index is n = v * W + u
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CameraIntrinsics:
    """Host-side container for a pinhole camera matrix.

    Mirrors the reference's ``CameraIntrinsics`` (utils.py:395-427) including
    the ``camera_info.yaml`` parsing contract (``camera_matrix.data`` is a
    row-major 9-vector).
    """

    cx: float
    cy: float
    fx: float
    fy: float
    width: int
    height: int

    @property
    def K(self) -> np.ndarray:
        K = np.zeros((3, 3), dtype=np.float64)
        K[0, 0] = self.fx
        K[1, 1] = self.fy
        K[0, 2] = self.cx
        K[1, 2] = self.cy
        K[2, 2] = 1.0
        return K

    @staticmethod
    def from_yaml_file(filename: str) -> "CameraIntrinsics":
        from pdc_tpu.utils.yaml_io import load_yaml

        config = load_yaml(filename)
        return CameraIntrinsics.from_dict(config)

    @staticmethod
    def from_dict(config: dict) -> "CameraIntrinsics":
        fx = config["camera_matrix"]["data"][0]
        cx = config["camera_matrix"]["data"][2]
        fy = config["camera_matrix"]["data"][4]
        cy = config["camera_matrix"]["data"][5]
        width = config["image_width"]
        height = config["image_height"]
        return CameraIntrinsics(cx=cx, cy=cy, fx=fx, fy=fy, width=width, height=height)

    @staticmethod
    def from_K(K, width: int, height: int) -> "CameraIntrinsics":
        K = np.asarray(K)
        return CameraIntrinsics(
            cx=float(K[0, 2]), cy=float(K[1, 2]),
            fx=float(K[0, 0]), fy=float(K[1, 1]),
            width=width, height=height,
        )


def default_K_matrix() -> np.ndarray:
    """The reference's hard-coded default intrinsics
    (correspondence_finder.py:36-43), kept for parity."""
    K = np.zeros((3, 3))
    K[0, 0] = 533.6422696034836
    K[1, 1] = 534.7824445233571
    K[0, 2] = 319.4091030774892
    K[1, 2] = 236.4374299691866
    K[2, 2] = 1.0
    return K


def unproject_to_camera(uv, z, K):
    """Lift pixels to camera-frame 3D points.

    :param uv: [..., 2] pixel coordinates (u, v); float or int
    :param z:  [...] metric depth along the optical axis (z > 0)
    :param K:  [3, 3] intrinsics
    :return:   [..., 3] points in the camera (RDF) frame

    p = z * K^{-1} [u, v, 1]^T   (correspondence_finder.py:147-166)
    """
    uv = jnp.asarray(uv, dtype=jnp.float32)
    z = jnp.asarray(z, dtype=jnp.float32)
    ones = jnp.ones_like(uv[..., :1])
    uv1 = jnp.concatenate([uv, ones], axis=-1)  # [..., 3]
    K_inv = jnp.linalg.inv(jnp.asarray(K, dtype=jnp.float32))
    rays = uv1 @ K_inv.T  # [..., 3]
    return rays * z[..., None]


def project_to_image(points_cam, K):
    """Project camera-frame points to pixel coordinates.

    :param points_cam: [..., 3] points in the camera (RDF) frame
    :param K: [3, 3] intrinsics
    :return: (uv [..., 2] float32, z [...] float32) — z is the camera-frame
        depth (the caller decides how to treat z <= 0)
    """
    points_cam = jnp.asarray(points_cam, dtype=jnp.float32)
    K = jnp.asarray(K, dtype=jnp.float32)
    proj = points_cam @ K.T  # [..., 3]
    z = points_cam[..., 2]
    # Safe divide; invalid pixels are masked by the caller via z.
    denom = jnp.where(jnp.abs(proj[..., 2:3]) < 1e-12, 1e-12, proj[..., 2:3])
    uv = proj[..., :2] / denom
    return uv, z


def uv_to_flat(uv, image_width):
    """(u, v) -> n = v * W + u  (reference utils.py:312-330; load-bearing
    convention shared by the loss gathers and the network's flattened view)."""
    uv = jnp.asarray(uv)
    return uv[..., 1].astype(jnp.int32) * image_width + uv[..., 0].astype(jnp.int32)


def flat_to_uv(flat, image_width):
    """n -> (u, v) with u = n % W, v = n // W."""
    flat = jnp.asarray(flat, dtype=jnp.int32)
    u = flat % image_width
    v = flat // image_width
    return jnp.stack([u, v], axis=-1)
