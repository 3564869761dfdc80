"""Fused-scene reconstruction access.

Rebuild of ``modules/.../fusion/fusion_reconstruction.py:81-398``
(FusionReconstruction / TSDFReconstruction / CameraPoses): loads the TSDF
fusion mesh and camera pose graph of a processed scene and serves
``get_camera_to_world(idx)`` lookups plus crop-box-filtered geometry — the
inputs of the change-detection pipeline. VTK is replaced by the minimal PLY
vertex reader + numpy; rendering goes through
:mod:`pdc_tpu.pipeline.renderer`.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from pdc_tpu.data.scene import SceneStructure
from pdc_tpu.pipeline.change_detection import CropBox
from pdc_tpu.pipeline.renderer import mesh_vertices_from_ply


class CameraPoses:
    """Pose-graph lookup (reference CameraPoses, fusion_reconstruction.py:81)."""

    def __init__(self, pose_map: dict):
        self._pose_map = dict(pose_map)

    @staticmethod
    def from_scene(structure: SceneStructure) -> "CameraPoses":
        return CameraPoses(structure.load_pose_data())

    def get_camera_to_world(self, idx: int) -> np.ndarray:
        return self._pose_map[idx]

    @property
    def indices(self):
        return sorted(self._pose_map.keys())

    def __len__(self):
        return len(self._pose_map)


class TSDFReconstruction:
    """A fused scene: mesh vertices + camera poses + intrinsics
    (reference TSDFReconstruction, fusion_reconstruction.py:305)."""

    def __init__(self, points: np.ndarray, poses: CameraPoses,
                 intrinsics, crop_box: Optional[CropBox] = None,
                 faces: Optional[np.ndarray] = None):
        self._all_points = np.asarray(points, np.float32)
        self.faces = None if faces is None else np.asarray(faces, np.int32)
        self.poses = poses
        self.intrinsics = intrinsics
        self.crop_box = crop_box

    @staticmethod
    def from_data_folder(processed_folder: str,
                         crop_box: Optional[CropBox] = None) -> "TSDFReconstruction":
        from pdc_tpu.pipeline.renderer import read_ply_mesh

        structure = SceneStructure(processed_folder)
        mesh_file = structure.fusion_mesh_filename
        if not os.path.exists(mesh_file):
            raise FileNotFoundError(mesh_file)
        points, faces = read_ply_mesh(mesh_file)
        return TSDFReconstruction(
            points, CameraPoses.from_scene(structure),
            structure.load_camera_intrinsics(), crop_box=crop_box, faces=faces,
        )

    @property
    def points(self) -> np.ndarray:
        """Crop-box-filtered geometry (the 'foreground' object points)."""
        if self.crop_box is None:
            return self._all_points
        return self.crop_box.filter(self._all_points)

    @property
    def all_points(self) -> np.ndarray:
        return self._all_points

    def get_camera_to_world(self, idx: int) -> np.ndarray:
        return self.poses.get_camera_to_world(idx)

    def render_depth(self, idx: int, cropped: bool = False, splat_radius: int = 1):
        """Depth render at frame ``idx``'s pose — triangle rasterization
        when the mesh has faces, point-splat z-buffer otherwise."""
        import jax.numpy as jnp

        from pdc_tpu.pipeline.renderer import (
            pick_raster_tile,
            render_depth_from_mesh,
            render_depth_from_points,
        )

        pose = jnp.asarray(self.get_camera_to_world(idx), jnp.float32)
        K = jnp.asarray(self.intrinsics.K, jnp.float32)
        H, W = self.intrinsics.height, self.intrinsics.width
        if self.faces is not None:
            faces = self.faces
            if cropped and self.crop_box is not None:
                inside = self.crop_box.contains(self._all_points)
                faces = faces[np.any(inside[faces], axis=1)]
            # per-frame API: the static-shape scatter path compiles once per
            # tile value; the sort-based path's per-pose face bins would
            # change input shapes (and recompile) on every call — it is the
            # right tool only for whole-scene batched renders
            tile = pick_raster_tile(self._all_points, faces,
                                    np.asarray(pose), np.asarray(K), H, W)
            d = render_depth_from_mesh(
                jnp.asarray(self._all_points), jnp.asarray(faces), pose, K, H,
                W, tile=tile)
        else:
            pts = self.points if cropped else self._all_points
            d = render_depth_from_points(
                jnp.asarray(pts), pose, K, H, W, splat_radius=splat_radius)
        return np.asarray(d)


# The reference's ElasticFusion-era base class reads the same data through a
# posegraph file; our LabelFusion support covers that path.
FusionReconstruction = TSDFReconstruction
