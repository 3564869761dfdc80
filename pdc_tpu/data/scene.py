"""Path schema and metadata for a processed pdc scene log.

Rebuild of the reference's ``dataset/scene_structure.py:5-124`` plus the pose
/ camera-info parsing from ``dense_correspondence_dataset_masked.py:225-373``:
a processed scene directory looks like

    <scene>/processed/
        images/%06d_rgb.png           RGB frames
        images/pose_data.yaml         camera-to-world per frame
        images/camera_info.yaml       pinhole intrinsics
        rendered_images/%06d_depth.png  uint16 depth (mm), mesh-rendered
        image_masks/%06d_mask.png     object masks
        fusion_mesh.ply               TSDF mesh (not needed by training)
"""

from __future__ import annotations

import os

import numpy as np

from pdc_tpu.geom.camera import CameraIntrinsics
from pdc_tpu.geom.transforms import se3_from_dict
from pdc_tpu.utils.yaml_io import load_yaml


class SceneStructure:
    def __init__(self, processed_folder: str):
        self._processed_folder = processed_folder

    @property
    def processed_folder(self):
        return self._processed_folder

    @property
    def images_dir(self):
        return os.path.join(self._processed_folder, "images")

    @property
    def rendered_images_dir(self):
        return os.path.join(self._processed_folder, "rendered_images")

    @property
    def masks_dir(self):
        return os.path.join(self._processed_folder, "image_masks")

    @property
    def fusion_mesh_filename(self):
        return os.path.join(self._processed_folder, "fusion_mesh.ply")

    @property
    def camera_info_filename(self):
        return os.path.join(self.images_dir, "camera_info.yaml")

    @property
    def pose_data_filename(self):
        return os.path.join(self.images_dir, "pose_data.yaml")

    # -- per-frame files -----------------------------------------------------

    def rgb_image_filename(self, idx: int):
        return os.path.join(self.images_dir, "%06d_rgb.png" % idx)

    def depth_image_filename(self, idx: int):
        return os.path.join(self.rendered_images_dir, "%06d_depth.png" % idx)

    def mask_image_filename(self, idx: int):
        return os.path.join(self.masks_dir, "%06d_mask.png" % idx)

    def descriptor_image_filename(self, network_name: str, idx: int):
        """Per-network precomputed descriptor images
        (scene_structure.py:100-124)."""
        return os.path.join(
            self._processed_folder,
            "descriptor_images",
            network_name,
            "%06d_descriptor.npy" % idx,
        )

    # -- metadata ------------------------------------------------------------

    def load_camera_intrinsics(self) -> CameraIntrinsics:
        return CameraIntrinsics.from_yaml_file(self.camera_info_filename)

    def load_pose_data(self):
        """Returns {frame_idx: 4x4 camera-to-world} as numpy arrays."""
        raw = load_yaml(self.pose_data_filename)
        return {
            int(idx): np.asarray(se3_from_dict(entry["camera_to_world"]))
            for idx, entry in raw.items()
        }

    def frame_indices(self):
        """Sorted frame indices present on disk (from the rgb images)."""
        out = []
        if not os.path.isdir(self.images_dir):
            return out
        for f in os.listdir(self.images_dir):
            if f.endswith("_rgb.png"):
                out.append(int(f.split("_")[0]))
        return sorted(out)
