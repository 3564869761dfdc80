"""LabelFusion legacy dataset support.

Rebuild of ``dataset/labelfusion_masked.py:5-58``: reads raw LabelFusion logs
(ElasticFusion output) where poses live in a ``posegraph.posegraph`` text file
(one line per frame: utime x y z qx qy qz qw) and images are
``images/%010d_*.png`` keyed by utime.
"""

from __future__ import annotations

import os
from typing import List

import numpy as np

from pdc_tpu.geom.transforms import se3_from_quat_trans


def load_posegraph(posegraph_file: str) -> List[dict]:
    """Parse an ElasticFusion posegraph: returns [{utime, camera_to_world}].

    Line format: ``utime x y z qx qy qz qw`` (translation + xyzw quaternion,
    converted here to our wxyz convention).
    """
    entries = []
    with open(posegraph_file) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 8:
                continue
            utime = int(float(parts[0]))
            x, y, z = map(float, parts[1:4])
            qx, qy, qz, qw = map(float, parts[4:8])
            T = se3_from_quat_trans([qw, qx, qy, qz], [x, y, z])
            entries.append({"utime": utime, "camera_to_world": T})
    return entries


class LabelFusionScene:
    """One LabelFusion log directory: images/ + posegraph.posegraph."""

    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        self.posegraph = load_posegraph(
            os.path.join(log_dir, "posegraph.posegraph")
        )

    @property
    def num_frames(self):
        return len(self.posegraph)

    def pose(self, idx: int) -> np.ndarray:
        return self.posegraph[idx]["camera_to_world"]

    def _image_path(self, idx: int, suffix: str):
        utime = self.posegraph[idx]["utime"]
        return os.path.join(self.log_dir, "images", "%010d_%s" % (utime, suffix))

    def rgb_path(self, idx: int):
        return self._image_path(idx, "rgb.png")

    def depth_path(self, idx: int):
        return self._image_path(idx, "depth.png")

    def mask_path(self, idx: int):
        return self._image_path(idx, "labels.png")

    def load_frame(self, idx: int):
        from PIL import Image

        rgb = np.asarray(Image.open(self.rgb_path(idx)).convert("RGB"))
        depth = np.asarray(Image.open(self.depth_path(idx))).astype(np.uint16)
        mask_p = self.mask_path(idx)
        if os.path.exists(mask_p):
            mask = (np.asarray(Image.open(mask_p)) > 0).astype(np.uint8)
        else:
            mask = np.ones(depth.shape, np.uint8)
        return rgb, depth, mask, self.pose(idx)

    def to_scene_data(self, name: str, K: np.ndarray, object_id=None):
        """Materialize as an in-memory SceneData usable by SpartanDataset."""
        from pdc_tpu.data.dataset import SceneData

        frames = [self.load_frame(i) for i in range(self.num_frames)]
        return SceneData(
            name=name,
            rgb=np.stack([f[0] for f in frames]),
            depth=np.stack([f[1] for f in frames]),
            mask=np.stack([f[2] for f in frames]),
            poses=np.stack([f[3] for f in frames]),
            K=np.asarray(K),
            object_id=object_id,
        )
