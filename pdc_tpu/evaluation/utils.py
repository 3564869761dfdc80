"""Evaluation utilities.

Rebuild of ``dense_correspondence/evaluation/utils.py:13-160``: the guarded
DataFrame row wrapper, the keypoint-annotation -> DataFrame converter, and
batch descriptor-image export for a scene.
"""

from __future__ import annotations

from typing import List


class PandaDataFrameWrapper:
    """Dict-backed row builder that only accepts known columns
    (reference PandaDataFrameWrapper, utils.py:13-38)."""

    def __init__(self, columns: List[str]):
        self._columns = list(columns)
        self._data = {c: None for c in columns}

    def set_value(self, key, value):
        if key not in self._data:
            raise KeyError(f"unknown column {key!r}")
        self._data[key] = value

    def get_value(self, key):
        return self._data[key]

    @property
    def dataframe(self):
        import pandas as pd

        return pd.DataFrame([self._data], columns=self._columns)

    def row(self):
        return dict(self._data)


def convert_keypoint_annotations_to_dataframe(annotations: list):
    """Flatten the labeler's annotated-pairs YAML into one row per labeled
    keypoint (reference utils.py:42-105).

    Each annotation dict holds image_a/image_b with scene_name, image_idx and
    a pixels list (optionally carrying 'keypoint' names).
    """
    import pandas as pd

    rows = []
    for ann in annotations:
        ia, ib = ann["image_a"], ann["image_b"]
        n = min(len(ia["pixels"]), len(ib["pixels"]))
        for i in range(n):
            pa, pb = ia["pixels"][i], ib["pixels"][i]
            rows.append({
                "scene_name_a": ia["scene_name"],
                "image_a_idx": int(ia["image_idx"]),
                "u_a": int(pa["u"]), "v_a": int(pa["v"]),
                "scene_name_b": ib["scene_name"],
                "image_b_idx": int(ib["image_idx"]),
                "u_b": int(pb["u"]), "v_b": int(pb["v"]),
                "keypoint_name": pa.get("keypoint"),
            })
    return pd.DataFrame(rows)


def extract_descriptor_images_for_scene(dcn, dataset, scene_name: str,
                                        output_dir: str, batch_size: int = 8):
    """Batch-export descriptor .npy images for every frame of one scene
    (reference utils.py:109-160)."""
    from pdc_tpu.apps.compute_descriptor_images import (
        compute_descriptor_images_for_scene,
    )

    scene = dataset.get_scene(scene_name)
    return compute_descriptor_images_for_scene(dcn, scene, output_dir, batch_size)
