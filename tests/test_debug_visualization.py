"""Annotation replay viewer + assembler debug panels (the reference's
visualize_saved_correspondences.py and SpartanDataset(debug=True) analogs),
headless on the synthetic dataset."""

import os

import numpy as np
import pytest

from pdc_tpu.apps.annotate_correspondences import (
    make_annotation_entry,
    save_annotations,
)
from pdc_tpu.apps.debug_visualization import (
    debug_batch_panels,
    visualize_saved_correspondences,
)
from pdc_tpu.data.dataset import SpartanDataset

W, H = 64, 48


@pytest.fixture(scope="module")
def dataset():
    return SpartanDataset.make_synthetic(
        num_scenes=2, num_objects=2, width=W, height=H, num_frames=4)


def _png_shape(path):
    from PIL import Image

    with Image.open(path) as im:
        return im.size  # (W, H)


def test_visualize_saved_correspondences_headless(tmp_path, dataset):
    anns = [
        make_annotation_entry("scene_000", 0, [(10, 12), (30, 20)],
                              "scene_001", 1, [(11, 13), (31, 21)]),
        make_annotation_entry("scene_000", 2, [(5, 5)],
                              "scene_000", 3, [(6, 6)]),
    ]
    yaml_path = str(tmp_path / "new_annotated_pairs.yaml")
    save_annotations(anns, yaml_path)

    out = str(tmp_path / "replay")
    paths = visualize_saved_correspondences(dataset, yaml_path,
                                            output_dir=out)
    assert len(paths) == 4  # a+b per pair
    for p in paths:
        assert os.path.exists(p)
        assert _png_shape(p) == (W, H)

    # reticles actually modified the pixels around the annotation
    from PIL import Image

    rendered = np.asarray(Image.open(paths[0]))
    original = np.asarray(dataset.get_rgbd_mask_pose("scene_000", 0)[0])
    assert (rendered != original).any()


def test_visualize_saved_correspondences_empty(dataset, tmp_path):
    assert visualize_saved_correspondences(dataset, [], output_dir=str(tmp_path)) == []


def test_debug_batch_panels_within_scene(tmp_path, dataset):
    out = str(tmp_path / "panels")
    results = debug_batch_panels(dataset, 2, out, seed=0, match_type=0)
    assert len(results) == 2
    for match_type, paths in results:
        assert match_type == 0
        names = {os.path.basename(p).split("_", 2)[-1] for p in paths}
        assert names == {"matches.png", "masked_non_matches.png",
                         "background_non_matches.png",
                         "blind_non_matches.png", "masks.png"}
        for p in paths:
            assert os.path.getsize(p) > 1000


def test_debug_batch_panels_synthetic_multi_object(tmp_path, dataset):
    out = str(tmp_path / "panels_smo")
    results = debug_batch_panels(dataset, 1, out, seed=1, match_type=4)
    (match_type, paths), = results
    assert match_type == 4
    assert all(os.path.exists(p) for p in paths)
