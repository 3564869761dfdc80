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


def test_detect_flip():
    """Flip detection aligns displayed masks/depths with the assembler's
    post-flip indices (code-review finding: mask panels previously mixed
    frames when flip augmentation fired)."""
    from pdc_tpu.apps.debug_visualization import detect_flip

    h, w = 8, 10
    mask = np.zeros((h, w), np.uint8)
    mask[1:3, 1:4] = 1  # asymmetric blob
    on_mask = np.flatnonzero(mask.reshape(-1))
    valid = np.ones(on_mask.size, bool)
    assert detect_flip(on_mask, valid, mask) is False
    flipped_idx = h * w - 1 - on_mask  # 180-rotated coordinates
    assert detect_flip(flipped_idx, valid, mask) is True
    assert detect_flip(on_mask, np.zeros_like(valid), mask) is False


def test_debug_batch_panels_with_flip_augmentation(tmp_path, dataset):
    """Panels render under the default augmenting config (flip + domain
    randomization active) without frame-mixing errors."""
    from pdc_tpu.data.assembler import AssemblerConfig

    cfg = AssemblerConfig(num_matching_attempts=500,
                          num_masked_non_matches_per_match=3,
                          num_background_non_matches_per_match=3,
                          num_blind_samples=200,
                          flip_augmentation=True, domain_randomize=True)
    out = str(tmp_path / "panels_flip")
    results = debug_batch_panels(dataset, 3, out, seed=5, cfg=cfg,
                                 match_type=0)
    assert len(results) == 3
    for _, paths in results:
        assert all(os.path.getsize(p) > 1000 for p in paths)
