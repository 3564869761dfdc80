"""Descriptor-video maker (reference evaluation/make_video.ipynb)."""

import copy
import os

import numpy as np
import pytest

from pdc_tpu.data.dataset import SpartanDataset
from pdc_tpu.training.train import DenseCorrespondenceTraining

W, H = 64, 48

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def video_setup(tmp_path_factory):
    ds = SpartanDataset.make_synthetic(
        num_scenes=1, width=W, height=H, num_frames=5, object_radius=0.3)
    cfg = copy.deepcopy(DenseCorrespondenceTraining.load_default_config())
    t = cfg["training"]
    t.update(num_iterations=2, batch_size=1, num_matching_attempts=128,
             num_non_matches_per_match=5, save_rate=1000, logging_rate=1000,
             logging_dir=str(tmp_path_factory.mktemp("models")),
             logging_dir_name="video_net")
    net = cfg["dense_correspondence_network"]
    net["image_width"] = W
    net["image_height"] = H
    net["backbone"]["resnet_name"] = "Resnet18_8s"
    trainer = DenseCorrespondenceTraining(config=cfg, dataset=ds)
    return trainer.run(), ds


def test_make_descriptor_video_frames(video_setup, tmp_path):
    from pdc_tpu.apps.make_descriptor_video import run

    model_folder, ds = video_setup
    out_dir = str(tmp_path / "videos")
    results = run(model_folder, ds, output_dir=out_dir, batch_size=4,
                  masked=True)
    (name, info), = results.items()
    assert info["frames"] == 5
    frame_dir = os.path.join(out_dir, name, "video_images")
    for idx in range(5):
        for kind in ("rgb", "res", "res_masked"):
            path = os.path.join(frame_dir, "%06d_%s.png" % (idx, kind))
            assert os.path.getsize(path) > 0, path

    # normalized descriptor frames are consistent across calls (same stats)
    from PIL import Image

    res0 = np.asarray(Image.open(os.path.join(frame_dir, "000000_res.png")))
    assert res0.shape == (H, W, 3)
    assert res0.max() > res0.min()  # not a constant image
    # masked frame is zero outside the object mask
    masked = np.asarray(
        Image.open(os.path.join(frame_dir, "000000_res_masked.png")))
    outside = np.asarray(ds.scenes[name].mask[0]) == 0
    assert masked[outside].max() == 0
