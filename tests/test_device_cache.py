"""Device HBM dataset cache + cached train step."""

import jax
import numpy as np
import pytest

from pdc_tpu.data.assembler import AssemblerConfig
from pdc_tpu.data.dataset import SpartanDataset
from pdc_tpu.data.device_cache import DeviceCache, make_cached_train_step
from pdc_tpu.losses.pixelwise_contrastive import LossConfig

W, H = 64, 48


@pytest.fixture(scope="module")
def dataset():
    return SpartanDataset.make_synthetic(num_scenes=2, width=W, height=H, num_frames=6)


@pytest.fixture(scope="module")
def cache(dataset):
    return DeviceCache.from_dataset(dataset)


def test_cache_upload_and_gather(dataset, cache):
    assert cache.rgb.shape == (12, H, W, 3)
    idx = cache.sample_index_batch(3)
    assert idx["frame_a"].shape == (3,)
    batch = cache.gather(idx)
    assert batch["rgb_a"].shape == (3, H, W, 3)
    # gathered frames must equal the dataset's frames
    scene = dataset.get_scene("scene_000")
    got = np.asarray(cache.gather({
        "frame_a": np.array([2], np.int32), "frame_b": np.array([3], np.int32),
        "match_type": np.array([0], np.int32),
        "pose_a": scene.poses[2:3].astype(np.float32),
        "pose_b": scene.poses[3:4].astype(np.float32),
        "K": scene.K[None].astype(np.float32),
    })["rgb_a"])
    np.testing.assert_array_equal(got[0], scene.rgb[2])


def test_cache_budget_guard(dataset):
    with pytest.raises(MemoryError):
        DeviceCache.from_dataset(dataset, max_bytes=1000)


@pytest.mark.slow
def test_cached_train_step_runs_and_learns(dataset, cache):
    from pdc_tpu.models.dcn import build_backbone
    from pdc_tpu.training.train import create_train_state

    config = {
        "training": {"learning_rate": 1e-3, "learning_rate_decay": 0.9,
                     "steps_between_learning_rate_decay": 250,
                     "weight_decay": 1e-4},
        "dense_correspondence_network": {
            "descriptor_dimension": 3,
            "backbone": {"model_class": "Resnet", "resnet_name": "Resnet18_8s"},
        },
    }
    model = build_backbone(config["dense_correspondence_network"])
    state, tx = create_train_state(model, config, jax.random.PRNGKey(0), (H, W))
    acfg = AssemblerConfig(
        num_matching_attempts=256,
        masked_pool_size=128, background_pool_size=128,
        num_blind_samples=64,
    )
    step = make_cached_train_step(model, tx, LossConfig(), acfg, W, cache)

    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(12):
        idx = cache.sample_index_batch(2)
        key, sub = jax.random.split(key)
        state, metrics = step(state, idx, sub)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


@pytest.mark.slow
def test_trainer_uses_cache(tmp_path, dataset):
    """End-to-end trainer run with the device cache enabled (default)."""
    import copy
    import os

    from pdc_tpu.training.train import DenseCorrespondenceTraining

    cfg = copy.deepcopy(DenseCorrespondenceTraining.load_default_config())
    t = cfg["training"]
    t.update(num_iterations=5, batch_size=2, num_matching_attempts=256,
             num_non_matches_per_match=10, save_rate=1000, logging_rate=1000,
             logging_dir=os.path.join(str(tmp_path), "trained_models"),
             logging_dir_name="cache_run")
    cfg["dense_correspondence_network"].update(
        image_width=W, image_height=H)
    cfg["dense_correspondence_network"]["backbone"]["resnet_name"] = "Resnet18_8s"

    trainer = DenseCorrespondenceTraining(config=cfg, dataset=dataset)
    folder = trainer.run()
    assert len(trainer._logging_dict["train"]["loss"]) == 5
    assert os.path.exists(os.path.join(folder, "000005.ckpt"))
