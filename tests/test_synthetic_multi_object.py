"""Synthetic multi-object compositing path."""

import jax
import numpy as np
import pytest

from pdc_tpu.data.assembler import (
    AssemblerConfig,
    assemble_batch,
    assemble_synthetic_multi_object_sample,
)
from pdc_tpu.data.dataset import SpartanDataset
from pdc_tpu.losses.composer import (
    MATCH_TYPE_SINGLE_OBJECT_WITHIN_SCENE,
    MATCH_TYPE_SYNTHETIC_MULTI_OBJECT,
)

W, H = 64, 48


@pytest.fixture(scope="module")
def dataset():
    ds = SpartanDataset.make_synthetic(num_scenes=4, num_objects=2,
                                       width=W, height=H, num_frames=6)
    ds._data_type_probabilities = {
        MATCH_TYPE_SINGLE_OBJECT_WITHIN_SCENE: 0.5,
        MATCH_TYPE_SYNTHETIC_MULTI_OBJECT: 0.5,
    }
    return ds


def _cfg():
    return AssemblerConfig(
        num_matching_attempts=128,
        num_masked_non_matches_per_match=4,
        num_background_non_matches_per_match=4,
        num_blind_samples=32,
        enable_synthetic_multi_object=True,
    )


def test_smo_pair_sampling(dataset):
    pair = dataset.sample_pair(match_type=MATCH_TYPE_SYNTHETIC_MULTI_OBJECT)
    assert pair.match_type == MATCH_TYPE_SYNTHETIC_MULTI_OBJECT
    assert pair.second is not None
    assert pair.metadata["object_id_a"] != pair.metadata["object_id_b"]


def test_smo_sample_assembly(dataset):
    pair = dataset.sample_pair(match_type=MATCH_TYPE_SYNTHETIC_MULTI_OBJECT)
    p1 = {k: pair.__dict__[k] for k in
          ("rgb_a", "depth_a", "mask_a", "pose_a", "rgb_b", "depth_b",
           "mask_b", "pose_b", "K")}
    p2 = {k: pair.second.__dict__[k] for k in p1}
    img1, img2, idx = assemble_synthetic_multi_object_sample(
        jax.random.PRNGKey(0), p1, p2, _cfg()
    )
    assert img1.shape == (H, W, 3)
    assert idx.matches_a.shape == (128,)
    assert int(idx.match_type) == MATCH_TYPE_SYNTHETIC_MULTI_OBJECT
    assert bool(idx.matches_valid.any())
    # blind set must be empty for this type (reference returns the sentinel)
    assert not bool(idx.blind_nm_valid.any())
    assert int(idx.matches_a.max()) < H * W


def test_mixed_batch_assembly(dataset):
    batch = dataset.make_host_batch(4)
    assert "rgb_a_2" in batch
    img_a, img_b, idx = assemble_batch(jax.random.PRNGKey(0), batch, _cfg())
    assert img_a.shape == (4, H, W, 3)
    types = np.asarray(idx.match_type)
    np.testing.assert_array_equal(types, batch["match_type"])
    # every non-empty sample has some valid matches (both paths produce them)
    valid_rows = np.asarray(idx.matches_valid).any(axis=1)
    assert valid_rows[types >= 0].all()


@pytest.mark.slow
def test_smo_training_step(dataset):
    """One fused train step over a mixed batch incl. composited samples."""
    from pdc_tpu.losses.pixelwise_contrastive import LossConfig
    from pdc_tpu.models.dcn import build_backbone
    from pdc_tpu.training.train import create_train_state, make_train_step, make_optimizer

    config = {
        "training": {"learning_rate": 1e-4, "learning_rate_decay": 0.9,
                     "steps_between_learning_rate_decay": 250,
                     "weight_decay": 1e-4},
        "dense_correspondence_network": {
            "descriptor_dimension": 3,
            "backbone": {"model_class": "Resnet", "resnet_name": "Resnet18_8s"},
        },
    }
    model = build_backbone(config["dense_correspondence_network"])
    state, tx = create_train_state(model, config, jax.random.PRNGKey(0), (H, W))
    step = make_train_step(model, tx, LossConfig(), _cfg(), W, donate=False)

    batch = dataset.make_host_batch(2)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1
