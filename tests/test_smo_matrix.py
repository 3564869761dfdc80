"""Synthetic multi-object compositing under the matrix (pooled) loss."""

import jax
import numpy as np
import pytest

from pdc_tpu.data.assembler import (
    AssemblerConfig,
    assemble_batch_matrix,
    assemble_synthetic_multi_object_sample_matrix,
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
        masked_pool_size=64, background_pool_size=64, num_blind_samples=32,
        enable_synthetic_multi_object=True, use_matrix_loss=True,
    )


def test_smo_matrix_sample(dataset):
    pair = dataset.sample_pair(match_type=MATCH_TYPE_SYNTHETIC_MULTI_OBJECT)
    p1 = {k: pair.__dict__[k] for k in
          ("rgb_a", "depth_a", "mask_a", "pose_a", "rgb_b", "depth_b",
           "mask_b", "pose_b", "K")}
    p2 = {k: pair.second.__dict__[k] for k in p1}
    img1, img2, idx = assemble_synthetic_multi_object_sample_matrix(
        jax.random.PRNGKey(0), p1, p2, _cfg()
    )
    assert img1.shape == (H, W, 3)
    assert idx.matches_a.shape == (128,)
    assert idx.masked_pool_b.shape == (64,)
    assert bool(idx.matches_valid.any())
    assert not bool(idx.blind_nm_valid.any())
    assert int(idx.masked_pool_b.max()) < H * W


@pytest.mark.slow
def test_mixed_matrix_batch_and_loss(dataset):
    from pdc_tpu.losses.matrix_loss import compose_loss_matrix
    from pdc_tpu.losses.pixelwise_contrastive import LossConfig

    batch = dataset.make_host_batch(4)
    img_a, img_b, idx = assemble_batch_matrix(jax.random.PRNGKey(0), batch, _cfg())
    np.testing.assert_array_equal(np.asarray(idx.match_type), batch["match_type"])

    import jax.numpy as jnp

    preds = jax.random.normal(jax.random.PRNGKey(1), (4, H * W, 3))
    terms = jax.vmap(
        lambda pa, pb, s: compose_loss_matrix(pa, pb, s, LossConfig(), W)
    )(preds, preds + 0.1, idx)
    assert np.isfinite(np.asarray(terms.loss)).all()
    assert (np.asarray(terms.loss)[np.asarray(idx.match_type) >= 0] > 0).all()


@pytest.mark.slow
def test_smo_matrix_train_step(dataset):
    from pdc_tpu.losses.pixelwise_contrastive import LossConfig
    from pdc_tpu.models.dcn import build_backbone
    from pdc_tpu.training.train import create_train_state, make_train_step

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
