"""Device-resident multi-step training (scan) tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from pdc_tpu.data.assembler import AssemblerConfig
from pdc_tpu.data.dataset import SpartanDataset
from pdc_tpu.data.device_cache import DeviceCache
from pdc_tpu.losses.pixelwise_contrastive import LossConfig
from pdc_tpu.models.dcn import build_backbone
from pdc_tpu.training.scanned import device_sample_pairs, make_scanned_train_step
from pdc_tpu.training.train import create_train_state

W, H = 64, 48


def _setup():
    ds = SpartanDataset.make_synthetic(num_scenes=2, width=W, height=H, num_frames=6)
    cache = DeviceCache.from_dataset(ds)
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
    return ds, cache, model, state, tx


def test_device_sample_pairs_valid():
    ds, cache, *_ = _setup()
    offsets = jnp.asarray([cache.scene_offsets[n] for n in sorted(cache.scene_offsets)], jnp.int32)
    lengths = jnp.asarray([cache.scene_lengths[n] for n in sorted(cache.scene_lengths)], jnp.int32)
    poses = jnp.asarray(cache.poses, jnp.float32)
    fa, fb, mt = device_sample_pairs(jax.random.PRNGKey(0), offsets, lengths, poses, 32)
    fa, fb, mt = map(np.asarray, (fa, fb, mt))
    assert (fa >= 0).all() and (fa < 12).all()
    # pairs come from the same scene
    same_scene = (fa < 6) == (fb < 6)
    assert same_scene.all()
    # the synthetic ring has plenty of pose diversity -> most samples valid
    assert (mt == 0).mean() > 0.8
    # valid pairs satisfy the pose-difference thresholds
    from pdc_tpu.geom.transforms import pose_angle, pose_distance

    for i in np.where(mt == 0)[0][:10]:
        pa, pb = cache.poses[fa[i]], cache.poses[fb[i]]
        assert (pose_distance(pa, pb) > 0.2
                or np.degrees(pose_angle(pa, pb)) > 20.0)


@pytest.mark.slow
def test_scanned_step_trains():
    ds, cache, model, state, tx = _setup()
    acfg = AssemblerConfig(num_matching_attempts=128, masked_pool_size=64,
                           background_pool_size=64, num_blind_samples=32)
    K = 4
    step = make_scanned_train_step(model, tx, LossConfig(), acfg, W, cache,
                                   batch_size=2, steps_per_dispatch=K)
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(6):
        key, sub = jax.random.split(key)
        state, m = step(state, sub)
        losses.extend(np.asarray(m["loss"]).tolist())
    assert len(losses) == 24
    assert int(state.step) == 24
    assert np.isfinite(losses).all()
    assert np.mean(losses[-8:]) < np.mean(losses[:8])
