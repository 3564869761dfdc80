"""Type-mixed on-device sampling + scanned training."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from pdc_tpu.data.assembler import AssemblerConfig
from pdc_tpu.data.dataset import SpartanDataset
from pdc_tpu.data.device_cache import DeviceCache
from pdc_tpu.losses.pixelwise_contrastive import LossConfig
from pdc_tpu.models.dcn import build_backbone
from pdc_tpu.training.scanned import (
    build_sampling_tables,
    device_sample_pairs_mixed,
    make_scanned_train_step,
)
from pdc_tpu.training.train import create_train_state

W, H = 64, 48
TYPE_PROBS = ((0, 0.6), (1, 0.2), (2, 0.2))


def _setup():
    ds = SpartanDataset.make_synthetic(num_scenes=4, num_objects=2,
                                       width=W, height=H, num_frames=6)
    return ds, DeviceCache.from_dataset(ds)


def test_mixed_sampler_distribution():
    ds, cache = _setup()
    tables = build_sampling_tables(cache)
    poses = jnp.asarray(cache.poses, jnp.float32)
    fa, fb, mt = device_sample_pairs_mixed(
        jax.random.PRNGKey(0), tables, poses, 512, TYPE_PROBS
    )
    fa, fb, mt = map(np.asarray, (fa, fb, mt))
    # frames in range
    assert fa.min() >= 0 and fa.max() < 24
    # types drawn roughly per the configured mix (-1 allowed for failed
    # within-scene rejection)
    frac_within = ((mt == 0) | (mt == -1)).mean()
    assert 0.45 < frac_within < 0.75
    assert 0.1 < (mt == 1).mean() < 0.35
    assert 0.1 < (mt == 2).mean() < 0.35

    scene_of = lambda f: f // 6
    obj_of = lambda s: s % 2  # make_synthetic: object = scene % num_objects
    # within: same scene
    w = mt == 0
    np.testing.assert_array_equal(scene_of(fa[w]), scene_of(fb[w]))
    # across: same object, different scene (4 scenes/2 objects -> always possible)
    x = mt == 1
    assert (obj_of(scene_of(fa[x])) == obj_of(scene_of(fb[x]))).all()
    assert (scene_of(fa[x]) != scene_of(fb[x])).all()
    # different object
    d = mt == 2
    assert (obj_of(scene_of(fa[d])) != obj_of(scene_of(fb[d]))).all()


TYPE_PROBS_5 = ((0, 0.4), (1, 0.15), (2, 0.15), (4, 0.3))


def test_mixed_sampler_smo_second_pair():
    """Type-4 rows return a second within-scene pair from a DIFFERENT
    object's scene; other rows self-pair (VERDICT r2 weak #3)."""
    ds, cache = _setup()
    tables = build_sampling_tables(cache)
    poses = jnp.asarray(cache.poses, jnp.float32)
    fa, fb, fa2, fb2, mt = device_sample_pairs_mixed(
        jax.random.PRNGKey(1), tables, poses, 512, TYPE_PROBS_5,
        with_second=True)
    fa, fb, fa2, fb2, mt = map(np.asarray, (fa, fb, fa2, fb2, mt))

    scene_of = lambda f: f // 6
    obj_of = lambda s: s % 2
    smo = mt == 4
    assert smo.sum() > 50
    # pair 1 and pair 2 are each within-scene
    np.testing.assert_array_equal(scene_of(fa[smo]), scene_of(fb[smo]))
    np.testing.assert_array_equal(scene_of(fa2[smo]), scene_of(fb2[smo]))
    # ... from scenes of two different objects
    assert (obj_of(scene_of(fa[smo])) != obj_of(scene_of(fa2[smo]))).all()
    # both pairs pass pose rejection (different frames)
    assert (fa[smo] != fb[smo]).all() and (fa2[smo] != fb2[smo]).all()
    # non-SMO rows self-pair the second slot
    np.testing.assert_array_equal(fa2[~smo], fa[~smo])
    np.testing.assert_array_equal(fb2[~smo], fb[~smo])
    # other types still sampled
    assert (mt == 0).sum() > 50 and (mt == 1).sum() > 20 and (mt == 2).sum() > 20


def test_smo_requires_with_second():
    ds, cache = _setup()
    tables = build_sampling_tables(cache)
    poses = jnp.asarray(cache.poses, jnp.float32)
    with pytest.raises(ValueError, match="with_second"):
        device_sample_pairs_mixed(jax.random.PRNGKey(0), tables, poses, 4,
                                  ((4, 1.0),))


def test_smo_device_host_assembly_parity():
    """The cache-gathered SMO batch assembles bit-identically to the same
    frames gathered on host from the dataset arrays — the device-resident
    path changes WHERE the frames come from, not what the loss consumes."""
    from pdc_tpu.data.assembler import assemble_batch_matrix

    ds, cache = _setup()
    tables = build_sampling_tables(cache)
    poses = jnp.asarray(cache.poses, jnp.float32)
    fa, fb, fa2, fb2, mt = device_sample_pairs_mixed(
        jax.random.PRNGKey(2), tables, poses, 8, ((4, 1.0),),
        with_second=True)
    acfg = AssemblerConfig(num_matching_attempts=128, masked_pool_size=64,
                           background_pool_size=64, num_blind_samples=32,
                           enable_synthetic_multi_object=True)

    def gather_dev(frames):
        f = jnp.asarray(frames)
        return {
            "rgb": jnp.take(cache.rgb, f, axis=0),
            "depth": jnp.take(cache.depth, f, axis=0),
            "mask": jnp.take(cache.mask, f, axis=0),
            "pose": jnp.take(jnp.asarray(cache.poses), f, axis=0),
            "K": jnp.take(jnp.asarray(cache.Ks), f, axis=0),
        }

    names = sorted(cache.scene_offsets)

    def gather_host(frames):
        rgb, depth, mask, pose, Ks = [], [], [], [], []
        for f in np.asarray(frames):
            name = names[f // 6]
            scene = ds.get_scene(name)
            idx = f % 6
            rgb.append(scene.rgb[idx])
            depth.append(scene.depth[idx])
            mask.append(scene.mask[idx])
            pose.append(scene.poses[idx])
            Ks.append(scene.K)
        return {k: jnp.asarray(np.stack(v)) for k, v in
                zip(("rgb", "depth", "mask", "pose", "K"),
                    (rgb, depth, mask, pose, Ks))}

    def to_batch(g1a, g1b, g2a, g2b):
        batch = {"match_type": jnp.asarray(mt)}
        for tag, g in (("a", g1a), ("b", g1b), ("a_2", g2a), ("b_2", g2b)):
            batch.update({f"rgb_{tag}": g["rgb"], f"depth_{tag}": g["depth"],
                          f"mask_{tag}": g["mask"], f"pose_{tag}": g["pose"]})
        batch["K"] = g1a["K"]
        batch["K_2"] = g2a["K"]
        return batch

    k = jax.random.PRNGKey(3)
    out_dev = assemble_batch_matrix(
        k, to_batch(gather_dev(fa), gather_dev(fb),
                    gather_dev(fa2), gather_dev(fb2)), acfg)
    out_host = assemble_batch_matrix(
        k, to_batch(gather_host(fa), gather_host(fb),
                    gather_host(fa2), gather_host(fb2)), acfg)
    for x, y in zip(jax.tree_util.tree_leaves(out_dev),
                    jax.tree_util.tree_leaves(out_host)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # the SMO rows actually produced valid matches
    assert np.asarray(out_dev[2].matches_valid).any()


@pytest.mark.slow
def test_smo_scanned_training():
    """All five sample types on the device-resident scanned path: finite
    losses, SMO compositing active in the compiled program."""
    ds, cache = _setup()
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
    acfg = AssemblerConfig(num_matching_attempts=128, masked_pool_size=64,
                           background_pool_size=64, num_blind_samples=32)
    step = make_scanned_train_step(model, tx, LossConfig(), acfg, W, cache,
                                   batch_size=2, steps_per_dispatch=3,
                                   type_probs=TYPE_PROBS_5)
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(4):
        key, sub = jax.random.split(key)
        state, m = step(state, sub)
        losses.extend(np.asarray(m["loss"]).tolist())
    assert len(losses) == 12
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_mixed_scanned_training():
    ds, cache = _setup()
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
    acfg = AssemblerConfig(num_matching_attempts=128, masked_pool_size=64,
                           background_pool_size=64, num_blind_samples=32)
    step = make_scanned_train_step(model, tx, LossConfig(), acfg, W, cache,
                                   batch_size=2, steps_per_dispatch=3,
                                   type_probs=TYPE_PROBS)
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(4):
        key, sub = jax.random.split(key)
        state, m = step(state, sub)
        losses.extend(np.asarray(m["loss"]).tolist())
    assert len(losses) == 12
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_trainer_scans_mixed_types(tmp_path):
    import copy
    import os

    from pdc_tpu.training.train import DenseCorrespondenceTraining

    ds, _ = _setup()
    cfg = copy.deepcopy(DenseCorrespondenceTraining.load_default_config())
    cfg["training"].update(
        num_iterations=6, batch_size=2, num_matching_attempts=128,
        masked_pool_size=64, background_pool_size=64, num_blind_samples=32,
        steps_per_dispatch=3, save_rate=1000, logging_rate=1000,
        logging_dir=os.path.join(str(tmp_path), "trained_models"),
        logging_dir_name="mixed_scan",
    )
    cfg["training"]["data_type_probabilities"] = {
        "SINGLE_OBJECT_WITHIN_SCENE": 0.5,
        "SINGLE_OBJECT_ACROSS_SCENE": 0.15,
        "DIFFERENT_OBJECT": 0.15,
        "SYNTHETIC_MULTI_OBJECT": 0.2,
    }
    cfg["dense_correspondence_network"].update(image_width=W, image_height=H)
    cfg["dense_correspondence_network"]["backbone"]["resnet_name"] = "Resnet18_8s"

    trainer = DenseCorrespondenceTraining(config=cfg, dataset=ds)
    folder = trainer.run()
    assert len(trainer._logging_dict["train"]["loss"]) == 6
    assert os.path.exists(os.path.join(folder, "000006.ckpt"))
