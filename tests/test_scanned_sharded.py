"""Data-parallel scanned training on the virtual 8-device mesh."""

import jax
import numpy as np
import pytest

from pdc_tpu.data.assembler import AssemblerConfig
from pdc_tpu.data.dataset import SpartanDataset
from pdc_tpu.data.device_cache import DeviceCache
from pdc_tpu.losses.pixelwise_contrastive import LossConfig
from pdc_tpu.models.dcn import build_backbone
from pdc_tpu.parallel.mesh import make_mesh
from pdc_tpu.training.scanned import make_scanned_train_step
from pdc_tpu.training.train import create_train_state

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

W, H = 64, 48


@pytest.mark.slow
def test_sharded_scanned_step():
    ds = SpartanDataset.make_synthetic(num_scenes=2, width=W, height=H, num_frames=6)
    cache = DeviceCache.from_dataset(ds)
    mesh = make_mesh(("data",))
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
    acfg = AssemblerConfig(num_matching_attempts=64, masked_pool_size=32,
                           background_pool_size=32, num_blind_samples=16)
    K = 3
    # per-chip batch 1 -> global batch 8
    step = make_scanned_train_step(model, tx, LossConfig(), acfg, W, cache,
                                   batch_size=1, steps_per_dispatch=K,
                                   mesh=mesh)
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(4):
        key, sub = jax.random.split(key)
        state, m = step(state, sub)
        losses.extend(np.asarray(m["loss"]).tolist())
    assert len(losses) == 12
    assert int(state.step) == 12
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


@pytest.mark.slow
def test_fsdp_scanned_step_matches_replicated():
    """ZeRO (fsdp=True) scanned DP: identical math to the replicated-state
    path (step-1 loss is computed from bit-identical gathered params;
    later steps drift only by the fp32 partitioning-schedule noise), with
    the large parameter leaves actually stored 8-way sharded."""
    ds = SpartanDataset.make_synthetic(num_scenes=2, width=W, height=H,
                                       num_frames=6)
    cache = DeviceCache.from_dataset(ds)
    mesh = make_mesh(("data",))
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
    # two identical states (the step donates its input buffers)
    state_a, tx = create_train_state(model, config, jax.random.PRNGKey(0), (H, W))
    state_b, _ = create_train_state(model, config, jax.random.PRNGKey(0), (H, W))

    step_repl = make_scanned_train_step(
        model, tx, LossConfig(), acfg, W, cache,
        batch_size=1, steps_per_dispatch=2, mesh=mesh)
    step_fsdp = make_scanned_train_step(
        model, tx, LossConfig(), acfg, W, cache,
        batch_size=1, steps_per_dispatch=2, mesh=mesh, fsdp=True)

    key = jax.random.PRNGKey(1)
    s1, m1 = step_repl(state_a, key)
    s2, m2 = step_fsdp(state_b, key)
    l1 = np.asarray(m1["loss"])
    l2 = np.asarray(m2["loss"])
    np.testing.assert_allclose(l1[0], l2[0], rtol=1e-5)
    np.testing.assert_allclose(l1, l2, rtol=2e-2)
    assert int(s2.step) == 2

    # the largest parameter leaf is stored sharded (1/8 per chip)
    big = max(jax.tree.leaves(s2.params), key=lambda l: l.size)
    assert big.sharding.shard_shape(big.shape) != big.shape
    # and Adam's moments are sharded alongside
    opt_big = max(jax.tree.leaves(s2.opt_state), key=lambda l: l.size)
    assert opt_big.sharding.shard_shape(opt_big.shape) != opt_big.shape

    # a second dispatch consumes the sharded state directly
    s2, m2b = step_fsdp(s2, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(m2b["loss"])).all()
