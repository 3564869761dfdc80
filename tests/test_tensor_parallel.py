"""Tensor-parallel and FSDP state-sharding tests on the virtual 8-device
CPU mesh: channel-sharded (TP) and ZeRO-sharded (FSDP) steps must be
numerically equivalent to the replicated data-parallel step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pdc_tpu.data.assembler import AssemblerConfig
from pdc_tpu.losses.pixelwise_contrastive import LossConfig
from pdc_tpu.models.dcn import build_backbone
from pdc_tpu.parallel.mesh import make_mesh
from pdc_tpu.parallel.sharded_train import (
    make_sharded_train_step,
    shard_host_batch,
)
from pdc_tpu.parallel.tensor_parallel import (
    channel_shardings,
    fsdp_shardings,
    make_fsdp_train_step,
    make_tp_inference,
    make_tp_train_step,
    sharded_size_bytes,
)
from pdc_tpu.training.train import create_train_state

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

W, H = 64, 48

CONFIG = {
    "training": {
        "learning_rate": 1e-4, "learning_rate_decay": 0.9,
        "steps_between_learning_rate_decay": 250, "weight_decay": 1e-4,
    },
    "dense_correspondence_network": {
        "descriptor_dimension": 3,
        "backbone": {"model_class": "Resnet", "resnet_name": "Resnet18_8s"},
    },
}

ACFG = AssemblerConfig(
    num_matching_attempts=64, masked_pool_size=32,
    background_pool_size=32, num_blind_samples=16,
)


def _tiny_batch(B):
    from pdc_tpu.data.synthetic import make_orbit_pose

    rng = np.random.RandomState(0)
    f = 0.9 * W
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    return {
        "match_type": np.zeros((B,), np.int32),
        "rgb_a": rng.randint(0, 255, (B, H, W, 3), dtype=np.uint8),
        "depth_a": rng.randint(500, 2000, (B, H, W)).astype(np.uint16),
        "mask_a": (rng.rand(B, H, W) > 0.5).astype(np.uint8),
        "pose_a": np.stack([make_orbit_pose(0.3 * i).astype(np.float32)
                            for i in range(B)]),
        "rgb_b": rng.randint(0, 255, (B, H, W, 3), dtype=np.uint8),
        "depth_b": rng.randint(500, 2000, (B, H, W)).astype(np.uint16),
        "mask_b": (rng.rand(B, H, W) > 0.5).astype(np.uint8),
        "pose_b": np.stack([make_orbit_pose(0.3 * i + 0.7).astype(np.float32)
                            for i in range(B)]),
        "K": np.stack([K] * B).astype(np.float32),
    }


def _model_and_state(seed=0, sgd=False):
    model = build_backbone(CONFIG["dense_correspondence_network"])
    state, tx = create_train_state(
        model, CONFIG, jax.random.PRNGKey(seed), (H, W))
    if sgd:
        # Adam's first step is ~±lr·sign(g): ill-conditioned against the
        # collective-reduction reassociation noise the equivalence tests
        # tolerate. SGD's update is linear in the gradient, so param
        # agreement is a well-conditioned check of grad agreement.
        import optax

        from pdc_tpu.training.train import TrainState

        tx = optax.sgd(0.05)
        state = TrainState(step=state.step, params=state.params,
                           batch_stats=state.batch_stats,
                           opt_state=tx.init(state.params))
    return model, state, tx


def test_channel_shardings_rule():
    mesh = make_mesh(("data", "model"), shape=(2, 4))
    model, state, _ = _model_and_state()
    sh = channel_shardings(state.params, mesh)
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    sh_flat = jax.tree.leaves(sh)
    saw_sharded_kernel = saw_replicated_head = saw_sharded_scale = False
    for (path, leaf), s in zip(flat, sh_flat):
        if leaf.ndim == 4 and leaf.shape[3] % 4 == 0:
            assert s.spec == P(None, None, None, "model"), path
            saw_sharded_kernel = True
        elif leaf.ndim == 4:  # descriptor head, Cout=3
            assert s.spec == P(), path
            saw_replicated_head = True
        elif leaf.ndim == 1 and leaf.shape[0] % 4 == 0:
            assert s.spec == P("model",), path
            saw_sharded_scale = True
    assert saw_sharded_kernel and saw_replicated_head and saw_sharded_scale


def test_fsdp_sharding_splits_memory():
    mesh = make_mesh(("data",))
    model, state, _ = _model_and_state()
    sh = fsdp_shardings(state.params, mesh)
    total = sum(l.size * l.dtype.itemsize for l in jax.tree.leaves(state.params))
    per_dev = sharded_size_bytes(state.params, sh)
    # nearly all parameter bytes live in shardable conv kernels
    assert per_dev < total / 6


def test_tp_inference_matches_replicated():
    mesh = make_mesh(("data", "model"), shape=(2, 4))
    model, state, _ = _model_and_state()
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    x = jnp.asarray(
        np.random.RandomState(1).rand(2, H, W, 3).astype(np.float32))

    expect = model.apply(variables, x, train=False)
    fwd, variables_sh = make_tp_inference(model, mesh, data_axis="data")(variables)
    got = fwd(variables_sh, jax.device_put(
        x, jax.sharding.NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), rtol=1e-4, atol=1e-5)


def _run_replicated_step(mesh, state, model, tx, batch, key):
    step = make_sharded_train_step(model, tx, LossConfig(), ACFG, W, mesh)
    return step(state, batch, key)


@pytest.mark.parametrize("mode", ["tp", "fsdp"])
def test_state_sharded_step_matches_replicated(mode):
    if mode == "tp":
        mesh = make_mesh(("data", "model"), shape=(2, 4))
        B = 2
    else:
        mesh = make_mesh(("data",))
        B = 8
    # two identically-seeded states: the TP/FSDP factories donate their
    # state (device_put may alias buffers, so the input state is consumed)
    model, state, tx = _model_and_state(sgd=True)
    _, state_b, _ = _model_and_state(sgd=True)
    batch = shard_host_batch(_tiny_batch(B), mesh)
    key = jax.random.PRNGKey(3)

    ref_state, ref_metrics = _run_replicated_step(
        mesh, state, model, tx, batch, key)

    if mode == "tp":
        step, state_sh = make_tp_train_step(
            model, tx, LossConfig(), ACFG, W, mesh, state_b)
    else:
        step, state_sh = make_fsdp_train_step(
            model, tx, LossConfig(), ACFG, W, mesh, state_b)
    new_state, metrics = step(state_sh, batch, key)

    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]),
        rtol=1e-4, atol=1e-6)
    # Gradient agreement via the SGD updates (update = -lr*g). Elementwise
    # equality is unattainable across XLA partitionings at fp32: the
    # schedule's reassociation noise (~1e-6 forward) flips ReLU masks for
    # the many near-zero activations, giving ~1-2% Frobenius grad noise —
    # measured IDENTICALLY between the shipped replicated-DP step and a
    # single-device step, so it is inherent to partitioning, not to the
    # TP/FSDP layouts. Assert per-leaf update norms agree to 6% and skip
    # leaves whose gradient is structurally zero (head bias: a constant
    # descriptor offset cancels in every pairwise distance).
    for r0, r1, g1 in zip(jax.tree.leaves(state.params),
                          jax.tree.leaves(ref_state.params),
                          jax.tree.leaves(new_state.params)):
        du_ref = np.asarray(r1, np.float64) - np.asarray(r0, np.float64)
        du_got = np.asarray(g1, np.float64) - np.asarray(r0, np.float64)
        n_ref = np.linalg.norm(du_ref)
        if n_ref < 1e-8:
            assert np.linalg.norm(du_got) < 1e-7
            continue
        assert np.linalg.norm(du_got - du_ref) / n_ref < 0.06
    assert int(new_state.step) == int(state.step) + 1


def test_tp_inference_unet_backbone():
    """channel_shardings is architecture-generic: the UNet backbone's convs
    (incl. transposed up-projections) shard the same way; TP forward equals
    the replicated forward."""
    mesh = make_mesh(("data", "model"), shape=(2, 4),
                     devices=jax.devices()[:8])
    model = build_backbone({
        "descriptor_dimension": 3,
        "backbone": {"model_class": "Unet"},
    })
    x = jnp.asarray(
        np.random.RandomState(2).rand(2, H, W, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(1), x, train=False)

    expect = model.apply(variables, x, train=False)
    fwd, variables_sh = make_tp_inference(model, mesh, data_axis="data")(variables)
    got = fwd(variables_sh, jax.device_put(
        x, jax.sharding.NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expect), rtol=1e-4, atol=1e-5)
