"""Pipeline parallelism (GPipe schedule over a ``pipe`` mesh axis).

The pipelined forward must equal the plain ``model.apply`` elementwise, and
the pipelined train step must match a single-device frozen-BN step (same
microbatch-free math — frozen BN decouples images) up to float
reassociation. Runs on the virtual 8-device CPU mesh from conftest.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdc_tpu.models.dcn import build_backbone
from pdc_tpu.parallel.mesh import make_mesh
from pdc_tpu.parallel.pipeline import (
    make_pp_inference,
    make_pp_train_step,
    pack_pipeline_variables,
    unpack_pipeline_variables,
)

H, W = 48, 64
CFG = {
    "descriptor_dimension": 3,
    "backbone": {"model_class": "Resnet", "resnet_name": "Resnet18_8s"},
}


def _model_and_vars(seed=0):
    model = build_backbone(CFG)
    variables = model.init(jax.random.PRNGKey(seed),
                           jnp.zeros((1, H, W, 3), jnp.float32), train=False)
    return model, variables


def test_pack_unpack_roundtrip():
    model, variables = _model_and_vars()
    pack, meta = pack_pipeline_variables(model, variables, 4)
    assert pack.pstack.shape[0] == 4
    rec = unpack_pipeline_variables(pack, meta)
    flat_a = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_b = jax.tree_util.tree_flatten_with_path(rec["params"])[0]
    assert len(flat_a) == len(flat_b)
    for (ka, va), (kb, vb) in zip(flat_a, flat_b):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
    for (ka, va), (kb, vb) in zip(
            jax.tree_util.tree_flatten_with_path(variables["batch_stats"])[0],
            jax.tree_util.tree_flatten_with_path(rec["batch_stats"])[0]):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))


@pytest.mark.parametrize("pipe,data", [
    pytest.param(4, None, marks=pytest.mark.slow),
    (4, 2),
    pytest.param(2, None, marks=pytest.mark.slow),
])
def test_pp_inference_matches_plain_forward(pipe, data):
    model, variables = _model_and_vars()
    if data:
        mesh = make_mesh(("data", "pipe"), shape=(data, pipe),
                         devices=jax.devices()[:data * pipe])
    else:
        mesh = make_mesh(("pipe",), devices=jax.devices()[:pipe])
    build = make_pp_inference(model, mesh, (H, W), microbatch=1,
                              data_axis="data" if data else None)
    fwd, pack = build(variables)

    n = 4 * (data or 1)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (n, H, W, 3))
    got = np.asarray(fwd(pack, imgs))
    want = np.asarray(model.apply(variables, imgs, train=False))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


@pytest.mark.slow
def test_pp_inference_microbatch_gt1():
    model, variables = _model_and_vars()
    mesh = make_mesh(("pipe",), devices=jax.devices()[:4])
    build = make_pp_inference(model, mesh, (H, W), microbatch=2)
    fwd, pack = build(variables)
    imgs = jax.random.uniform(jax.random.PRNGKey(2), (6, H, W, 3))
    got = np.asarray(fwd(pack, imgs))
    want = np.asarray(model.apply(variables, imgs, train=False))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


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


def test_pp_train_step_matches_frozen_bn_reference():
    """One DP x PP step == one single-device frozen-BN step (loss to ~1e-5,
    updated params within the reassociation envelope)."""
    import optax

    from pdc_tpu.data.assembler import AssemblerConfig
    from pdc_tpu.losses.pixelwise_contrastive import LossConfig
    from pdc_tpu.training.train import (
        create_train_state,
        pick_assembly,
    )

    model, _ = _model_and_vars()
    config = {
        "training": {
            "learning_rate": 1e-4, "learning_rate_decay": 0.9,
            "steps_between_learning_rate_decay": 250, "weight_decay": 1e-4,
        },
        "dense_correspondence_network": CFG,
    }
    state, tx = create_train_state(model, config, jax.random.PRNGKey(0),
                                   (H, W))
    acfg = AssemblerConfig(
        num_matching_attempts=64, masked_pool_size=32,
        background_pool_size=32, num_blind_samples=16)
    lcfg = LossConfig()
    mesh = make_mesh(("data", "pipe"), shape=(2, 4))

    step, pp_state, meta = make_pp_train_step(
        model, tx, lcfg, acfg, W, mesh, state, (H, W), microbatch=1)

    batch = _tiny_batch(2)
    key = jax.random.PRNGKey(7)
    pp_state, metrics = step(
        pp_state,
        {k: jax.device_put(v) for k, v in batch.items()},
        key)
    pp_loss = float(metrics["loss"])

    # single-device frozen-BN reference: same assembler keys, same loss,
    # same flat-packed Adam (elementwise, so per-leaf Adam is identical)
    assemble_batch, compose = pick_assembly(acfg)
    img_a, img_b, indices = assemble_batch(
        key, {k: jnp.asarray(v) for k, v in batch.items()}, acfg)

    def ref_loss(params):
        out = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            jnp.concatenate([img_a, img_b], axis=0), train=False)
        B = img_a.shape[0]
        pred = out.reshape(2 * B, H * W, out.shape[-1])
        terms = jax.vmap(
            lambda pa, pb, s: compose(pa, pb, s, lcfg, W)
        )(pred[:B], pred[B:], indices)
        non_empty = (indices.match_type >= 0).astype(jnp.float32)
        return jnp.sum(terms.loss * non_empty) / jnp.maximum(
            jnp.sum(non_empty), 1.0)

    ref_loss_val, grads = jax.value_and_grad(ref_loss)(state.params)
    assert pp_loss == pytest.approx(float(ref_loss_val), rel=2e-4)

    updates, _ = tx.update(grads, state.opt_state, state.params)
    ref_params = optax.apply_updates(state.params, updates)

    # compare the applied UPDATES (params deltas) — the strict check; the
    # tolerance is the measured fp32 partitioning-reassociation envelope
    # (same as the TP/FSDP equivalence tests)
    got = unpack_pipeline_variables(pp_state.pack, meta)["params"]
    num = den = 0.0
    for (ka, v0), (_, vr), (kb, vp) in zip(
            jax.tree_util.tree_flatten_with_path(state.params)[0],
            jax.tree_util.tree_flatten_with_path(ref_params)[0],
            jax.tree_util.tree_flatten_with_path(got)[0]):
        assert ka == kb
        d_ref = np.asarray(vr) - np.asarray(v0)
        d_pp = np.asarray(vp) - np.asarray(v0)
        num += float(np.sum((d_ref - d_pp) ** 2))
        den += float(np.sum(d_ref ** 2))
    assert den > 0
    assert np.sqrt(num / den) < 0.06, f"update rel dev {np.sqrt(num / den)}"
