"""Trainer-facing model parallelism: ``training.tensor_parallel`` /
``training.pipeline`` config keys route ``DenseCorrespondenceTraining.run``
through the mesh step factories (VERDICT r3 item 3 — the parallel/ library
paths must be orderable from the trainer, not library-only).

The reference has no model-parallel training at all (SURVEY.md §2c); the
contract checked here is ours: same model-folder layout regardless of
parallelism mode, finite decreasing losses, and TP numerics equal to the
replicated step (channel sharding is a layout, not an approximation).
"""

import os

import jax
import numpy as np
import pytest

from tests.test_train import H, W, synthetic_dataset, tiny_config  # noqa: F401
from pdc_tpu.training.train import DenseCorrespondenceTraining

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh")


def _run(tmp_path, synthetic_dataset, name, **training_keys):
    cfg = tiny_config(tmp_path, iters=4, batch=4)
    cfg["training"]["logging_dir_name"] = name
    cfg["training"].update(training_keys)
    # the module-scoped dataset's sampler RNG is stateful — pin it so
    # equality tests compare runs over identical batch streams
    synthetic_dataset.reset_seed(int(training_keys.get("seed", 0)))
    trainer = DenseCorrespondenceTraining(config=cfg, dataset=synthetic_dataset)
    folder = trainer.run()
    return trainer, folder


@pytest.mark.slow
def test_trainer_tensor_parallel(tmp_path, synthetic_dataset):  # noqa: F811
    trainer, folder = _run(tmp_path, synthetic_dataset, "tp_run",
                           tensor_parallel=2, cache_dataset_on_device=False,
                           seed=7)
    losses = trainer._logging_dict["train"]["loss"]
    assert len(losses) == 4 and np.isfinite(losses).all()
    # model-folder contract identical to the single-chip path
    assert os.path.exists(os.path.join(folder, "000004.ckpt"))
    assert os.path.exists(os.path.join(folder, "000004.ckpt.opt"))
    # the checkpoint holds full (unsharded) variables: a plain DCN loads it
    dcn = trainer.get_dcn()
    img = np.zeros((H, W, 3), np.uint8)
    out = dcn.forward_single_image_tensor(img)
    assert out.shape == (H, W, dcn.descriptor_dimension)


@pytest.mark.slow
def test_trainer_tp_matches_replicated(tmp_path, synthetic_dataset):  # noqa: F811
    """Channel sharding is a layout, not an approximation: same seed, same
    data, same losses as the replicated single-chip step — exactly at first,
    then within float drift. (TP reorders the conv-channel and gradient
    reductions, so ~1e-6 step-1 differences compound through the optimizer;
    the hinge losses count hard negatives discretely, so from step 2 on a
    single boundary sample can flip and move the loss by ~1e-3 — which is
    drift amplification, not a layout bug. Step-1 agreement at 2e-5 is the
    sharp check: that loss is computed from IDENTICAL initial params, so it
    proves the sharded step does the same math; the tail bound from step 2
    onward catches real divergence.)"""
    t_tp, _ = _run(tmp_path, synthetic_dataset, "tp_eq",
                   tensor_parallel=2, cache_dataset_on_device=False, seed=3)
    t_ref, _ = _run(tmp_path, synthetic_dataset, "ref_eq",
                    cache_dataset_on_device=False, seed=3)
    lt = np.asarray(t_tp._logging_dict["train"]["loss"])
    lr = np.asarray(t_ref._logging_dict["train"]["loss"])
    np.testing.assert_allclose(lt[:1], lr[:1], rtol=2e-5)
    np.testing.assert_allclose(lt, lr, rtol=2e-2)


@pytest.mark.slow
def test_trainer_pipeline(tmp_path, synthetic_dataset):  # noqa: F811
    trainer, folder = _run(tmp_path, synthetic_dataset, "pp_run",
                           pipeline=2, pipeline_microbatch=2,
                           cache_dataset_on_device=False, seed=11)
    losses = trainer._logging_dict["train"]["loss"]
    assert len(losses) == 4 and np.isfinite(losses).all()
    # PP checkpoints are unpacked back to the standard flax layout
    assert os.path.exists(os.path.join(folder, "000004.ckpt"))
    import flax.serialization

    with open(os.path.join(folder, "000004.ckpt"), "rb") as f:
        variables = flax.serialization.msgpack_restore(f.read())
    assert set(variables) == {"params", "batch_stats"}
    dcn = trainer.get_dcn()
    img = np.zeros((H, W, 3), np.uint8)
    out = dcn.forward_single_image_tensor(img)
    assert out.shape == (H, W, dcn.descriptor_dimension)


def test_tp_pp_mutually_exclusive(tmp_path, synthetic_dataset):  # noqa: F811
    cfg = tiny_config(tmp_path, iters=2, batch=2)
    cfg["training"].update(tensor_parallel=2, pipeline=2)
    trainer = DenseCorrespondenceTraining(config=cfg, dataset=synthetic_dataset)
    with pytest.raises(ValueError, match="separate mesh layouts"):
        trainer.run()


def test_bad_divisor_raises(tmp_path, synthetic_dataset):  # noqa: F811
    cfg = tiny_config(tmp_path, iters=2, batch=2)
    cfg["training"].update(tensor_parallel=3)
    trainer = DenseCorrespondenceTraining(config=cfg, dataset=synthetic_dataset)
    with pytest.raises(ValueError, match="does not divide"):
        trainer.run()


def test_batch_not_multiple_of_data_axis_raises(tmp_path, synthetic_dataset):  # noqa: F811
    """tensor_parallel=2 on 8 devices leaves a 4-wide data axis; a batch of
    2 cannot shard over it — the trainer must say so up front (this exact
    config silently exploded inside pjit before)."""
    cfg = tiny_config(tmp_path, iters=2, batch=2)
    cfg["training"].update(tensor_parallel=2)
    trainer = DenseCorrespondenceTraining(config=cfg, dataset=synthetic_dataset)
    with pytest.raises(ValueError, match="multiple of.*data axis"):
        trainer.run()


@pytest.mark.slow
def test_trainer_pp_matches_frozen_bn_reference(tmp_path, synthetic_dataset):  # noqa: F811
    """The pipelined trainer's loss trajectory equals a single-device
    frozen-BN run over the SAME batch stream / step keys / optimizer
    (VERDICT r4 task 4: equivalence, not finiteness). Frozen BN at init
    normalizes with mean-0/var-1 running stats, so early losses legitimately
    spike (the dryrun's [1.88, 114.5] trajectory) — the oracle reproduces
    the spike, proving it is the documented GPipe BN semantics
    (parallel/pipeline.py module docstring), not a schedule bug."""
    t_pp, _ = _run(tmp_path, synthetic_dataset, "pp_eq",
                   pipeline=2, pipeline_microbatch=2,
                   cache_dataset_on_device=False, seed=13)
    lp = np.asarray(t_pp._logging_dict["train"]["loss"])

    # replay: same config -> same init (create_train_state uses PRNGKey(0)),
    # same tx, same per-step key chain (PRNGKey(seed) split once per step),
    # same dataset stream (reset_seed + host batches in draw order)
    from pdc_tpu.data.assembler import AssemblerConfig
    from pdc_tpu.losses.pixelwise_contrastive import LossConfig
    from pdc_tpu.parallel.pipeline import make_frozen_bn_train_step
    from pdc_tpu.training.train import create_train_state

    cfg = tiny_config(tmp_path, iters=4, batch=4)
    cfg["training"].update(seed=13)
    synthetic_dataset.reset_seed(13)
    synthetic_dataset.set_parameters_from_training_config(cfg)
    model, _net_cfg = DenseCorrespondenceTraining(config=cfg).build_network()
    state, tx = create_train_state(model, cfg, jax.random.PRNGKey(0), (H, W))
    step = make_frozen_bn_train_step(
        model, tx, LossConfig.from_dict(cfg["loss_function"]),
        AssemblerConfig.from_training_config(cfg), W, (H, W))
    key = jax.random.PRNGKey(13)
    ref = []
    for _ in range(4):
        key, sk = jax.random.split(key)
        batch = synthetic_dataset.make_host_batch(4)
        state, metrics = step(state, batch, sk)
        ref.append(float(metrics["loss"]))
    ref = np.asarray(ref)

    # step 1 sees identical params: agreement to float reassociation; the
    # tail bound covers update drift compounding through Adam + the discrete
    # hard-negative counts (same envelope family as the TP test above)
    np.testing.assert_allclose(lp[:1], ref[:1], rtol=2e-4)
    np.testing.assert_allclose(lp, ref, rtol=5e-2)
