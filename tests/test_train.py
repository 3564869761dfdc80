"""End-to-end training smoke tests on the synthetic scene (CPU, tiny shapes)."""

import copy
import os

import jax
import numpy as np
import pytest

from pdc_tpu.data.dataset import SpartanDataset
from pdc_tpu.training.train import DenseCorrespondenceTraining

W, H = 64, 48


def tiny_config(tmp_path, iters=5, batch=2, resnet="Resnet18_8s"):
    cfg = DenseCorrespondenceTraining.load_default_config()
    cfg = copy.deepcopy(cfg)
    t = cfg["training"]
    t["num_iterations"] = iters
    t["batch_size"] = batch
    t["num_matching_attempts"] = 256
    t["num_non_matches_per_match"] = 10
    t["cross_scene_num_samples"] = 128
    t["save_rate"] = 1000
    t["logging_rate"] = 1000
    t["logging_dir"] = os.path.join(str(tmp_path), "trained_models")
    t["logging_dir_name"] = "test_run"
    net = cfg["dense_correspondence_network"]
    net["image_width"] = W
    net["image_height"] = H
    net["backbone"]["resnet_name"] = resnet
    return cfg


@pytest.fixture(scope="module")
def synthetic_dataset():
    return SpartanDataset.make_synthetic(num_scenes=2, width=W, height=H, num_frames=6)


def test_dataset_sampling(synthetic_dataset):
    ds = synthetic_dataset
    assert ds.num_scenes == 2
    pair = ds.sample_pair()
    assert pair.rgb_a.shape == (H, W, 3)
    assert pair.match_type == 0
    batch = ds.make_host_batch(3)
    assert batch["rgb_a"].shape == (3, H, W, 3)
    assert batch["pose_a"].dtype == np.float32


def test_dataset_across_scene_sampling(synthetic_dataset):
    ds = synthetic_dataset
    from pdc_tpu.losses.composer import MATCH_TYPE_DIFFERENT_OBJECT

    pair = ds.sample_pair(match_type=MATCH_TYPE_DIFFERENT_OBJECT)
    assert pair.match_type == MATCH_TYPE_DIFFERENT_OBJECT
    assert pair.metadata["scene_name_a"] != pair.metadata["scene_name_b"]


def test_assembler(synthetic_dataset):
    from pdc_tpu.data.assembler import AssemblerConfig, assemble_batch

    cfg = AssemblerConfig(
        num_matching_attempts=128,
        num_masked_non_matches_per_match=5,
        num_background_non_matches_per_match=5,
        num_blind_samples=64,
    )
    batch = synthetic_dataset.make_host_batch(2)
    img_a, img_b, idx = assemble_batch(jax.random.PRNGKey(0), batch, cfg)
    assert img_a.shape == (2, H, W, 3)
    assert idx.matches_a.shape == (2, 128)
    assert idx.masked_nm_a.shape == (2, 128 * 5)
    assert idx.blind_nm_a.shape == (2, 64)
    assert bool(idx.matches_valid.any())
    # indices in range
    assert int(idx.matches_a.max()) < H * W
    assert int(idx.masked_nm_b.max()) < H * W
    # replication structure: masked_nm_a rows repeat matches_a 5x
    ma = np.asarray(idx.matches_a[0])
    nma = np.asarray(idx.masked_nm_a[0]).reshape(128, 5)
    assert (nma == ma[:, None]).all()


@pytest.mark.slow
def test_training_loss_decreases(tmp_path, synthetic_dataset):
    cfg = tiny_config(tmp_path, iters=30, batch=2)
    trainer = DenseCorrespondenceTraining(config=cfg, dataset=synthetic_dataset)
    folder = trainer.run()

    losses = trainer._logging_dict["train"]["loss"]
    assert len(losses) == 30
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert last < first, f"loss did not decrease: {first} -> {last}"

    # folder contract
    assert os.path.exists(os.path.join(folder, "training.yaml"))
    assert os.path.exists(os.path.join(folder, "dataset.yaml"))
    assert os.path.exists(os.path.join(folder, "identifier.yaml"))
    assert os.path.exists(os.path.join(folder, "000000.ckpt"))
    assert os.path.exists(os.path.join(folder, "000030.ckpt"))
    assert os.path.exists(os.path.join(folder, "loss.yaml"))


@pytest.mark.slow
def test_trained_descriptors_beat_init(tmp_path, synthetic_dataset):
    """After a short training run, GT correspondences must be closer in
    descriptor space than random pixel pairs (the core learning signal)."""
    cfg = tiny_config(tmp_path, iters=60, batch=2)
    trainer = DenseCorrespondenceTraining(config=cfg, dataset=synthetic_dataset)
    trainer.run()
    dcn = trainer.get_dcn()

    ds = synthetic_dataset
    scene = ds.get_scene(ds.get_random_scene_name())
    from pdc_tpu.ops.correspondence import find_pixel_correspondences

    uv_a, uv_b, valid = find_pixel_correspondences(
        scene.depth[0], scene.poses[0], scene.depth[2], scene.poses[2],
        scene.K, jax.random.PRNGKey(0), num_attempts=200, mask_a=scene.mask[0],
    )
    uv_a, uv_b, valid = map(np.asarray, (uv_a, uv_b, valid))
    res_a = np.asarray(dcn.forward_on_img(scene.rgb[0]))
    res_b = np.asarray(dcn.forward_on_img(scene.rgb[2]))

    ub = np.clip(np.round(uv_b[:, 0]).astype(int), 0, W - 1)
    vb = np.clip(np.round(uv_b[:, 1]).astype(int), 0, H - 1)
    d_match = np.linalg.norm(
        res_a[uv_a[:, 1], uv_a[:, 0]] - res_b[vb, ub], axis=1
    )[valid]

    rng = np.random.RandomState(0)
    rand_uv = rng.randint(0, [W, H], size=(valid.sum(), 2))
    d_rand = np.linalg.norm(
        res_a[uv_a[valid, 1], uv_a[valid, 0]] - res_b[rand_uv[:, 1], rand_uv[:, 0]],
        axis=1,
    )
    assert d_match.mean() < d_rand.mean()


@pytest.mark.slow
def test_resume_from_pretrained(tmp_path, synthetic_dataset):
    cfg = tiny_config(tmp_path, iters=5, batch=1)
    trainer = DenseCorrespondenceTraining(config=cfg, dataset=synthetic_dataset)
    folder = trainer.run()

    cfg2 = tiny_config(tmp_path, iters=3, batch=1)
    cfg2["training"]["logging_dir_name"] = "resumed_run"
    trainer2 = DenseCorrespondenceTraining(config=cfg2, dataset=synthetic_dataset)
    it = trainer2.load_pretrained(folder)
    assert it == 5
    folder2 = trainer2.run(loss_current_iteration=it, use_pretrained=True)
    assert os.path.exists(os.path.join(folder2, "000008.ckpt"))


@pytest.mark.slow
def test_training_data_parallel_fsdp(tmp_path, synthetic_dataset):
    """training.data_parallel + training.fsdp config keys route the trainer
    through the mesh-DP scanned step with ZeRO state sharding; the full
    folder contract (checkpoints from sharded state) must still hold."""
    cfg = tiny_config(tmp_path, iters=10, batch=1)
    cfg["training"]["data_parallel"] = True
    cfg["training"]["fsdp"] = True
    trainer = DenseCorrespondenceTraining(config=cfg, dataset=synthetic_dataset)
    folder = trainer.run()

    losses = trainer._logging_dict["train"]["loss"]
    assert len(losses) == 10
    assert np.isfinite(losses).all()
    assert os.path.exists(os.path.join(folder, "000010.ckpt"))

    # the checkpoint written from sharded state restores into a usable net
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

    dcn = DenseCorrespondenceNetwork.from_model_folder(folder)
    rgb = np.asarray(synthetic_dataset.get_scene(
        synthetic_dataset.get_scene_list()[0]).rgb[0])
    out = np.asarray(dcn.forward_on_img(rgb))
    assert out.shape == (H, W, dcn.descriptor_dimension)
    assert np.isfinite(out).all()
