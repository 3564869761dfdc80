"""Mesh-sharded evaluation (round-3 directive #1): the fused quantitative
sweep shards its pairs axis and descriptor statistics shard their image
batches — both must be ROW-IDENTICAL to the single-device paths (each pair /
image carries its own RNG key or none at all)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pdc_tpu.data.dataset import SpartanDataset
from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation
from pdc_tpu.parallel.mesh import make_mesh

W, H = 64, 48


class FakeDCN:
    """Descriptor = RGB texture / 255 (world-position function -> GT matches
    have near-zero descriptor distance)."""

    descriptor_dimension = 3
    image_shape = [H, W]
    config = {}
    image_mean = np.zeros(3)
    image_std_dev = np.ones(3)

    def forward_on_img(self, rgb):
        return jnp.asarray(rgb, jnp.float32) / 255.0


class BatchedFakeDCN(FakeDCN):
    """Adds the batched ``forward`` entry (what descriptor statistics shard
    over the mesh). The dataset's rgb_image_to_tensor output is already
    normalized; undo nothing — descriptors are the tensor itself."""

    def forward(self, imgs):
        return jnp.asarray(imgs, jnp.float32)


@pytest.fixture(scope="module")
def dataset():
    return SpartanDataset.make_synthetic(num_scenes=2, width=W, height=H,
                                         num_frames=6)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(("data",), devices=jax.devices()[:8])


def test_sharded_sweep_rows_identical(dataset, mesh):
    """The 8-device sweep produces the identical DataFrame to the
    single-device sweep (same pairs, same per-pair keys), including when the
    pair count does not divide the mesh (padding dropped)."""
    kwargs = dict(num_image_pairs=5, num_matches_per_image_pair=20, seed=1)
    df_single = DenseCorrespondenceEvaluation.evaluate_network_quantitative(
        FakeDCN(), dataset, **kwargs)
    df_sharded = DenseCorrespondenceEvaluation.evaluate_network_quantitative(
        FakeDCN(), dataset, mesh=mesh, **kwargs)
    assert len(df_single) == len(df_sharded) > 0
    for col in df_single.columns:
        a, b = df_single[col].to_numpy(), df_sharded[col].to_numpy()
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=0, atol=0, err_msg=col)
        else:
            np.testing.assert_array_equal(a, b, err_msg=col)


def test_sharded_sweep_divisible_pair_count(dataset, mesh):
    kwargs = dict(num_image_pairs=8, num_matches_per_image_pair=10, seed=2)
    df_single = DenseCorrespondenceEvaluation.evaluate_network_quantitative(
        FakeDCN(), dataset, **kwargs)
    df_sharded = DenseCorrespondenceEvaluation.evaluate_network_quantitative(
        FakeDCN(), dataset, mesh=mesh, **kwargs)
    assert df_single.equals(df_sharded)


def test_sharded_descriptor_statistics_identical(dataset, mesh):
    dataset.reset_seed(1)
    stats_single = DenseCorrespondenceEvaluation.compute_descriptor_statistics_on_dataset(
        BatchedFakeDCN(), dataset, num_images=10, save_to_file=False,
        batch_size=4)
    dataset.reset_seed(1)
    stats_sharded = DenseCorrespondenceEvaluation.compute_descriptor_statistics_on_dataset(
        BatchedFakeDCN(), dataset, num_images=10, save_to_file=False,
        batch_size=4, mesh=mesh)
    assert stats_single == stats_sharded
