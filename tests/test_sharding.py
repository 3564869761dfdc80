"""Multi-device sharding tests on the 8-way virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdc_tpu.parallel.mesh import make_mesh
from pdc_tpu.parallel.sharded_train import (
    make_pixel_sharded_best_match,
    make_sharded_inference,
    make_sharded_train_step,
    shard_host_batch,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

W, H = 64, 48


def test_mesh_has_8_devices():
    mesh = make_mesh(("data",))
    assert mesh.shape["data"] == 8


def test_pixel_sharded_best_match_matches_unsharded():
    mesh = make_mesh(("data",))
    HW = H * W  # 3072, divisible by 8
    res_flat = jax.random.normal(jax.random.PRNGKey(0), (HW, 3))
    queries = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
    fn = make_pixel_sharded_best_match(mesh)
    idx, dist = fn(res_flat, queries)

    d2 = jnp.sum((res_flat[:, None, :] - queries[None, :, :]) ** 2, axis=-1)
    expect_idx = np.asarray(jnp.argmin(d2, axis=0))
    expect_d = np.sqrt(np.asarray(jnp.min(d2, axis=0)))
    np.testing.assert_array_equal(np.asarray(idx), expect_idx)
    np.testing.assert_allclose(np.asarray(dist), expect_d, rtol=1e-4)


def test_sharded_inference_runs():
    from pdc_tpu.models.dcn import build_backbone

    mesh = make_mesh(("data",))
    model = build_backbone({
        "descriptor_dimension": 3,
        "backbone": {"model_class": "Resnet", "resnet_name": "Resnet18_8s"},
    })
    x = jnp.zeros((8, H, W, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    fwd = make_sharded_inference(model, mesh)
    out = fwd(variables, x)
    assert out.shape == (8, H, W, 3)


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
