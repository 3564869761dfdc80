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


def test_sharded_scene_render_matches_single_device():
    """Pod-scale preprocessing: render_scene_products with the poses axis
    sharded over the 8-device mesh is output-identical to the single-device
    fused program — including a non-divisible pose count (pad + drop)."""
    from pdc_tpu.data.synthetic import SyntheticScene, make_orbit_pose
    from pdc_tpu.pipeline.change_detection import fit_crop_box
    from pdc_tpu.pipeline.renderer import (
        render_scene_products,
        render_scene_products_sharded,
    )

    sc = SyntheticScene(width=W, height=H, num_frames=4)
    verts, faces = sc.fusion_mesh()
    box = fit_crop_box(verts)
    inside = box.contains(verts)
    fg = faces[np.any(inside[faces], axis=1)]
    mesh = make_mesh(("data",))

    for n_poses in (8, 5):  # divisible and padded
        poses = np.stack([make_orbit_pose(0.4 * i).astype(np.float32)
                          for i in range(n_poses)])
        single = render_scene_products(verts, fg, faces, poses, sc.K,
                                       H, W, 1000.0)
        sharded = render_scene_products_sharded(
            verts, fg, faces, poses, sc.K, H, W, 1000.0, mesh)
        for got, want in zip(sharded, single):
            assert got.shape == want.shape == (n_poses, H, W)
            np.testing.assert_array_equal(got, want)
