"""Tests for torch weight import, LabelFusion parsing, dataset statistics,
and the correspondence plotter."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from pdc_tpu.data.dataset import SpartanDataset

W, H = 64, 48


def _fake_torchvision_resnet34_state_dict(rng):
    """Random tensors with torchvision resnet34 names/shapes."""
    sd = {}

    def conv(name, o, i, k):
        sd[name + ".weight"] = rng.randn(o, i, k, k).astype(np.float32) * 0.01

    def bn(name, c):
        sd[name + ".weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[name + ".bias"] = rng.randn(c).astype(np.float32) * 0.01
        sd[name + ".running_mean"] = rng.randn(c).astype(np.float32) * 0.01
        sd[name + ".running_var"] = rng.rand(c).astype(np.float32) + 0.5

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    stages = [(64, 3), (128, 4), (256, 6), (512, 3)]
    in_c = 64
    for li, (c, blocks) in enumerate(stages, start=1):
        for b in range(blocks):
            p = f"layer{li}.{b}"
            conv(p + ".conv1", c, in_c if b == 0 else c, 3)
            bn(p + ".bn1", c)
            conv(p + ".conv2", c, c, 3)
            bn(p + ".bn2", c)
            if b == 0 and (c != in_c):
                conv(p + ".downsample.0", c, in_c, 1)
                bn(p + ".downsample.1", c)
        in_c = c
    return sd


def test_torchvision_import_changes_output(rng):
    from pdc_tpu.models.resnet import ResNet34_8s
    from pdc_tpu.models.torch_import import convert_torchvision_resnet

    model = ResNet34_8s(num_classes=3)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    sd = _fake_torchvision_resnet34_state_dict(rng)
    new_vars = convert_torchvision_resnet(sd, variables)

    # stem kernel must equal the transposed torch kernel
    np.testing.assert_allclose(
        np.asarray(new_vars["params"]["stem_conv"]["kernel"]),
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)),
    )
    # batch stats wired through
    np.testing.assert_allclose(
        np.asarray(new_vars["batch_stats"]["stage2_block0"]["bn1"]["mean"]),
        sd["layer2.0.bn1.running_mean"],
    )
    # head untouched (fresh init preserved)
    np.testing.assert_allclose(
        np.asarray(new_vars["params"]["head"]["kernel"]),
        np.asarray(variables["params"]["head"]["kernel"]),
    )
    # forward still works and differs from the old params
    y_old = model.apply(variables, x, train=False)
    y_new = model.apply(new_vars, x, train=False)
    assert not np.allclose(np.asarray(y_old), np.asarray(y_new))


def test_labelfusion_posegraph(tmp_path):
    from pdc_tpu.data.labelfusion import LabelFusionScene, load_posegraph

    pg = tmp_path / "posegraph.posegraph"
    # utime x y z qx qy qz qw  (identity rotation)
    pg.write_text(
        "1000000 1.0 2.0 3.0 0.0 0.0 0.0 1.0\n"
        "2000000 4.0 5.0 6.0 0.0 0.0 0.7071068 0.7071068\n"
    )
    entries = load_posegraph(str(pg))
    assert len(entries) == 2
    np.testing.assert_allclose(entries[0]["camera_to_world"][:3, 3], [1, 2, 3])
    np.testing.assert_allclose(entries[0]["camera_to_world"][:3, :3], np.eye(3), atol=1e-12)
    # 90-degree z rotation in the second pose
    R = entries[1]["camera_to_world"][:3, :3]
    np.testing.assert_allclose(R @ np.array([1, 0, 0]), [0, 1, 0], atol=1e-6)

    scene = LabelFusionScene(str(tmp_path))
    assert scene.num_frames == 2
    assert scene.rgb_path(0).endswith("0001000000_rgb.png")


def test_compute_image_mean_and_std():
    from pdc_tpu.data.statistics import compute_image_mean_and_std_dev

    ds = SpartanDataset.make_synthetic(num_scenes=1, width=W, height=H, num_frames=6)
    mean, std = compute_image_mean_and_std_dev(ds, num_images=6, batch_size=4)
    assert mean.shape == (3,) and std.shape == (3,)
    assert (mean > 0).all() and (mean < 1).all()
    assert (std > 0).all() and (std < 0.6).all()

    # cross-check against direct numpy over all frames
    scene = ds.get_scene("scene_000")
    x = scene.rgb.astype(np.float64) / 255.0
    direct_mean = x.mean(axis=(0, 1, 2))
    # sampling with replacement: loose tolerance
    np.testing.assert_allclose(mean, direct_mean, atol=0.05)


def test_correspondence_plotter(tmp_path):
    from pdc_tpu.ops.plotter import plot_correspondences_direct

    ds = SpartanDataset.make_synthetic(num_scenes=1, width=W, height=H, num_frames=2)
    s = ds.get_scene("scene_000")
    uv = np.array([[5, 6], [20, 30]])
    out = os.path.join(tmp_path, "plot.png")
    fig, axes = plot_correspondences_direct(
        s.rgb[0], s.depth[0], s.rgb[1], s.depth[1], uv, uv, show=False,
        save_path=out,
    )
    assert os.path.exists(out)
    # overlay call reusing previous axes
    plot_correspondences_direct(
        s.rgb[0], s.depth[0], s.rgb[1], s.depth[1], uv, uv, show=False,
        use_previous_plot=(fig, axes), circ_color="r",
    )
