"""Model layer: shapes, jit/grad, DCN wrapper contract."""

import pytest
import os

import jax
import jax.numpy as jnp
import numpy as np

from pdc_tpu.models import DenseCorrespondenceNetwork, ResNet34_8s, UNet
from pdc_tpu.models.resnet import ResNet18_8s


def _small_config(tmp=None, d=3, h=32, w=32, backbone=None):
    cfg = {
        "descriptor_dimension": d,
        "image_width": w,
        "image_height": h,
        "normalize": False,
    }
    if backbone:
        cfg["backbone"] = backbone
    return cfg


def test_resnet34_8s_output_shape():
    model = ResNet34_8s(num_classes=3)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 32, 32, 3)
    assert y.dtype == jnp.float32


def test_resnet_output_stride_8():
    """The pre-upsample feature map must be 1/8 resolution (dilated stages)."""
    model = ResNet18_8s(num_classes=2)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    _, intermediates = model.apply(
        variables, x, train=False, capture_intermediates=True, mutable=["intermediates"]
    )
    head_out = intermediates["intermediates"]["head"]["__call__"][0]
    assert head_out.shape[1:3] == (8, 8)  # 64 / 8


def test_resnet_train_mode_updates_batch_stats():
    model = ResNet18_8s(num_classes=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


@pytest.mark.slow
def test_unet_output_shape():
    model = UNet(num_classes=4, base_features=8)
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y = model.apply(variables, x, train=False)
    assert y.shape == (1, 32, 32, 4)


def test_dcn_from_config_and_forward():
    cfg = _small_config()
    dcn = DenseCorrespondenceNetwork.from_config(cfg)
    img = jax.random.normal(jax.random.PRNGKey(0), (32, 32, 3))
    res = dcn.forward_single_image_tensor(img)
    assert res.shape == (32, 32, 3)

    pred = dcn.process_network_output(res[None], 1)
    assert pred.shape == (1, 32 * 32, 3)
    # flat convention: n = v*W + u
    np.testing.assert_allclose(
        np.asarray(pred[0, 5 * 32 + 7]), np.asarray(res[5, 7]), rtol=1e-6
    )


def test_dcn_normalize():
    cfg = _small_config()
    cfg["normalize"] = True
    dcn = DenseCorrespondenceNetwork.from_config(cfg)
    res = dcn.forward_single_image_tensor(
        jax.random.normal(jax.random.PRNGKey(0), (32, 32, 3))
    )
    norms = np.linalg.norm(np.asarray(res), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-4)


def test_dcn_forward_on_img_uint8():
    dcn = DenseCorrespondenceNetwork.from_config(_small_config())
    img = (np.random.RandomState(0).rand(32, 32, 3) * 255).astype(np.uint8)
    res = dcn.forward_on_img(img)
    assert res.shape == (32, 32, 3)
    assert np.isfinite(np.asarray(res)).all()


def test_dcn_checkpoint_roundtrip(tmp_path):
    dcn = DenseCorrespondenceNetwork.from_config(_small_config())
    img = jax.random.normal(jax.random.PRNGKey(0), (32, 32, 3))
    before = np.asarray(dcn.forward_single_image_tensor(img))

    ckpt = os.path.join(tmp_path, "000010.ckpt")
    dcn.save_checkpoint(ckpt)

    dcn2 = DenseCorrespondenceNetwork.from_config(
        _small_config(), rng=jax.random.PRNGKey(99)
    )
    different = np.asarray(dcn2.forward_single_image_tensor(img))
    assert not np.allclose(before, different)
    dcn2.load_checkpoint(ckpt)
    after = np.asarray(dcn2.forward_single_image_tensor(img))
    np.testing.assert_allclose(before, after, rtol=1e-6)


def test_dcn_from_model_folder(tmp_path):
    from pdc_tpu.utils.yaml_io import save_yaml

    folder = str(tmp_path / "model")
    os.makedirs(folder)
    training_cfg = {"dense_correspondence_network": _small_config()}
    save_yaml(training_cfg, os.path.join(folder, "training.yaml"))

    dcn = DenseCorrespondenceNetwork.from_config(_small_config())
    dcn.save_checkpoint(os.path.join(folder, "000500.ckpt"))
    dcn.save_checkpoint(os.path.join(folder, "001000.ckpt"))

    loaded = DenseCorrespondenceNetwork.from_model_folder(folder)
    assert loaded.config["model_param_filename_tail"] == "001000.ckpt"
    img = jax.random.normal(jax.random.PRNGKey(0), (32, 32, 3))
    np.testing.assert_allclose(
        np.asarray(loaded.forward_single_image_tensor(img)),
        np.asarray(dcn.forward_single_image_tensor(img)),
        rtol=1e-6,
    )

    loaded_500 = DenseCorrespondenceNetwork.from_model_folder(folder, iteration=500)
    assert loaded_500.config["model_param_filename_tail"] == "000500.ckpt"


def test_find_best_match_api():
    dcn = DenseCorrespondenceNetwork.from_config(_small_config())
    key = jax.random.PRNGKey(3)
    res_a = jax.random.normal(key, (32, 32, 3))
    uv, diff, nd = DenseCorrespondenceNetwork.find_best_match((7, 5), res_a, res_a)
    # identical images: the best match for (7,5) is itself at distance 0
    assert tuple(np.asarray(uv)) == (7, 5)
    assert float(diff) < 1e-5
    assert nd.shape == (32, 32)


@pytest.mark.slow
def test_resnet50_bottleneck_and_import():
    """Bottleneck ResNet-50-8s: output shape, parameter scale, and
    torchvision-layout weight import incl. conv3/bn3 (reference backbone
    library's deeper variants)."""
    from pdc_tpu.models.dcn import build_backbone
    from pdc_tpu.models.torch_import import convert_torchvision_resnet

    m = build_backbone({"descriptor_dimension": 3,
                        "backbone": {"model_class": "Resnet",
                                     "resnet_name": "Resnet50_8s"}})
    x = jnp.zeros((1, 48, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (1, 48, 64, 3)
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(v["params"]))
    assert 20e6 < n_params < 30e6  # torchvision resnet50 backbone is ~23.5M

    # synthesize a torchvision-shaped state dict from the flax shapes and
    # check the conv3 kernel lands transposed OIHW -> HWIO
    rng = np.random.RandomState(0)
    sd = {}
    params, stats = v["params"], v["batch_stats"]

    def add_bn(tname, fname, p, s):
        sd[tname + ".weight"] = rng.rand(*p[fname]["scale"].shape).astype(np.float32)
        sd[tname + ".bias"] = rng.rand(*p[fname]["bias"].shape).astype(np.float32)
        sd[tname + ".running_mean"] = rng.rand(*s[fname]["mean"].shape).astype(np.float32)
        sd[tname + ".running_var"] = (rng.rand(*s[fname]["var"].shape) + 0.5).astype(np.float32)

    def add_conv(tname, fname, p):
        k = p[fname]["kernel"]  # HWIO
        sd[tname + ".weight"] = rng.rand(
            k.shape[3], k.shape[2], k.shape[0], k.shape[1]).astype(np.float32)

    add_conv("conv1", "stem_conv", params)
    add_bn("bn1", "stem_bn", params, stats)
    for st, nblocks in enumerate([3, 4, 6, 3], start=1):
        for b in range(nblocks):
            fx = f"stage{st}_block{b}"
            for c in ("conv1", "conv2", "conv3"):
                add_conv(f"layer{st}.{b}.{c}", c, params[fx])
            for bn in ("bn1", "bn2", "bn3"):
                add_bn(f"layer{st}.{b}.{bn}", bn, params[fx], stats[fx])
            if "proj_conv" in params[fx]:
                add_conv(f"layer{st}.{b}.downsample.0", "proj_conv", params[fx])
                add_bn(f"layer{st}.{b}.downsample.1", "proj_bn", params[fx], stats[fx])

    v2 = convert_torchvision_resnet(sd, v)
    w_torch = sd["layer1.0.conv3.weight"].transpose(2, 3, 1, 0)
    w_flax = np.asarray(v2["params"]["stage1_block0"]["conv3"]["kernel"])
    np.testing.assert_allclose(w_torch, w_flax)
    out2 = m.apply(v2, x, train=False)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


@pytest.mark.slow
def test_unet_trains_end_to_end(tmp_path):
    """UNet backbone through the real trainer (reference get_unet,
    dense_correspondence_network.py:347-356): loss finite, folder reloads."""
    import copy

    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.training.train import DenseCorrespondenceTraining

    ds = SpartanDataset.make_synthetic(num_scenes=1, width=64, height=48,
                                       num_frames=4, object_radius=0.3)
    cfg = copy.deepcopy(DenseCorrespondenceTraining.load_default_config())
    t = cfg["training"]
    t.update(num_iterations=3, batch_size=1, num_matching_attempts=128,
             num_non_matches_per_match=5, save_rate=1000, logging_rate=1000,
             logging_dir=str(tmp_path), logging_dir_name="unet_net")
    net = cfg["dense_correspondence_network"]
    net.update(image_width=64, image_height=48)
    net["backbone"] = {"model_class": "Unet"}
    trainer = DenseCorrespondenceTraining(config=cfg, dataset=ds)
    folder = trainer.run()
    losses = trainer._logging_dict["train"]["loss"]
    assert losses and all(np.isfinite(losses))

    dcn = DenseCorrespondenceNetwork.from_model_folder(folder)
    res = dcn.forward_on_img(ds.get_scene(ds.get_random_scene_name()).rgb[0])
    assert res.shape == (48, 64, 3)
    assert np.isfinite(np.asarray(res)).all()


def test_dilated_s2b_exact_equality():
    """space-to-batch dilated stages (dilated_s2b=True) are numerically
    EQUAL to the plain dilated model — same params, same output (residue
    partition identity + identical BN statistics), fwd in both eval and
    train mode including the updated running stats."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pdc_tpu.models.resnet import ResNet18_8s

    H, W = 64, 96  # H/8=8, W/8=12: divisible by 4
    plain = ResNet18_8s(3)
    s2b = ResNet18_8s(3, dilated_s2b=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, H, W, 3))
    v = plain.init(jax.random.PRNGKey(1), x, train=False)

    out_plain = plain.apply(v, x, train=False)
    out_s2b = s2b.apply(v, x, train=False)  # SAME variables
    np.testing.assert_allclose(np.asarray(out_plain), np.asarray(out_s2b),
                               atol=2e-5)

    # train mode: outputs AND updated batch stats agree
    op, mp = plain.apply(v, x, train=True, mutable=["batch_stats"])
    os_, ms = s2b.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(op), np.asarray(os_), atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(mp), jax.tree_util.tree_leaves(ms)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    # gradients agree too (the whole point is a faster backward)
    def loss(params, model):
        return jnp.sum(jnp.square(model.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=False)))

    gp = jax.grad(lambda p: loss(p, plain))(v["params"])
    gs = jax.grad(lambda p: loss(p, s2b))(v["params"])
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gs)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a / scale, b / scale, atol=1e-5)


def test_dilated_s2b_rejects_bad_shapes():
    import jax
    import pytest as _pytest

    from pdc_tpu.models.resnet import ResNet18_8s

    s2b = ResNet18_8s(3, dilated_s2b=True)
    x = jax.numpy.zeros((1, 48, 64, 3))  # H/8=6 not divisible by 4
    with _pytest.raises(ValueError, match="divisible by 4"):
        s2b.init(jax.random.PRNGKey(0), x, train=False)


def test_find_latest_checkpoint_numeric_ordering(tmp_path):
    """Checkpoint discovery: digit-only stems, numeric (not lexicographic)
    latest-pick past step 999999, sidecars never matched."""
    import os

    from pdc_tpu.models.dcn import find_latest_checkpoint

    d = str(tmp_path)
    for name in ("000100.ckpt", "999999.ckpt", "1000000.ckpt",
                 "000100.ckpt.opt", "notes.ckpt"):
        open(os.path.join(d, name), "wb").close()
    assert find_latest_checkpoint(d).endswith("1000000.ckpt")
    # suffix='.opt' must not pick the model-checkpoint sidecar unless the
    # stem is digits
    open(os.path.join(d, "000100.opt"), "wb").close()
    assert find_latest_checkpoint(d, suffix=".opt").endswith("000100.opt")
