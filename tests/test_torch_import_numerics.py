"""Numerical verification of the torch->flax weight converter (round-3
directive #5): the SAME torchvision-format weights forwarded through (a) a
functional torch implementation of the dilated ResNet-8s (the architecture
the reference's pytorch-segmentation-detection backbone runs,
dense_correspondence_network.py:373-383) and (b) our Flax ResNetFCN with
converted weights must produce the same descriptor image — plus a committed
golden-output fixture so converter/model drift is caught without torch."""

import os

import jax
import numpy as np
import pytest

from pdc_tpu.models.dcn import DenseCorrespondenceNetwork
from pdc_tpu.models.torch_import import convert_reference_dcn

W, H, D = 32, 24, 3

# both basic-block backbones the reference's published protocol uses
# (Resnet34_8s is the paper default, dense_correspondence_network.py:373-383)
MODELS = {
    "Resnet18_8s": (2, 2, 2, 2),
    "Resnet34_8s": (3, 4, 6, 3),
}


def fixture_path(resnet_name: str) -> str:
    return os.path.join(os.path.dirname(__file__), "fixtures",
                        f"{resnet_name.lower()}_convert_golden.npz")


def net_config(resnet_name: str) -> dict:
    return {
        "backbone": {"model_class": "Resnet", "resnet_name": resnet_name},
        "descriptor_dimension": D,
        "image_width": W,
        "image_height": H,
        "normalize": False,
    }


# back-compat aliases (tools/make_convert_golden.py)
FIXTURE = fixture_path("Resnet18_8s")
NET_CONFIG = net_config("Resnet18_8s")
STAGE_SIZES = MODELS["Resnet18_8s"]


def make_state_dict(variables, prefix="fcn.resnet18_8s.",
                    stage_sizes=STAGE_SIZES):
    """Deterministic torchvision-format state dict (the golden 'pretrained
    checkpoint' stand-in — real ImageNet weights are fetched by
    deploy/setup_tpu_vm.sh; this fixture pins the CONVERSION numerics)."""
    rng = np.random.RandomState(0)
    sd = {}
    params, stats = variables["params"], variables["batch_stats"]

    def add_conv(tname, p, fname):
        k = p[fname]["kernel"]  # HWIO
        fan_in = k.shape[0] * k.shape[1] * k.shape[2]
        sd[prefix + tname + ".weight"] = (
            rng.randn(k.shape[3], k.shape[2], k.shape[0], k.shape[1])
            * np.sqrt(2.0 / fan_in)).astype(np.float32)

    def add_bn(tname, p, s, fname):
        sd[prefix + tname + ".weight"] = (
            0.5 + rng.rand(*p[fname]["scale"].shape)).astype(np.float32)
        sd[prefix + tname + ".bias"] = rng.randn(
            *p[fname]["bias"].shape).astype(np.float32) * 0.1
        sd[prefix + tname + ".running_mean"] = rng.randn(
            *s[fname]["mean"].shape).astype(np.float32) * 0.1
        sd[prefix + tname + ".running_var"] = (
            0.5 + rng.rand(*s[fname]["var"].shape)).astype(np.float32)

    add_conv("conv1", params, "stem_conv")
    add_bn("bn1", params, stats, "stem_bn")
    for st, nblocks in enumerate(stage_sizes, start=1):
        for b in range(nblocks):
            fx = f"stage{st}_block{b}"
            for c in ("conv1", "conv2"):
                add_conv(f"layer{st}.{b}.{c}", params[fx], c)
            for bn in ("bn1", "bn2"):
                add_bn(f"layer{st}.{b}.{bn}", params[fx], stats[fx], bn)
            if "proj_conv" in params[fx]:
                add_conv(f"layer{st}.{b}.downsample.0", params[fx], "proj_conv")
                add_bn(f"layer{st}.{b}.downsample.1", params[fx], stats[fx],
                       "proj_bn")
    hk = params["head"]["kernel"]  # [1, 1, 512, D]
    sd[prefix + "fc.weight"] = (rng.randn(hk.shape[3], hk.shape[2], 1, 1)
                                * 0.05).astype(np.float32)
    sd[prefix + "fc.bias"] = rng.randn(hk.shape[3]).astype(np.float32) * 0.1
    return sd


def torch_dilated_resnet_forward(sd, x_nchw, out_hw,
                                 stage_sizes=STAGE_SIZES):
    """Functional torch forward of the dilated ResNet-8s trunk + 1x1 head +
    bilinear x8 upsample — torchvision layer semantics (conv pad=dilation,
    BN eps 1e-5, maxpool 3x3/2 pad 1, align_corners=False), the behavior of
    pytorch-segmentation-detection's Resnet*_8s."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(v) for k, v in sd.items()}
    x = torch.from_numpy(x_nchw)

    def bn(x, name):
        return F.batch_norm(
            x, t[name + ".running_mean"], t[name + ".running_var"],
            t[name + ".weight"], t[name + ".bias"], training=False, eps=1e-5)

    x = F.conv2d(x, t["conv1.weight"], stride=2, padding=3)
    x = F.relu(bn(x, "bn1"))
    x = F.max_pool2d(x, 3, stride=2, padding=1)

    strides, dilations = (1, 2, 1, 1), (1, 1, 2, 4)
    for st, nblocks in enumerate(stage_sizes, start=1):
        for b in range(nblocks):
            p = f"layer{st}.{b}"
            stride = strides[st - 1] if b == 0 else 1
            dil = dilations[st - 1]
            y = F.conv2d(x, t[p + ".conv1.weight"], stride=stride,
                         padding=dil, dilation=dil)
            y = F.relu(bn(y, p + ".bn1"))
            y = F.conv2d(y, t[p + ".conv2.weight"], padding=dil, dilation=dil)
            y = bn(y, p + ".bn2")
            if p + ".downsample.0.weight" in t:
                x = bn(F.conv2d(x, t[p + ".downsample.0.weight"],
                                stride=stride), p + ".downsample.1")
            x = F.relu(y + x)

    x = F.conv2d(x, t["fc.weight"], t["fc.bias"])
    x = F.interpolate(x, size=out_hw, mode="bilinear", align_corners=False)
    return x.numpy()


def _convert(resnet_name: str):
    dcn = DenseCorrespondenceNetwork.from_config(net_config(resnet_name))
    sd = make_state_dict(dcn.variables,
                         prefix=f"fcn.{resnet_name.lower()}.",
                         stage_sizes=MODELS[resnet_name])
    dcn.variables = convert_reference_dcn(sd, dcn.variables)
    rng = np.random.RandomState(1)
    x = rng.rand(1, H, W, 3).astype(np.float32)
    res = np.asarray(dcn.module.apply(dcn.variables, x, train=False))
    return sd, x, res


@pytest.fixture(scope="module")
def converted():
    return _convert("Resnet18_8s")


@pytest.fixture(scope="module")
def converted34():
    return _convert("Resnet34_8s")


def _pair(request, resnet_name):
    return request.getfixturevalue(
        "converted34" if resnet_name == "Resnet34_8s" else "converted")


@pytest.mark.parametrize("resnet_name", sorted(MODELS))
def test_converted_forward_matches_torch(request, resnet_name):
    """Layer-for-layer architecture + conversion numerics: flax forward on
    converted weights == torch forward on the original state dict — for the
    reference's published Resnet34_8s default AND the light Resnet18_8s."""
    sd, x, res_flax = _pair(request, resnet_name)
    sd_stripped = {k.split(".", 2)[-1]: v for k, v in sd.items()}
    res_torch = torch_dilated_resnet_forward(
        sd_stripped, np.transpose(x, (0, 3, 1, 2)), (H, W),
        stage_sizes=MODELS[resnet_name])
    res_torch = np.transpose(res_torch, (0, 2, 3, 1))
    assert res_flax.shape == res_torch.shape == (1, H, W, D)
    scale = np.abs(res_torch).max()
    np.testing.assert_allclose(res_flax / scale, res_torch / scale,
                               atol=2e-5)


@pytest.mark.parametrize("resnet_name", sorted(MODELS))
def test_converted_forward_matches_golden(request, resnet_name):
    """Committed golden output: catches converter OR model drift without
    needing torch at test time (regenerate with
    tools/make_convert_golden.py after intentional changes)."""
    _, x, res_flax = _pair(request, resnet_name)
    golden = np.load(fixture_path(resnet_name))
    np.testing.assert_allclose(np.asarray(golden["input"]), x, atol=0)
    scale = np.abs(golden["output"]).max()
    np.testing.assert_allclose(res_flax / scale, golden["output"] / scale,
                               atol=1e-4)


def test_pretrained_gating(tmp_path, monkeypatch, converted):
    """backbone.pretrained wiring: path / env resolution, ImageNet init in
    from_config and create_train_state, actionable error when missing."""
    import torch

    from pdc_tpu.models.torch_import import resolve_pretrained_weights

    sd, _, _ = converted
    # a torchvision-format file (backbone only, no fc)
    tv_sd = {k.split(".", 2)[-1]: torch.from_numpy(v) for k, v in sd.items()
             if ".fc." not in k}
    pth = str(tmp_path / "resnet18.pth")
    torch.save(tv_sd, pth)

    # 1. explicit path
    cfg = dict(NET_CONFIG)
    cfg["backbone"] = dict(cfg["backbone"], pretrained=pth)
    dcn = DenseCorrespondenceNetwork.from_config(cfg)
    want = np.transpose(sd["fcn.resnet18_8s.conv1.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(dcn.variables["params"]["stem_conv"]["kernel"]), want)

    # 2. pretrained: true resolves via $PDC_PRETRAINED_WEIGHTS
    monkeypatch.setenv("PDC_PRETRAINED_WEIGHTS", pth)
    cfg2 = dict(NET_CONFIG)
    cfg2["backbone"] = dict(cfg2["backbone"], pretrained=True)
    assert resolve_pretrained_weights(cfg2) == pth

    # 3. create_train_state applies it too (the trainer path)
    from pdc_tpu.models.dcn import build_backbone
    from pdc_tpu.training.train import create_train_state

    full = {"training": {"learning_rate": 1e-4, "learning_rate_decay": 0.9,
                         "steps_between_learning_rate_decay": 250,
                         "weight_decay": 1e-4},
            "dense_correspondence_network": cfg2}
    model = build_backbone(cfg2)
    state, _ = create_train_state(model, full, jax.random.PRNGKey(0), (H, W))
    np.testing.assert_allclose(
        np.asarray(state.params["stem_conv"]["kernel"]), want)

    # 4. missing weights -> actionable error naming the deploy step
    monkeypatch.delenv("PDC_PRETRAINED_WEIGHTS")
    monkeypatch.setenv("HOME", str(tmp_path / "empty_home"))
    with pytest.raises(FileNotFoundError, match="setup_tpu_vm"):
        resolve_pretrained_weights(cfg2)

    # 5. pretrained absent/false -> no-op
    assert resolve_pretrained_weights(dict(NET_CONFIG)) is None
