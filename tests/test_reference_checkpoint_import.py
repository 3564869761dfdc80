"""Importing checkpoints trained by the REFERENCE framework (the
``%06d.pth`` files written by training.py:510) into pdc_tpu — the migration
path for users with already-trained pytorch-dense-correspondence networks."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdc_tpu.models.dcn import DenseCorrespondenceNetwork
from pdc_tpu.models.torch_import import convert_reference_dcn
from pdc_tpu.utils.yaml_io import save_yaml

W, H, D = 64, 48, 3

NET_CONFIG = {
    "backbone": {"model_class": "Resnet", "resnet_name": "Resnet34_8s"},
    "descriptor_dimension": D,
    "image_width": W,
    "image_height": H,
    "normalize": False,
}


def _fake_reference_state_dict(variables, prefix="fcn.resnet34_8s."):
    """Synthesize the reference's DCN state dict (torchvision naming under
    the Resnet34_8s wrapper, fc = 1x1 conv head) with shapes taken from the
    Flax tree."""
    rng = np.random.RandomState(7)
    sd = {}
    params, stats = variables["params"], variables["batch_stats"]

    def add_conv(tname, p, fname):
        k = p[fname]["kernel"]  # HWIO
        # He-scaled so the 34-layer forward stays finite (inference BN uses
        # running stats, so it does not renormalize bad weight magnitudes)
        fan_in = k.shape[0] * k.shape[1] * k.shape[2]
        sd[prefix + tname + ".weight"] = (
            rng.randn(k.shape[3], k.shape[2], k.shape[0], k.shape[1])
            * np.sqrt(2.0 / fan_in)).astype(np.float32)

    def add_bn(tname, p, s, fname):
        sd[prefix + tname + ".weight"] = rng.rand(*p[fname]["scale"].shape).astype(np.float32)
        sd[prefix + tname + ".bias"] = rng.rand(*p[fname]["bias"].shape).astype(np.float32)
        sd[prefix + tname + ".running_mean"] = rng.rand(*s[fname]["mean"].shape).astype(np.float32)
        sd[prefix + tname + ".running_var"] = (
            rng.rand(*s[fname]["var"].shape) + 0.5).astype(np.float32)

    add_conv("conv1", params, "stem_conv")
    add_bn("bn1", params, stats, "stem_bn")
    for st, nblocks in enumerate([3, 4, 6, 3], start=1):
        for b in range(nblocks):
            fx = f"stage{st}_block{b}"
            for c in ("conv1", "conv2"):
                add_conv(f"layer{st}.{b}.{c}", params[fx], c)
            for bn in ("bn1", "bn2"):
                add_bn(f"layer{st}.{b}.{bn}", params[fx], stats[fx], bn)
            if "proj_conv" in params[fx]:
                add_conv(f"layer{st}.{b}.downsample.0", params[fx], "proj_conv")
                add_bn(f"layer{st}.{b}.downsample.1", params[fx], stats[fx], "proj_bn")
    # the descriptor head: reference swaps resnet fc for a 1x1 Conv2d
    hk = params["head"]["kernel"]  # [1, 1, 512, D]
    sd[prefix + "fc.weight"] = rng.rand(
        hk.shape[3], hk.shape[2], 1, 1).astype(np.float32)
    sd[prefix + "fc.bias"] = rng.rand(hk.shape[3]).astype(np.float32)
    return sd


@pytest.fixture(scope="module")
def fresh_dcn():
    return DenseCorrespondenceNetwork.from_config(dict(NET_CONFIG))


def test_convert_reference_dcn_maps_head_and_backbone(fresh_dcn):
    sd = _fake_reference_state_dict(fresh_dcn.variables)
    out = convert_reference_dcn(sd, fresh_dcn.variables)
    # head kernel is the fc conv, OIHW -> HWIO
    np.testing.assert_allclose(
        np.asarray(out["params"]["head"]["kernel"]),
        sd["fcn.resnet34_8s.fc.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(np.asarray(out["params"]["head"]["bias"]),
                               sd["fcn.resnet34_8s.fc.bias"])
    # a mid-network conv landed transposed too
    np.testing.assert_allclose(
        np.asarray(out["params"]["stage3_block2"]["conv2"]["kernel"]),
        sd["fcn.resnet34_8s.layer3.2.conv2.weight"].transpose(2, 3, 1, 0))
    # batch stats came from running_mean/var
    np.testing.assert_allclose(
        np.asarray(out["batch_stats"]["stem_bn"]["mean"]),
        sd["fcn.resnet34_8s.bn1.running_mean"])


def test_convert_reference_dcn_old_style_prefix(fresh_dcn):
    """Old checkpoints were saved as fcn.state_dict() — no 'fcn.' prefix
    (dense_correspondence_network.py:432-433 fallback)."""
    sd = _fake_reference_state_dict(fresh_dcn.variables,
                                    prefix="resnet34_8s.")
    out = convert_reference_dcn(sd, fresh_dcn.variables)
    np.testing.assert_allclose(
        np.asarray(out["params"]["head"]["kernel"]),
        sd["resnet34_8s.fc.weight"].transpose(2, 3, 1, 0))


def test_convert_reference_dcn_rejects_garbage(fresh_dcn):
    with pytest.raises(ValueError, match="reference DCN"):
        convert_reference_dcn({"encoder.w": np.zeros(3)}, fresh_dcn.variables)


def test_from_reference_model_folder(tmp_path, fresh_dcn):
    torch = pytest.importorskip("torch")

    sd = {k: torch.from_numpy(v)
          for k, v in _fake_reference_state_dict(fresh_dcn.variables).items()}
    folder = tmp_path / "ref_net"
    folder.mkdir()
    torch.save(sd, str(folder / "000500.pth"))
    # optimizer sidecar must not be picked up as the checkpoint
    torch.save({"state": {}}, str(folder / "000500.pth.opt"))
    save_yaml({"dense_correspondence_network": dict(NET_CONFIG)},
              str(folder / "training.yaml"))

    dcn = DenseCorrespondenceNetwork.from_reference_model_folder(str(folder))
    assert dcn.config["model_param_filename_tail"] == "000500.pth"
    assert dcn.descriptor_dimension == D
    # imported weights drive the forward
    img = jnp.zeros((H, W, 3), jnp.float32)
    res = dcn.forward_single_image_tensor(img)
    assert res.shape == (H, W, D)
    assert np.all(np.isfinite(np.asarray(res)))
    # and differ from a fresh init's output
    res_fresh = fresh_dcn.forward_single_image_tensor(img)
    assert not np.allclose(np.asarray(res), np.asarray(res_fresh))
