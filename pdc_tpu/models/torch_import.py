"""Import torchvision-style ResNet weights into the Flax backbone.

The reference initializes its FCN from an ImageNet-pretrained torchvision
ResNet-34 (via the pytorch-segmentation-detection submodule,
``dense_correspondence_network.py:373-375``). This module maps a
torchvision-naming state dict (``conv1.weight``, ``bn1.*``,
``layerL.B.convN.weight``, ``layerL.B.downsample.{0,1}.*``) onto
:class:`pdc_tpu.models.resnet.ResNetFCN` parameters:

  * conv kernels: torch OIHW -> flax HWIO
  * batch norm: weight/bias -> scale/bias; running_mean/var -> batch_stats
  * ``layer{L}.{B}`` -> ``stage{L}_block{B}``; ``downsample`` -> ``proj_*``

The descriptor head has no torch counterpart and keeps its fresh init.
Works with a ``.pth`` file (torch.load) or any mapping of numpy arrays.
"""

from __future__ import annotations

import os
from typing import Dict, Mapping

import numpy as np


def _conv(w):
    # OIHW -> HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def convert_torchvision_resnet(state_dict: Mapping, variables: Dict) -> Dict:
    """Return new ``{'params', 'batch_stats'}`` with backbone weights replaced.

    :param state_dict: torchvision resnet state dict (tensors or numpy)
    :param variables: the Flax variables pytree from ``module.init``
    """
    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)()) for k, v in state_dict.items()}

    import copy

    params = copy.deepcopy(
        {k: dict(v) if isinstance(v, Mapping) else v for k, v in variables["params"].items()}
    )
    stats = copy.deepcopy(
        {k: dict(v) if isinstance(v, Mapping) else v for k, v in variables["batch_stats"].items()}
    )

    def set_conv(flax_name, torch_name):
        w = _conv(sd[torch_name + ".weight"])
        assert params[flax_name]["kernel"].shape == w.shape, (
            flax_name, params[flax_name]["kernel"].shape, w.shape
        )
        params[flax_name]["kernel"] = w

    def set_bn(flax_name, torch_name):
        params[flax_name]["scale"] = sd[torch_name + ".weight"]
        params[flax_name]["bias"] = sd[torch_name + ".bias"]
        stats[flax_name]["mean"] = sd[torch_name + ".running_mean"]
        stats[flax_name]["var"] = sd[torch_name + ".running_var"]

    set_conv("stem_conv", "conv1")
    set_bn("stem_bn", "bn1")

    stage = 0
    while f"layer{stage + 1}.0.conv1.weight" in sd:
        stage += 1
        block = 0
        while f"layer{stage}.{block}.conv1.weight" in sd:
            prefix = f"layer{stage}.{block}"
            fx = f"stage{stage}_block{block}"
            # nested module layout: params[fx] is a dict of submodules
            blk_params = params[fx]
            blk_stats = stats[fx]

            def bset_conv(sub, tname):
                w = _conv(sd[tname + ".weight"])
                assert blk_params[sub]["kernel"].shape == w.shape
                blk_params[sub]["kernel"] = w

            def bset_bn(sub, tname):
                blk_params[sub]["scale"] = sd[tname + ".weight"]
                blk_params[sub]["bias"] = sd[tname + ".bias"]
                blk_stats[sub]["mean"] = sd[tname + ".running_mean"]
                blk_stats[sub]["var"] = sd[tname + ".running_var"]

            bset_conv("conv1", prefix + ".conv1")
            bset_bn("bn1", prefix + ".bn1")
            bset_conv("conv2", prefix + ".conv2")
            bset_bn("bn2", prefix + ".bn2")
            if prefix + ".conv3.weight" in sd:  # bottleneck (ResNet-50/101)
                bset_conv("conv3", prefix + ".conv3")
                bset_bn("bn3", prefix + ".bn3")
            if prefix + ".downsample.0.weight" in sd:
                bset_conv("proj_conv", prefix + ".downsample.0")
                bset_bn("proj_bn", prefix + ".downsample.1")
            block += 1

    return {"params": params, "batch_stats": stats}


def load_pretrained_backbone(dcn, pth_path: str):
    """Load a torchvision resnet ``.pth`` into a DCN in place."""
    import torch

    sd = torch.load(pth_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    dcn.variables = convert_torchvision_resnet(sd, dcn.variables)
    return dcn


def resolve_pretrained_weights(net_config: Mapping):
    """Resolve the ImageNet-pretrained backbone weights for a
    ``dense_correspondence_network`` config block.

    The reference backbone is ALWAYS ImageNet-pretrained
    (dense_correspondence_network.py:373-383 passes pretrained=True); pdc_tpu
    cannot ship the weights, so ``backbone.pretrained`` opts in explicitly:

      * a path string -> used directly
      * true -> $PDC_PRETRAINED_WEIGHTS, else
        ~/.cache/pdc_tpu/pretrained/<resnetN>.pth (the file
        deploy/setup_tpu_vm.sh's gated download step fetches)

    :return: path string, or None when pretraining is not requested
    :raises FileNotFoundError: pretrained requested but no weights found
    """
    import re

    bb = dict(net_config.get("backbone", {}) or {})
    spec = bb.get("pretrained", False)
    if not spec:
        return None
    if isinstance(spec, str):
        if os.path.exists(spec):
            return spec
        raise FileNotFoundError(
            f"backbone.pretrained points at missing file: {spec}")
    env = os.environ.get("PDC_PRETRAINED_WEIGHTS")
    if env:
        if os.path.exists(env):
            return env
        raise FileNotFoundError(
            f"$PDC_PRETRAINED_WEIGHTS points at missing file: {env}")
    name = bb.get("resnet_name", "Resnet34_8s").lower()
    m = re.match(r"resnet(\d+)", name)
    base = m.group(0) if m else name
    cand = os.path.join(os.path.expanduser("~"), ".cache", "pdc_tpu",
                        "pretrained", base + ".pth")
    if os.path.exists(cand):
        return cand
    raise FileNotFoundError(
        f"backbone.pretrained requested but no weights at {cand}. Fetch them "
        "with PDC_PRETRAINED=1 deploy/setup_tpu_vm.sh (gated download of the "
        "torchvision ImageNet checkpoint), or set $PDC_PRETRAINED_WEIGHTS.")


def maybe_load_pretrained_backbone(variables: Dict, net_config: Mapping) -> Dict:
    """Apply ImageNet initialization when the config asks for it (no-op
    otherwise) — the operative analog of the reference's pretrained=True
    default. Returns (possibly replaced) ``{'params', 'batch_stats'}``."""
    path = resolve_pretrained_weights(net_config)
    if path is None:
        return variables
    import logging

    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    logging.getLogger(__name__).info(
        "initializing backbone from pretrained weights: %s", path)
    return convert_torchvision_resnet(sd, variables)


def convert_reference_dcn(state_dict: Mapping, variables: Dict) -> Dict:
    """Import a checkpoint **trained by the reference framework** — the
    ``%06d.pth`` files its trainer writes (``training.py:510``:
    ``torch.save(dcn.state_dict(), ...)``) — so networks trained with
    pytorch-dense-correspondence run unchanged in pdc_tpu.

    Key layout handled (``dense_correspondence_network.py:425-433``):

      * new style: ``fcn.resnet34_8s.<torchvision name>`` (the DCN module
        wraps the pytorch-segmentation-detection ``Resnet34_8s``, whose
        single child is a torchvision resnet with ``fc`` swapped for a 1x1
        ``Conv2d`` descriptor head)
      * old style: ``resnet34_8s.<torchvision name>`` (``fcn.state_dict()``)
      * any ``module.`` DataParallel prefix is stripped

    The ``fc`` conv becomes our ``head`` (OIHW [D,512,1,1] -> HWIO
    [1,1,512,D]); everything else goes through
    :func:`convert_torchvision_resnet`.
    """
    import re

    sd = {k: np.asarray(getattr(v, "numpy", lambda: v)())
          for k, v in state_dict.items()}

    def strip(prefix):
        nonlocal sd
        if all(k.startswith(prefix) for k in sd):
            sd = {k[len(prefix):]: v for k, v in sd.items()}

    strip("module.")
    strip("fcn.")
    # the single wrapper child, e.g. 'resnet34_8s.' / 'resnet101_8s.'
    heads = {k.split(".", 1)[0] for k in sd}
    if len(heads) == 1 and re.fullmatch(r"resnet\d+_\d+s", next(iter(heads))):
        strip(next(iter(heads)) + ".")

    if "conv1.weight" not in sd:
        raise ValueError(
            "state dict does not look like a reference DCN checkpoint "
            f"(keys start with {sorted({k.split('.', 1)[0] for k in sd})[:5]})")

    fc_w = sd.pop("fc.weight", None)
    fc_b = sd.pop("fc.bias", None)
    out = convert_torchvision_resnet(sd, variables)
    if fc_w is not None:
        w = _conv(fc_w)  # [1, 1, 512, D]
        head = dict(out["params"]["head"])
        assert head["kernel"].shape == w.shape, (head["kernel"].shape, w.shape)
        head["kernel"] = w
        if fc_b is not None:
            head["bias"] = np.asarray(fc_b)
        out["params"]["head"] = head
    return out


def load_reference_checkpoint(dcn, pth_path: str):
    """Load a reference-trained ``%06d.pth`` into a DCN in place."""
    import torch

    sd = torch.load(pth_path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    dcn.variables = convert_reference_dcn(sd, dcn.variables)
    return dcn
