"""DenseCorrespondenceNetwork — the user-facing model wrapper.

Keeps the reference's API surface (``dense_correspondence_network.py:21-550``)
on top of a Flax module + explicit variables:

  * ``forward`` / ``forward_single_image_tensor`` / ``forward_on_img``
  * ``process_network_output`` ([B,H,W,D] -> [B, H*W, D], flat index
    n = v*W + u — the load-bearing convention shared with the losses)
  * ``find_best_match`` / ``find_best_match_for_descriptor`` (on-device)
  * ``from_config`` / ``from_model_folder`` with the same model-folder
    contract (training.yaml + step-indexed checkpoints +
    descriptor_statistics.yaml + identifier.yaml)

Unlike the reference there is no mutable nn.Module state: parameters and
batch stats live in an explicit ``variables`` pytree, so the same wrapper
works under jit, vmap, and pjit without ceremony.
"""

from __future__ import annotations

import glob
import os
from typing import Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np

from pdc_tpu.models.resnet import (
    ResNet18_8s,
    ResNet34_8s,
    ResNet50_8s,
    ResNet101_8s,
)
from pdc_tpu.models.unet import UNet
from pdc_tpu.ops.matching import (
    best_match_for_descriptor,
    best_matches_batch,
    norm_diffs_for_descriptor,
)
from pdc_tpu.utils.constants import (
    DEFAULT_IMAGE_HEIGHT,
    DEFAULT_IMAGE_MEAN,
    DEFAULT_IMAGE_STD,
    DEFAULT_IMAGE_WIDTH,
)
from pdc_tpu.utils.yaml_io import load_yaml


def build_backbone(config: dict, dtype=None):
    """Construct the FCN from a ``dense_correspondence_network`` config block
    (reference ``get_fcn``/``get_unet``, dense_correspondence_network.py:347-383).

    TPU extras beyond the reference surface: ``compute_dtype``
    ('float32' | 'bfloat16'), ``remat`` (bool), ``dilated_s2b`` (bool) and
    ``quant_int8`` (bool — int8 PTQ serving convs, inference only; see also
    ``DCN.quantized`` / ``DCN.calibrate_quantization``) config keys.
    """
    backbone = config.get("backbone", {"model_class": "Resnet", "resnet_name": "Resnet34_8s"})
    d = config["descriptor_dimension"]
    if dtype is None:
        dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
            config.get("compute_dtype", "float32")
        ]
    remat = bool(config.get("remat", False))
    if backbone["model_class"] == "Resnet":
        name = backbone.get("resnet_name", "Resnet34_8s")
        factories = {
            "Resnet18_8s": ResNet18_8s,
            "Resnet34_8s": ResNet34_8s,
            "Resnet50_8s": ResNet50_8s,
            "Resnet101_8s": ResNet101_8s,
        }
        if name not in factories:
            raise ValueError(f"unsupported resnet_name: {name}")
        fcn = factories[name](d, dtype=dtype, remat=remat,
                              dilated_s2b=bool(config.get("dilated_s2b",
                                                          False)))
        if config.get("quant_int8", False):
            import dataclasses as _dc
            fcn = _dc.replace(fcn, quant_int8=True)
        return fcn
    if backbone["model_class"] == "Unet":
        return UNet(num_classes=d, dtype=dtype,
                    quant_int8=bool(config.get("quant_int8", False)))
    raise ValueError(f"unknown backbone model_class: {backbone['model_class']}")


class DenseCorrespondenceNetwork:
    def __init__(
        self,
        module,
        variables,
        descriptor_dimension: int,
        image_width: int = DEFAULT_IMAGE_WIDTH,
        image_height: int = DEFAULT_IMAGE_HEIGHT,
        normalize: bool = False,
        config: Optional[dict] = None,
    ):
        self.module = module
        self.variables = variables
        self._descriptor_dimension = descriptor_dimension
        self._image_width = image_width
        self._image_height = image_height
        self._normalize = normalize
        self.config = dict(config or {})
        self._image_mean = np.asarray(DEFAULT_IMAGE_MEAN)
        self._image_std_dev = np.asarray(DEFAULT_IMAGE_STD)
        self._descriptor_image_stats = None
        self.model_folder = None

        @jax.jit
        def _apply(variables, imgs):
            out = self.module.apply(variables, imgs, train=False)
            if self._normalize:
                norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
                out = out / jnp.maximum(norm, 1e-12)
            return out

        self._apply = _apply

    # -- properties mirroring the reference ----------------------------------

    @property
    def descriptor_dimension(self):
        return self._descriptor_dimension

    @property
    def image_shape(self):
        return [self._image_height, self._image_width]

    @property
    def image_mean(self):
        return self._image_mean

    @image_mean.setter
    def image_mean(self, value):
        self._image_mean = np.asarray(value)

    @property
    def image_std_dev(self):
        return self._image_std_dev

    @image_std_dev.setter
    def image_std_dev(self, value):
        self._image_std_dev = np.asarray(value)

    @property
    def path_to_network_params_folder(self):
        if "path_to_network_params_folder" not in self.config:
            raise ValueError("config has no path_to_network_params_folder entry")
        return self.config["path_to_network_params_folder"]

    @property
    def descriptor_image_stats(self):
        """Lazily loads descriptor_statistics.yaml from the model folder
        (reference :138-154)."""
        if self._descriptor_image_stats is None:
            stats_file = os.path.join(
                self.path_to_network_params_folder, "descriptor_statistics.yaml"
            )
            self._descriptor_image_stats = load_yaml(stats_file)
        return self._descriptor_image_stats

    @property
    def fcn(self):
        """The backbone module (reference :62 returns the torch fcn)."""
        return self.module

    @property
    def unique_identifier(self):
        """The model folder's identifier (reference :170-195):
        '<id>+<checkpoint tail>' when constructed from a folder with an
        identifier.yaml (the trainer writes ``{'id': uuid}``), else None."""
        folder = self.config.get("path_to_network_params_folder")
        if not folder:
            return None
        path = os.path.join(folder, "identifier.yaml")
        if not os.path.exists(path):
            return None
        ident = load_yaml(path).get("id")
        if ident is None:
            return None
        tail = self.config.get("model_param_filename_tail", "")
        return f"{ident}+{tail}"

    @property
    def constructed_from_model_folder(self) -> bool:
        """True when built by from_model_folder (reference :157-167)."""
        return bool(self.config.get("path_to_network_params_folder"))

    # -- forward passes -------------------------------------------------------

    def forward_on_img_tensor(self, img):
        """[H, W, 3] float RGB in [0, 1] -> descriptor image. Deprecated in
        the reference too (:221-236: runs the fcn WITHOUT the mean/std
        normalization); kept with the same no-normalization contract so
        migrated callers get reference behavior. Use :meth:`forward` /
        :meth:`forward_on_img` instead."""
        import warnings

        warnings.warn("use forward/forward_on_img instead", DeprecationWarning)
        return self.forward_single_image_tensor(
            jnp.asarray(img, jnp.float32))

    def forward(self, img_tensor):
        """Forward a batch of already-normalized images.

        :param img_tensor: [B, H, W, 3] float32 (NHWC — TPU native; the
            reference is NCHW)
        :return: [B, H, W, D] float32 descriptor images
        """
        return self._apply(self.variables, jnp.asarray(img_tensor))

    def forward_single_image_tensor(self, img_tensor):
        """[H, W, 3] normalized image -> [H, W, D] descriptor image
        (reference :265-299; stays on device)."""
        img_tensor = jnp.asarray(img_tensor)
        assert img_tensor.ndim == 3
        return self.forward(img_tensor[None])[0]

    def forward_on_img(self, img):
        """uint8 RGB [H, W, 3] -> descriptor image; applies the stored
        mean/std normalization (reference :207-218 + dataset ToTensor)."""
        x = jnp.asarray(img, jnp.float32) / 255.0
        x = (x - jnp.asarray(self._image_mean, jnp.float32)) / jnp.asarray(
            self._image_std_dev, jnp.float32
        )
        return self.forward_single_image_tensor(x)

    def process_network_output(self, image_pred, N: int):
        """[N, H, W, D] -> [N, H*W, D]; row-major over (v, u) so flat index
        n = v*W + u matches the loss/index convention (reference :303-319)."""
        D = self._descriptor_dimension
        return jnp.reshape(image_pred, (N, self._image_height * self._image_width, D))

    def clip_pixel_to_image_size_and_round(self, uv):
        u = min(int(round(uv[0])), self._image_width - 1)
        v = min(int(round(uv[1])), self._image_height - 1)
        return [max(u, 0), max(v, 0)]

    # -- best match (on device) ----------------------------------------------

    @staticmethod
    def find_best_match(pixel_a, res_a, res_b, mask_b=None):
        """Best match in image b for the descriptor at ``pixel_a`` in image a.

        :return: (best_match_uv [2] int, best_match_diff float, norm_diffs
            [H, W]) — same contract as the reference (:488-525) but computed
            on device.
        """
        res_a = jnp.asarray(res_a)
        d = res_a[pixel_a[1], pixel_a[0]]
        uv, diff, nd = best_match_for_descriptor(d, jnp.asarray(res_b))
        return uv, diff, nd

    @staticmethod
    def find_best_match_for_descriptor(descriptor, res):
        return best_match_for_descriptor(jnp.asarray(descriptor), jnp.asarray(res))

    @staticmethod
    def find_best_matches_batch(queries, res, mask=None):
        return best_matches_batch(queries, res, mask=mask)

    def evaluate_descriptor_at_keypoints(self, res, keypoints_uv):
        """Gather descriptors at (u, v) keypoints -> [N, D] float32
        (reference :553-579, there broken/NotImplemented; here supported)."""
        res = jnp.asarray(res)
        kp = np.asarray(keypoints_uv)
        u = np.clip(np.round(kp[:, 0]).astype(int), 0, self._image_width - 1)
        v = np.clip(np.round(kp[:, 1]).astype(int), 0, self._image_height - 1)
        return np.asarray(res[v, u, :], dtype=np.float32)

    def load_training_dataset(self, mode: str = "train"):
        """Reconstruct the dataset this network was trained on from the model
        folder's dataset.yaml snapshot (reference
        dense_correspondence_network.py `load_training_dataset`)."""
        from pdc_tpu.data.dataset import SpartanDataset

        folder = self.model_folder or self.path_to_network_params_folder
        config = load_yaml(os.path.join(folder, "dataset.yaml"))
        return SpartanDataset.from_dataset_config(config, mode=mode)

    # -- constructors ----------------------------------------------------------

    @staticmethod
    def from_config(config: dict, rng=None, load_stored_params: bool = False,
                    model_param_file: Optional[str] = None, dtype=jnp.float32):
        """Build (and optionally load) a network from a
        ``dense_correspondence_network`` config block (reference :386-438)."""
        module = build_backbone(config, dtype=dtype)
        H = config.get("image_height", DEFAULT_IMAGE_HEIGHT)
        W = config.get("image_width", DEFAULT_IMAGE_WIDTH)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        variables = module.init(rng, jnp.zeros((1, H, W, 3), jnp.float32), train=False)
        # skip the ImageNet init when stored params are about to replace it
        # anyway — a trained model folder must stay loadable on hosts without
        # torch or the cached pretrained .pth
        if (config.get("backbone") or {}).get("pretrained") and not load_stored_params:
            from pdc_tpu.models.torch_import import maybe_load_pretrained_backbone

            variables = maybe_load_pretrained_backbone(variables, config)

        dcn = DenseCorrespondenceNetwork(
            module,
            variables,
            descriptor_dimension=config["descriptor_dimension"],
            image_width=W,
            image_height=H,
            normalize=config.get("normalize", False),
            config=config,
        )
        if load_stored_params:
            assert model_param_file is not None
            dcn.load_checkpoint(model_param_file)
        return dcn

    @staticmethod
    def from_model_folder(model_folder: str, model_param_file: Optional[str] = None,
                          iteration: Optional[int] = None, dtype=jnp.float32):
        """Reconstruct a network from a training output folder holding
        ``training.yaml`` and ``%06d.ckpt`` files (reference :441-485)."""
        training_config = load_yaml(os.path.join(model_folder, "training.yaml"))
        config = dict(training_config["dense_correspondence_network"])
        config["path_to_network_params_folder"] = model_folder

        if model_param_file is None:
            model_param_file = find_latest_checkpoint(model_folder, iteration)
        config["model_param_filename_tail"] = os.path.basename(model_param_file)

        dcn = DenseCorrespondenceNetwork.from_config(
            config, load_stored_params=True, model_param_file=model_param_file,
            dtype=dtype,
        )
        dcn.model_folder = model_folder
        return dcn

    def quantized(self, static: bool = False,
                  variables=None) -> "DenseCorrespondenceNetwork":
        """A serving clone whose convolutions run the int8 PTQ path
        (models/resnet.py ``Int8Conv``; ~1.36x the bf16 forward on v5e,
        ~1.70x with ``static=True`` — see BENCHMARKS.md). Shares this
        network's weights; inference only.

        ``static=True`` uses calibrated per-layer activation scales instead
        of per-call abs-max; the variables must then carry a
        ``quant_scales`` collection — call :meth:`calibrate_quantization`
        to produce the clone directly."""
        import dataclasses as _dc

        if not hasattr(self.module, "quant_int8"):
            raise ValueError(
                f"{type(self.module).__name__} has no int8 serving path")
        variables = self.variables if variables is None else variables
        if static and "quant_scales" not in variables:
            raise ValueError(
                "static int8 serving needs calibrated scales — use "
                "dcn.calibrate_quantization(images)")
        clone = DenseCorrespondenceNetwork(
            _dc.replace(self.module, quant_int8=True, quant_static=static),
            variables,
            self._descriptor_dimension, self._image_width, self._image_height,
            normalize=self._normalize,
            config={**self.config, "quant_int8": True},
        )
        clone.image_mean = self.image_mean
        clone.image_std_dev = self.image_std_dev
        clone.model_folder = self.model_folder
        if self._descriptor_image_stats is not None:
            clone._descriptor_image_stats = self._descriptor_image_stats
        return clone

    def calibrate_quantization(self, images, batch_size: int = 8,
                               headroom: float = 1.0) -> "DenseCorrespondenceNetwork":
        """Calibrate static int8 activation scales and return the serving
        clone (``quantized(static=True)``).

        Runs the int8 forward over ``images`` (an iterable of [H, W, 3]
        uint8 RGB arrays — e.g. training frames) with the ``quant_scales``
        collection mutable; each ``Int8Conv`` max-accumulates its observed
        per-tensor abs-max across all batches. The per-call abs-max pass
        this removes costs ~20% of the int8 forward
        (tools/tpu_probe_int8_static.py). ``headroom`` scales the final
        scales up (>1.0 leaves margin for activations outside the
        calibration distribution; outliers beyond it saturate at +-127,
        which the hinge-style descriptor losses tolerate)."""
        import dataclasses as _dc

        if not hasattr(self.module, "quant_static"):
            raise ValueError(
                f"{type(self.module).__name__} has no static int8 path")
        module = _dc.replace(self.module, quant_int8=True, quant_static=True)
        mean = jnp.asarray(self.image_mean, jnp.float32)
        std = jnp.asarray(self.image_std_dev, jnp.float32)

        @jax.jit
        def observe(variables, rgb_u8):
            x = (rgb_u8.astype(jnp.float32) / 255.0 - mean) / std
            _, mutated = module.apply(variables, x, train=False,
                                      mutable=["quant_scales"])
            return mutated["quant_scales"]

        batch = []
        variables = dict(self.variables)
        variables.setdefault("quant_scales", {})

        def flush():
            nonlocal variables
            if not batch:
                return
            rgb = jnp.asarray(np.stack(batch), jnp.uint8)
            scales = observe(variables, rgb)
            variables = {**variables, "quant_scales": scales}
            batch.clear()

        for img in images:
            batch.append(np.asarray(img, np.uint8))
            if len(batch) == batch_size:
                flush()
        flush()
        if headroom != 1.0:
            variables["quant_scales"] = jax.tree_util.tree_map(
                lambda s: s * headroom, variables["quant_scales"])
        return self.quantized(static=True, variables=variables)

    @staticmethod
    def from_reference_model_folder(model_folder: str,
                                    model_param_file: Optional[str] = None,
                                    iteration: Optional[int] = None,
                                    dtype=jnp.float32):
        """Load a model folder written by the REFERENCE framework — the
        torch ``%06d.pth`` checkpoints of pytorch-dense-correspondence
        (training.py:510) — so already-trained reference networks migrate
        to pdc_tpu without retraining. The folder contract is the same
        (training.yaml + dataset.yaml + step-indexed checkpoints); only the
        weight container differs.
        """
        training_config = load_yaml(os.path.join(model_folder, "training.yaml"))
        config = dict(training_config["dense_correspondence_network"])
        config["path_to_network_params_folder"] = model_folder

        if model_param_file is None:
            model_param_file = find_latest_checkpoint(model_folder, iteration,
                                                      suffix=".pth")
        config["model_param_filename_tail"] = os.path.basename(model_param_file)

        dcn = DenseCorrespondenceNetwork.from_config(config, dtype=dtype)
        from pdc_tpu.models.torch_import import load_reference_checkpoint

        load_reference_checkpoint(dcn, model_param_file)
        dcn.model_folder = model_folder
        return dcn

    # -- persistence -----------------------------------------------------------

    def save_checkpoint(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            f.write(flax.serialization.to_bytes(self.variables))

    def load_checkpoint(self, path: str):
        with open(path, "rb") as f:
            self.variables = flax.serialization.from_bytes(self.variables, f.read())


def find_latest_checkpoint(model_folder: str, iteration: Optional[int] = None,
                           suffix: str = ".ckpt") -> str:
    """Find a ``%06d.ckpt`` (or ``.pth``) in a model folder (reference
    utils.py:279-309 get_model_param_file_from_directory)."""
    if iteration is not None:
        path = os.path.join(model_folder, "%06d" % iteration + suffix)
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        return path
    # all-digit stems only, so sidecars that happen to share the suffix
    # (e.g. '000100.ckpt.opt' matched by suffix='.opt') can never be picked;
    # numeric sort because '%06d' grows to 7 digits past step 999999, where
    # lexicographic order would pick the wrong "latest"
    files = sorted(
        (f for f in glob.glob(os.path.join(model_folder, "*" + suffix))
         if os.path.basename(f)[: -len(suffix)].isdigit()),
        key=lambda f: int(os.path.basename(f)[: -len(suffix)]))
    if not files:
        raise FileNotFoundError(f"no {suffix} files in {model_folder}")
    return files[-1]
