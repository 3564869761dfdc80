"""Batched per-scene descriptor-image export.

Rebuild of ``modules/.../scripts/compute_descriptor_images.py:38-96``: run a
trained network over every frame of every scene and save [H, W, D] float
descriptor images under ``processed/descriptor_images/<network>/``. Unlike
the reference's frame-at-a-time loop, frames are batched through one jitted
forward (the TPU serving path).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def compute_descriptor_images_for_scene(dcn, scene, out_dir: str,
                                        batch_size: int = 8):
    """:param scene: a :class:`pdc_tpu.data.dataset.SceneData`"""
    os.makedirs(out_dir, exist_ok=True)
    mean = jnp.asarray(dcn.image_mean, jnp.float32)
    std = jnp.asarray(dcn.image_std_dev, jnp.float32)

    @jax.jit
    def fwd(variables, rgb_u8):
        x = rgb_u8.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        return dcn.module.apply(variables, x, train=False)

    n = scene.num_frames
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        batch = scene.rgb[idxs[0]: idxs[-1] + 1]
        if batch.shape[0] < batch_size:  # pad to keep one compiled shape
            pad = np.repeat(batch[-1:], batch_size - batch.shape[0], axis=0)
            batch = np.concatenate([batch, pad], axis=0)
        res = np.asarray(fwd(dcn.variables, jnp.asarray(batch)))
        for j, idx in enumerate(idxs):
            # name by the frame's on-disk %06d index (reference
            # compute_descriptor_images.py:63 keys files by pose-data index)
            np.save(os.path.join(
                out_dir, "%06d_descriptor.npy" % scene.frame_id(idx)), res[j])
    return n


def run(model_folder: str, dataset, network_name: str = None,
        batch_size: int = 8, quantize=False):
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

    dcn = DenseCorrespondenceNetwork.from_model_folder(model_folder)
    if quantize == "static":
        # calibrate static int8 scales on the first frames of the first scene
        first = next(iter(dataset.scenes.values()))
        dcn = dcn.calibrate_quantization(
            list(first.rgb[:16]), batch_size=batch_size)
    elif quantize:
        dcn = dcn.quantized()
    network_name = network_name or os.path.basename(os.path.normpath(model_folder))
    total = 0
    for name, scene in dataset.scenes.items():
        out_dir = os.path.join(
            "descriptor_images_out", name, "descriptor_images", network_name
        )
        total += compute_descriptor_images_for_scene(dcn, scene, out_dir, batch_size)
    return total


if __name__ == "__main__":  # pragma: no cover
    p = argparse.ArgumentParser()
    p.add_argument("--model_folder", required=True)
    p.add_argument("--config", required=True, help="composite dataset yaml")
    p.add_argument("--data_dir", default=os.environ.get("DC_DATA_DIR", "."))
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--int8", action="store_true",
                   help="int8 PTQ serving forward (dynamic scales)")
    p.add_argument("--int8_static", action="store_true",
                   help="int8 with static calibrated scales (fastest)")
    args = p.parse_args()

    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.utils.yaml_io import load_yaml

    ds = SpartanDataset(config=load_yaml(args.config), data_dir=args.data_dir,
                        config_dir=os.path.dirname(args.config))
    n = run(args.model_folder, ds, batch_size=args.batch_size,
            quantize="static" if args.int8_static else args.int8)
    print(f"wrote descriptor images for {n} frames")
