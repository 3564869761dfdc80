"""Serving export — freeze the descriptor-inference program to StableHLO.

The reference has no deployment story beyond "run the python stack in the
docker image"; production TPU serving wants a self-contained compiled
artifact instead. This module exports the full inference program — uint8
RGB batch -> normalize -> FCN forward -> [B, H, W, D] descriptor images —
via ``jax.export``: one serialized StableHLO blob with the trained weights
baked in as constants, loadable by any JAX runtime (or any consumer of
StableHLO) without the pdc_tpu package, python model code, or checkpoint
files.

Cross-platform: pass ``platforms=["tpu"]`` to lower for TPU from a CPU-only
host (the artifact is then executable on TPU serving hosts only).

CLI:
    python -m pdc_tpu.apps.export_serving --model_folder trained_models/net \
        --batch_size 8 --output net_b8.stablehlo [--platform tpu]
"""

from __future__ import annotations

import argparse
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def export_inference(dcn, batch_size: int = 1,
                     platforms: Optional[Sequence[str]] = None):
    """:return: a ``jax.export.Exported`` of the uint8-in inference program
    (weights baked in). ``exported.call(rgb_u8)`` runs it; ``.serialize()``
    produces the portable blob."""
    from jax import export as jax_export

    mean = jnp.asarray(dcn.image_mean, jnp.float32)
    std = jnp.asarray(dcn.image_std_dev, jnp.float32)
    variables = dcn.variables
    module = dcn.module
    H, W = dcn.image_shape

    def serve(rgb_u8):
        x = rgb_u8.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        return module.apply(variables, x, train=False).astype(jnp.float32)

    spec = jax.ShapeDtypeStruct((batch_size, H, W, 3), jnp.uint8)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    return jax_export.export(jax.jit(serve), **kwargs)(spec)


def save_exported(exported, path: str) -> int:
    """Write the serialized artifact; returns byte count."""
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_exported(path: str):
    """Deserialize a saved artifact. ``.call(rgb_u8)`` serves it."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def export_model_folder(model_folder: str, output: str, batch_size: int = 1,
                        platforms: Optional[Sequence[str]] = None,
                        iteration: Optional[int] = None,
                        quantize=False, calibration_frames: int = 16) -> int:
    """Export a trained model folder's latest checkpoint; returns bytes.

    ``quantize=True`` freezes the int8 PTQ serving program instead
    (``DCN.quantized()`` — s8 x s8 MXU convs, ~1.36x the bf16 forward on
    v5e with PCK parity); ``quantize="static"`` additionally calibrates
    static activation scales on ``calibration_frames`` train-split frames
    of the folder's dataset snapshot (~1.70x; see BENCHMARKS.md) and bakes
    them into the artifact."""
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

    dcn = DenseCorrespondenceNetwork.from_model_folder(model_folder,
                                                       iteration=iteration)
    if quantize == "static":
        dataset = dcn.load_training_dataset("train")
        dataset.reset_seed(7)
        calib = [dataset.get_random_rgbd_mask_pose()[0]
                 for _ in range(calibration_frames)]
        dcn = dcn.calibrate_quantization(calib)
    elif quantize:
        dcn = dcn.quantized()
    exported = export_inference(dcn, batch_size=batch_size,
                                platforms=platforms)
    return save_exported(exported, output)


if __name__ == "__main__":  # pragma: no cover
    p = argparse.ArgumentParser()
    p.add_argument("--model_folder", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--platform", default=None,
                   help="lowering target (e.g. tpu); default = this host")
    p.add_argument("--iteration", type=int, default=None)
    p.add_argument("--int8", action="store_true",
                   help="freeze the int8 PTQ serving program (DCN.quantized)")
    p.add_argument("--int8_static", action="store_true",
                   help="int8 with static scales calibrated on the folder's "
                        "train dataset (fastest serving path)")
    args = p.parse_args()

    n = export_model_folder(
        args.model_folder, args.output, batch_size=args.batch_size,
        platforms=[args.platform] if args.platform else None,
        iteration=args.iteration,
        quantize="static" if args.int8_static else args.int8)
    print(f"wrote {args.output} ({n / 1e6:.1f} MB)")
