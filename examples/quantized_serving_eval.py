"""int8-PTQ serving accuracy: trained-model PCK parity vs the float path.

Loads the committed ``trained_models/tpu_journey`` network (the full
reference 3500-step schedule at 640x480), rebuilds its training dataset from
the dataset.yaml snapshot, and runs the complete quantitative evaluation
sweep three times — float (bf16), ``dcn.quantized()`` (dynamic int8), and
``dcn.calibrate_quantization(...)`` (static calibrated scales; calibration
frames come from the TRAIN split, never the eval split). Writes the CSVs
plus a summary.json with PCK@k / median pixel error / 3D error per path
under ``trained_models/quantized_serving/``.

The throughput side of the trade is measured by
tools/tpu_probe_int8_forward.py (826 / 1123 / 1406 img/s at B=256 on v5e
for bf16 / dynamic / static); this script is the accuracy side. Reference
metric anchor: the pixel-match-error CDF (evaluation.py:2677-2707).

  PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python examples/quantized_serving_eval.py
"""

import json
import os
import sys

import numpy as np

from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation as DCE
from pdc_tpu.models.dcn import DenseCorrespondenceNetwork as DCN
from pdc_tpu.utils.compilation_cache import enable as enable_cache

MODEL = os.path.join(os.path.dirname(__file__), "..",
                     "trained_models", "tpu_journey")
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "trained_models", "quantized_serving")


def summarize(df):
    ok = df[df["is_valid"]]
    px = ok["pixel_match_error_l2"].to_numpy()
    d3 = ok["norm_diff_pred_3d"].dropna().to_numpy()
    return {
        "rows": int(len(ok)),
        "pck@5px": float((px <= 5).mean()),
        "pck@10px": float((px <= 10).mean()),
        "median_px_err": float(np.median(px)),
        "median_3d_err_m": float(np.median(d3)) if len(d3) else None,
    }


def main():
    enable_cache()
    import jax.numpy as jnp

    num_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    os.makedirs(OUT, exist_ok=True)
    dcn = DCN.from_model_folder(MODEL, dtype=jnp.bfloat16)
    dataset = dcn.load_training_dataset("test")

    # static-scale calibration on TRAIN-split frames (never the eval split)
    train_ds = dcn.load_training_dataset("train")
    train_ds.reset_seed(7)
    calib = [train_ds.get_random_rgbd_mask_pose()[0] for _ in range(16)]
    dcn_static = dcn.calibrate_quantization(calib, batch_size=8)

    results = {}
    for label, net in (("bf16", dcn), ("int8", dcn.quantized()),
                       ("int8_static", dcn_static)):
        df = DCE.evaluate_network_quantitative(
            net, dataset, num_image_pairs=num_pairs,
            num_matches_per_image_pair=100, seed=1)
        df.to_csv(os.path.join(OUT, f"data_{label}.csv"), index=False)
        results[label] = summarize(df)
        print(label, results[label], flush=True)

    with open(os.path.join(OUT, "summary.json"), "w") as f:
        json.dump({"model": "trained_models/tpu_journey",
                   "num_image_pairs": num_pairs,
                   "num_matches_per_image_pair": 100, "seed": 1,
                   "results": results}, f, indent=2)
    print("wrote", os.path.join(OUT, "summary.json"))


if __name__ == "__main__":
    main()
