"""Head-to-head: matrix (pooled) loss vs the reference-faithful per-pair loss.

Trains two identical networks from the same init — one with each loss
formulation — and compares convergence quality (PCK). This is the evidence
that the TPU-fast matrix estimator preserves the learning signal.

Usage: python examples/loss_parity_experiment.py [--steps 600]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


def run_one(use_matrix: bool, steps: int, W, H, B, dataset, seed=0):
    import jax
    import numpy as np

    from pdc_tpu.data.assembler import AssemblerConfig
    from pdc_tpu.data.device_cache import DeviceCache, make_cached_train_step
    from pdc_tpu.losses.pixelwise_contrastive import LossConfig
    from pdc_tpu.models.dcn import build_backbone
    from pdc_tpu.training.train import create_train_state

    cache = DeviceCache.from_dataset(dataset)
    config = {
        "training": {"learning_rate": 1e-4, "learning_rate_decay": 0.9,
                     "steps_between_learning_rate_decay": 250,
                     "weight_decay": 1e-4},
        "dense_correspondence_network": {
            "descriptor_dimension": 3,
            "backbone": {"model_class": "Resnet", "resnet_name": "Resnet34_8s"},
        },
    }
    model = build_backbone(config["dense_correspondence_network"])
    state, tx = create_train_state(model, config, jax.random.PRNGKey(seed), (H, W))
    acfg = AssemblerConfig(num_matching_attempts=3000, use_matrix_loss=use_matrix)
    step = make_cached_train_step(model, tx, LossConfig(), acfg, W, cache)

    key = jax.random.PRNGKey(seed + 1)
    t0 = time.perf_counter()
    losses = []
    for i in range(steps):
        idx = cache.sample_index_batch(B)
        key, sub = jax.random.split(key)
        state, m = step(state, idx, sub)
        if i % 50 == 0 or i == steps - 1:
            losses.append(float(m["loss"]))
    train_time = time.perf_counter() - t0

    # evaluate PCK
    from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation
    from pdc_tpu.evaluation.plotting import cdf_at_threshold
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

    dcn = DenseCorrespondenceNetwork(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        descriptor_dimension=3, image_width=W, image_height=H,
    )
    df = DenseCorrespondenceEvaluation.evaluate_network_quantitative(
        dcn, dataset, num_image_pairs=12, num_matches_per_image_pair=50,
    )
    px = df["pixel_match_error_l2"].dropna().to_numpy()
    return {
        "loss_curve": [round(x, 4) for x in losses],
        "train_seconds": round(train_time, 1),
        "pck_at_3px": round(cdf_at_threshold(px, 3), 4),
        "pck_at_5px": round(cdf_at_threshold(px, 5), 4),
        "pck_at_10px": round(cdf_at_threshold(px, 10), 4),
        "median_px_error": round(float(np.median(px)), 2),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--width", type=int, default=96)
    p.add_argument("--height", type=int, default=72)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    from pdc_tpu.data.dataset import SpartanDataset

    dataset = SpartanDataset.make_synthetic(
        num_scenes=2, width=args.width, height=args.height, num_frames=16,
        object_radius=0.3,
    )
    results = {}
    for name, use_matrix in (("matrix", True), ("per_pair", False)):
        print(f"training with {name} loss ...", flush=True)
        results[name] = run_one(use_matrix, args.steps, args.width, args.height,
                                args.batch_size, dataset)
        print(json.dumps(results[name]), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
