"""Convergence benchmark: train a descriptor net on the synthetic dataset and
report PCK@k + timing. The quality analog of BASELINE config 1 without the
5 GB download (the synthetic scene has exact geometry, so PCK here measures
the learning loop end to end: sampling -> loss -> optimization -> best-match).

Usage:  python examples/benchmark_convergence.py [--steps 400] [--width 128]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import copy
import json
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--height", type=int, default=96)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--resnet", default="Resnet34_8s")
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import numpy as np

    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation
    from pdc_tpu.evaluation.plotting import cdf_at_threshold
    from pdc_tpu.training.train import DenseCorrespondenceTraining

    W, H = args.width, args.height
    dataset = SpartanDataset.make_synthetic(
        num_scenes=2, width=W, height=H, num_frames=16,
        radius=0.8, object_radius=0.3,
    )

    cfg = copy.deepcopy(DenseCorrespondenceTraining.load_default_config())
    cfg["training"].update(
        num_iterations=args.steps, batch_size=args.batch_size,
        num_matching_attempts=3000,
        logging_dir="trained_models", logging_dir_name="bench_convergence",
        save_rate=100000, logging_rate=100,
    )
    cfg["dense_correspondence_network"].update(
        image_width=W, image_height=H, compute_dtype=args.dtype)
    cfg["dense_correspondence_network"]["backbone"]["resnet_name"] = args.resnet

    trainer = DenseCorrespondenceTraining(config=cfg, dataset=dataset)
    t0 = time.perf_counter()
    trainer.run()
    train_time = time.perf_counter() - t0

    dcn = trainer.get_dcn()
    df = DenseCorrespondenceEvaluation.evaluate_network_quantitative(
        dcn, dataset, num_image_pairs=20, num_matches_per_image_pair=50,
    )
    px = df["pixel_match_error_l2"].dropna().to_numpy()
    px_masked = df["pixel_match_error_l2_masked"].dropna().to_numpy()
    losses = trainer._logging_dict["train"]["loss"]
    result = {
        "steps": args.steps,
        "dtype": args.dtype,
        "resolution": f"{W}x{H}",
        "batch_size": args.batch_size,
        "train_seconds": round(train_time, 1),
        "steps_per_sec": round(args.steps / train_time, 2),
        "pairs_per_sec": round(args.steps * args.batch_size / train_time, 2),
        "final_loss": round(float(np.mean(losses[-20:])), 4),
        "initial_loss": round(float(np.mean(losses[:20])), 4),
        "num_eval_matches": int(px.size),
        "pck_at_3px": round(cdf_at_threshold(px, 3), 4),
        "pck_at_5px": round(cdf_at_threshold(px, 5), 4),
        "pck_at_10px": round(cdf_at_threshold(px, 10), 4),
        "median_px_error": round(float(np.median(px)), 2),
        "pck_at_5px_masked": round(cdf_at_threshold(px_masked, 5), 4),
        "median_px_error_masked": round(float(np.median(px_masked)), 2),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
