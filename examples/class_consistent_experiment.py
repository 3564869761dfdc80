"""Mixed-type training experiment — the class-consistent configuration
(BASELINE config 4 analog): D-dim descriptors trained with a mix of
within-scene matches, across-scene same-object attraction, and
different-object repulsion, then scored on

  * within-object PCK (GT correspondences matched across views)
  * across-object separation (best-match descriptor distance between
    different objects — should be large, reference across-object eval)

Usage: python examples/class_consistent_experiment.py [--steps 600]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import copy
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--width", type=int, default=96)
    p.add_argument("--height", type=int, default=72)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--descriptor_dim", type=int, default=16)
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import numpy as np

    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation
    from pdc_tpu.evaluation.plotting import cdf_at_threshold
    from pdc_tpu.training.train import DenseCorrespondenceTraining

    W, H = args.width, args.height
    # 2 objects x 2 scenes each so across-scene and different-object types
    # both have material to sample
    dataset = SpartanDataset.make_synthetic(
        num_scenes=4, num_objects=2, width=W, height=H, num_frames=12,
        object_radius=0.3,
    )

    cfg = copy.deepcopy(DenseCorrespondenceTraining.load_default_config())
    cfg["training"].update(
        num_iterations=args.steps, batch_size=args.batch_size,
        num_matching_attempts=2000,
        logging_dir="trained_models", logging_dir_name="class_consistent",
        save_rate=100000, logging_rate=100,
    )
    cfg["training"]["data_type_probabilities"] = {
        "SINGLE_OBJECT_WITHIN_SCENE": 0.7,
        "SINGLE_OBJECT_ACROSS_SCENE": 0.15,
        "DIFFERENT_OBJECT": 0.15,
        "MULTI_OBJECT": 0,
        "SYNTHETIC_MULTI_OBJECT": 0,
    }
    cfg["dense_correspondence_network"].update(
        image_width=W, image_height=H,
        descriptor_dimension=args.descriptor_dim,
    )

    trainer = DenseCorrespondenceTraining(config=cfg, dataset=dataset)
    trainer.run()
    dcn = trainer.get_dcn()

    df = DenseCorrespondenceEvaluation.evaluate_network_quantitative(
        dcn, dataset, num_image_pairs=12, num_matches_per_image_pair=50,
    )
    px = df["pixel_match_error_l2"].dropna().to_numpy()

    df_across = DenseCorrespondenceEvaluation.evaluate_network_across_objects(
        dcn, dataset, num_image_pairs=8, num_queries=40,
    )
    across = df_across["norm_diff_descriptor_best_match"].to_numpy()

    # within-object GT descriptor distance for contrast
    gt_dd = df["norm_diff_descriptor_ground_truth"].dropna().to_numpy()

    result = {
        "steps": args.steps,
        "descriptor_dim": args.descriptor_dim,
        "pck_at_5px": round(cdf_at_threshold(px, 5), 4),
        "pck_at_10px": round(cdf_at_threshold(px, 10), 4),
        "median_px_error": round(float(np.median(px)), 2),
        "within_object_gt_descriptor_dist_median": round(float(np.median(gt_dd)), 4),
        "across_object_best_match_dist_median": round(float(np.median(across)), 4),
        "separation_ratio": round(float(np.median(across) / max(np.median(gt_dd), 1e-9)), 2),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
