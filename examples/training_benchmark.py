"""The two-task training benchmark protocol for evaluating a network change.

Rebuild of the reference's
``experiments/benchmark/training_benchmark.ipynb``: given a distinctive
``--name`` for the architecture/config under test, run

  1. **Single-object performance** — train on a multi-single-object dataset
     (the reference uses caterpillar+baymax+starbot) with the default
     within-scene loss, then the full quantitative evaluation
     (train/test CDFs + across-object separation).
  2. **Class-consistent performance** — train on a multi-instance dataset
     (the reference uses all-shoes) with the class-consistent type mix
     (across-scene attraction + different-object repulsion), then the
     cross-instance keypoint evaluation.

Both tasks run on synthetic data by default so the protocol is executable
anywhere; point the dataset args at composite YAMLs for real logs.

Usage:
    python examples/training_benchmark.py --name my_arch --steps 400
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import copy
import json

import numpy as np


def make_keypoint_labels(dataset, num_images_per_object: int = 2):
    """Synthetic cross-instance keypoint labels: fixed object-frame points
    (disc center/edge) projected into sampled frames — the stand-in for the
    human-annotated shoe_keypoints.yaml."""
    labels = []
    for oid in sorted(dataset._single_object_scene_names):
        for sname in dataset._single_object_scene_names[oid][:num_images_per_object]:
            sc = dataset.get_scene(sname)
            on = np.argwhere(sc.mask[0] != 0)
            if len(on) < 4:
                continue
            v1, u1 = on[len(on) // 3]
            v2, u2 = on[2 * len(on) // 3]
            labels.append({
                "scene_name": sname, "object_id": oid, "image_idx": 0,
                "keypoints": {"center": {"u": int(u1), "v": int(v1)},
                              "edge": {"u": int(u2), "v": int(v2)}},
            })
    return labels


def base_config(args):
    from pdc_tpu.training.train import DenseCorrespondenceTraining

    cfg = copy.deepcopy(DenseCorrespondenceTraining.load_default_config())
    t = cfg["training"]
    t["num_iterations"] = args.steps
    t["logging_dir"] = os.path.join(args.logging_dir, args.name)
    t["save_rate"] = max(args.steps, 1)
    t["logging_rate"] = max(args.steps // 4, 1)
    net = cfg["dense_correspondence_network"]
    net["image_width"] = args.width
    net["image_height"] = args.height
    return cfg


def task_single_object(args):
    """Task 1 (reference: caterpillar_baymax_starbot_all_front_single_only)."""
    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation as DCE
    from pdc_tpu.training.train import DenseCorrespondenceTraining

    dataset = SpartanDataset.make_synthetic(
        num_scenes=3, num_objects=3, num_test_scenes=3,
        width=args.width, height=args.height, num_frames=8, object_radius=0.3)

    cfg = base_config(args)
    d = cfg["dense_correspondence_network"]["descriptor_dimension"]
    cfg["training"]["logging_dir_name"] = f"cbs_{d}"
    trainer = DenseCorrespondenceTraining(config=cfg, dataset=dataset)
    folder = trainer.run()

    res = DCE.run_evaluation_on_network(
        folder, dataset=dataset, num_image_pairs=args.num_eval_pairs,
        num_matches_per_image_pair=50, num_qualitative_pairs=2)
    return {
        "model_folder": folder,
        "test_pck_at_5px": res["test"].get("pck_at_5px"),
        "test_pck_at_10px": res["test"].get("pck_at_10px"),
        "across_object_mean_distance": res.get("across_object", {}).get(
            "across_object_mean_best_match_distance"),
    }


def task_class_consistent(args):
    """Task 2 (reference: shoe_train_all_shoes + shoe_keypoints.yaml)."""
    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.evaluation.keypoints import (
        keypoint_statistics,
        run_cross_instance_keypoint_evaluation_on_network,
    )
    from pdc_tpu.training.train import DenseCorrespondenceTraining

    # multiple instances of the same class: 2 scenes per object
    dataset = SpartanDataset.make_synthetic(
        num_scenes=4, num_objects=2,
        width=args.width, height=args.height, num_frames=8, object_radius=0.3)

    cfg = base_config(args)
    d = cfg["dense_correspondence_network"]["descriptor_dimension"]
    cfg["training"]["logging_dir_name"] = f"shoes_consistent_{d}"
    # class-consistent type mix (the reference's shoes configs)
    cfg["training"]["data_type_probabilities"] = {
        "SINGLE_OBJECT_WITHIN_SCENE": 0.7,
        "SINGLE_OBJECT_ACROSS_SCENE": 0.15,
        "DIFFERENT_OBJECT": 0.15,
    }
    trainer = DenseCorrespondenceTraining(config=cfg, dataset=dataset)
    folder = trainer.run()

    labels = make_keypoint_labels(dataset)
    df = run_cross_instance_keypoint_evaluation_on_network(
        folder, labels, dataset=dataset)
    stats = keypoint_statistics(df)
    return {
        "model_folder": folder,
        "num_keypoint_rows": int(len(df)),
        "keypoint_px_error_median": float(
            df["pixel_match_error_l2"].dropna().median()),
        "per_keypoint": stats.set_index("keypoint_name")[
            "pixel_match_error_l2_median"].to_dict(),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="standard",
                   help="distinctive name for the network under test")
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--width", type=int, default=96)
    p.add_argument("--height", type=int, default=72)
    p.add_argument("--logging_dir", default="trained_models/benchmark")
    p.add_argument("--num_eval_pairs", type=int, default=10)
    p.add_argument("--skip_single_object", action="store_true")
    p.add_argument("--skip_class_consistent", action="store_true")
    args = p.parse_args()

    results = {"name": args.name}
    if not args.skip_single_object:
        print("=== task 1: single-object performance ===", flush=True)
        results["single_object"] = task_single_object(args)
        print(json.dumps(results["single_object"]), flush=True)
    if not args.skip_class_consistent:
        print("=== task 2: class-consistent performance ===", flush=True)
        results["class_consistent"] = task_class_consistent(args)
        print(json.dumps(results["class_consistent"]), flush=True)

    out_dir = os.path.join(args.logging_dir, args.name)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "benchmark_summary.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
