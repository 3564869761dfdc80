"""Hyperparameter sweep harness — train N variants, evaluate each, compare.

Rebuild of the reference's ``training/training_param_sweep.ipynb`` workflow:
sweep a hyperparameter (there: non_match_loss_weight over 10^-4..10^3 at
D=3), train each variant into its own model folder, run the full evaluation
pipeline on it, and tabulate the quality metrics side by side.

Headless and dataset-free: runs on the synthetic dataset by default; point
``--dataset_config`` at a composite YAML for real data.

Usage:
    python examples/training_param_sweep.py --steps 300 \
        --param training.num_non_matches_per_match --values 30,150,300
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import copy
import json


def set_nested(cfg: dict, dotted_key: str, value):
    parts = dotted_key.split(".")
    d = cfg
    for p in parts[:-1]:
        d = d[p]
    d[parts[-1]] = value


def parse_value(s: str):
    try:
        return json.loads(s)
    except json.JSONDecodeError:
        return s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--param", default="loss_function.non_match_loss_weight",
                   help="dotted config key to sweep")
    p.add_argument("--values", default="0.01,0.1,1.0,10.0",
                   help="comma-separated values (JSON-parsed per item)")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--width", type=int, default=96)
    p.add_argument("--height", type=int, default=72)
    p.add_argument("--logging_dir", default="trained_models/param_sweep")
    p.add_argument("--dataset_config", default=None,
                   help="composite dataset YAML (synthetic when omitted)")
    p.add_argument("--num_eval_pairs", type=int, default=10)
    args = p.parse_args()

    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation as DCE
    from pdc_tpu.training.train import DenseCorrespondenceTraining
    from pdc_tpu.utils.yaml_io import load_yaml

    if args.dataset_config:
        dataset = SpartanDataset(config=load_yaml(args.dataset_config),
                                 config_dir=os.path.dirname(args.dataset_config))
    else:
        dataset = SpartanDataset.make_synthetic(
            num_scenes=2, num_objects=1, num_test_scenes=1,
            width=args.width, height=args.height, num_frames=8,
            object_radius=0.3)

    base = copy.deepcopy(DenseCorrespondenceTraining.load_default_config())
    t = base["training"]
    t["num_iterations"] = args.steps
    t["logging_dir"] = args.logging_dir
    t["save_rate"] = max(args.steps, 1)
    t["logging_rate"] = max(args.steps // 4, 1)
    net = base["dense_correspondence_network"]
    net["image_width"] = args.width
    net["image_height"] = args.height

    values = [parse_value(v) for v in args.values.split(",")]
    summary = {}
    for v in values:
        name = f"{args.param.split('.')[-1]}_{v}"
        print(f"=== sweep point {name} ===", flush=True)
        cfg = copy.deepcopy(base)
        set_nested(cfg, args.param, v)
        cfg["training"]["logging_dir_name"] = name
        trainer = DenseCorrespondenceTraining(config=cfg, dataset=dataset)
        folder = trainer.run()

        res = DCE.run_evaluation_on_network(
            folder, dataset=dataset, num_image_pairs=args.num_eval_pairs,
            num_matches_per_image_pair=50, qualitative=False,
            compute_descriptor_statistics=False)
        summary[name] = {
            "value": v,
            "model_folder": folder,
            "train": {k: res["train"][k] for k in
                      ("pck_at_5px", "pck_at_10px", "norm_diff_3d_area_above_curve")
                      if k in res.get("train", {})},
            "test": {k: res["test"][k] for k in
                     ("pck_at_5px", "pck_at_10px", "norm_diff_3d_area_above_curve")
                     if k in res.get("test", {})},
        }
        print(json.dumps(summary[name]), flush=True)

    out = os.path.join(args.logging_dir, "sweep_summary.json")
    os.makedirs(args.logging_dir, exist_ok=True)
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
