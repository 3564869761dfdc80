"""Paper-figure harness — train ablation variants and render comparison
figures.

Rebuild of the reference's ``paper_figures/`` notebooks and the per-trick
experiment families:

  * ``--figure descriptor_dim`` — ``multi_object_descriptor_dim.ipynb``:
    train the same net at several descriptor dimensions on a multi-object
    dataset, overlay the pixel-error CDFs, and plot PCK@k vs D.
  * ``--figure bag_of_tricks`` — ``bag_of_tricks_paper_figure.ipynb`` +
    ``experiments/normalize_descriptors`` + ``experiments/domain_randomization``:
    baseline vs no-domain-randomization vs no-flip-augmentation vs
    L2-normalized descriptors, one CDF overlay.

Headless and dataset-free (synthetic scenes by default; pass
``--dataset_config`` for real pdc data). Artifacts land under
``--logging_dir``: per-variant model folders, ``comparison_test.png`` (the
multi-curve CDF overlay via the network registry), ``summary.json``, and for
descriptor_dim a ``pck_vs_dim.png`` curve.

Usage:
    python examples/paper_figures.py --figure descriptor_dim --steps 300
    python examples/paper_figures.py --figure bag_of_tricks --steps 300
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import copy
import json


def variant_configs(figure: str, dims):
    """:return: list of (name, {dotted_key: value}) mutations."""
    if figure == "descriptor_dim":
        return [(f"D{d}", {"dense_correspondence_network.descriptor_dimension": d})
                for d in dims]
    if figure == "bag_of_tricks":
        return [
            ("baseline", {}),
            ("no_domain_randomization", {"training.domain_randomize": False}),
            ("no_flip_augmentation", {"training.flip_augmentation": False}),
            ("normalized_descriptors", {"dense_correspondence_network.normalize": True}),
        ]
    raise ValueError(f"unknown figure {figure}")


def set_nested(cfg: dict, dotted_key: str, value):
    d = cfg
    parts = dotted_key.split(".")
    for p in parts[:-1]:
        d = d[p]
    d[parts[-1]] = value


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--figure", default="descriptor_dim",
                   choices=["descriptor_dim", "bag_of_tricks"])
    p.add_argument("--dims", default="3,9,16",
                   help="descriptor dimensions for --figure descriptor_dim")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--width", type=int, default=96)
    p.add_argument("--height", type=int, default=72)
    p.add_argument("--logging_dir", default=None)
    p.add_argument("--dataset_config", default=None)
    p.add_argument("--num_eval_pairs", type=int, default=10)
    p.add_argument("--num_matches_per_pair", type=int, default=50)
    args = p.parse_args()
    logging_dir = args.logging_dir or f"trained_models/paper_{args.figure}"

    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation as DCE
    from pdc_tpu.training.train import DenseCorrespondenceTraining
    from pdc_tpu.utils.yaml_io import load_yaml

    if args.dataset_config:
        dataset = SpartanDataset(config=load_yaml(args.dataset_config),
                                 config_dir=os.path.dirname(args.dataset_config))
    else:
        # multi-object synthetic set (the descriptor-dim figure in the paper
        # is about multi-object capacity)
        dataset = SpartanDataset.make_synthetic(
            num_scenes=2, num_objects=2, num_test_scenes=1,
            width=args.width, height=args.height, num_frames=8,
            object_radius=0.3)

    base = copy.deepcopy(DenseCorrespondenceTraining.load_default_config())
    t = base["training"]
    t["num_iterations"] = args.steps
    t["logging_dir"] = logging_dir
    t["save_rate"] = max(args.steps, 1)
    t["logging_rate"] = max(args.steps // 4, 1)
    net = base["dense_correspondence_network"]
    net["image_width"] = args.width
    net["image_height"] = args.height

    dims = [int(d) for d in args.dims.split(",")]
    variants = variant_configs(args.figure, dims)

    registry = {"networks": {}, "output_dir": logging_dir,
                "params": {"num_image_pairs": args.num_eval_pairs,
                           "num_matches_per_image_pair": args.num_matches_per_pair}}
    for name, mutations in variants:
        print(f"=== training variant {name} ===", flush=True)
        cfg = copy.deepcopy(base)
        for k, v in mutations.items():
            set_nested(cfg, k, v)
        cfg["training"]["logging_dir_name"] = name
        trainer = DenseCorrespondenceTraining(config=cfg, dataset=dataset)
        folder = trainer.run()
        registry["networks"][name] = {"model_folder": folder}

    print("=== evaluating all variants (registry comparison) ===", flush=True)
    dce = DCE(config=registry, dataset=dataset)
    ordered = [name for name, _ in variants]
    all_stats = dce.compare_networks(network_names=ordered, mode="test")

    summary = {name: {k: all_stats[name][k] for k in
                      ("pck_at_5px", "pck_at_10px",
                       "norm_diff_3d_area_above_curve")
                      if k in all_stats[name]}
               for name in ordered}

    if args.figure == "descriptor_dim":
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(5, 4))
        for key, label in (("pck_at_5px", "PCK@5px"),
                           ("pck_at_10px", "PCK@10px")):
            ys = [summary[f"D{d}"].get(key) for d in dims]
            if all(y is not None for y in ys):
                ax.plot(dims, ys, marker="o", label=label)
        ax.set_xlabel("descriptor dimension D")
        ax.set_ylabel("fraction of matches within threshold")
        ax.set_title("Descriptor dimension vs match accuracy")
        ax.set_xticks(dims)
        ax.grid(True, alpha=0.3)
        ax.legend()
        fig.tight_layout()
        out = os.path.join(logging_dir, "pck_vs_dim.png")
        fig.savefig(out, dpi=120)
        plt.close(fig)
        print(f"wrote {out}")

    os.makedirs(logging_dir, exist_ok=True)
    with open(os.path.join(logging_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=1))
    print(f"artifacts under {logging_dir}/ (comparison_test.png, summary.json)")


if __name__ == "__main__":
    main()
