"""Evaluation tutorial — script equivalent of
``evaluation_quantitative_tutorial.ipynb``: load a trained model folder and
produce the quantitative CSV + CDF plots + stats.yaml.

Usage:
    python examples/evaluation_tutorial.py --model_folder trained_models/tutorial
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_folder", required=True)
    p.add_argument("--config", help="composite dataset yaml (real data)")
    p.add_argument("--data_dir", default=os.environ.get("DC_DATA_DIR", "."))
    p.add_argument("--num_image_pairs", type=int, default=100)
    p.add_argument("--num_matches", type=int, default=100)
    args = p.parse_args()

    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork
    from pdc_tpu.utils.yaml_io import load_yaml

    if args.config:
        dataset = SpartanDataset(
            config=load_yaml(args.config), data_dir=args.data_dir,
            config_dir=os.path.dirname(args.config),
        )
    else:
        dcn_cfg = load_yaml(os.path.join(args.model_folder, "training.yaml"))
        net = dcn_cfg["dense_correspondence_network"]
        dataset = SpartanDataset.make_synthetic(
            num_scenes=2, width=net["image_width"], height=net["image_height"],
            num_frames=12,
        )

    results = DenseCorrespondenceEvaluation.run_evaluation_on_network(
        args.model_folder, dataset=dataset,
        num_image_pairs=args.num_image_pairs,
        num_matches_per_image_pair=args.num_matches,
    )
    print("wrote:", results)


if __name__ == "__main__":
    main()
