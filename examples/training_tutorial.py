"""Training tutorial — script equivalent of the reference's
``training_tutorial.ipynb`` (train a single-object descriptor network, then
evaluate it quantitatively).

Runs on the synthetic dataset by default so it works with zero downloads;
pass ``--config <composite.yaml> --data_dir <pdc>`` for the real dataset.

Usage:
    python examples/training_tutorial.py                    # synthetic demo
    python examples/training_tutorial.py --iterations 3500  # full schedule
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import copy
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", help="composite dataset yaml (real data)")
    p.add_argument("--data_dir", default=os.environ.get("DC_DATA_DIR", "."))
    p.add_argument("--iterations", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--descriptor_dim", type=int, default=3)
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--run_name", default="tutorial")
    p.add_argument("--output", default="trained_models")
    args = p.parse_args()

    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation
    from pdc_tpu.evaluation.plotting import DenseCorrespondenceEvaluationPlotter
    from pdc_tpu.training.train import DenseCorrespondenceTraining
    from pdc_tpu.utils.yaml_io import load_yaml

    if args.config:
        dataset = SpartanDataset(
            config=load_yaml(args.config), data_dir=args.data_dir,
            config_dir=os.path.dirname(args.config),
        )
        W, H = args.width or 640, args.height or 480
    else:
        W, H = args.width or 96, args.height or 72
        dataset = SpartanDataset.make_synthetic(
            num_scenes=2, width=W, height=H, num_frames=12
        )

    config = copy.deepcopy(DenseCorrespondenceTraining.load_default_config())
    config["training"].update(
        num_iterations=args.iterations,
        batch_size=args.batch_size,
        logging_dir=args.output,
        logging_dir_name=args.run_name,
        num_matching_attempts=2000 if not args.config else 10000,
    )
    config["dense_correspondence_network"].update(
        descriptor_dimension=args.descriptor_dim, image_width=W, image_height=H,
    )

    print(f"Training {args.iterations} iterations at {W}x{H}, "
          f"D={args.descriptor_dim}, batch={args.batch_size} ...")
    trainer = DenseCorrespondenceTraining(config=config, dataset=dataset)
    model_folder = trainer.run()
    print("model folder:", model_folder)

    print("Evaluating quantitatively ...")
    dcn = trainer.get_dcn()
    df = DenseCorrespondenceEvaluation.evaluate_network_quantitative(
        dcn, dataset, num_image_pairs=10, num_matches_per_image_pair=50,
    )
    analysis = os.path.join(model_folder, "analysis")
    os.makedirs(analysis, exist_ok=True)
    csv = os.path.join(analysis, "data.csv")
    df.to_csv(csv)
    stats = DenseCorrespondenceEvaluationPlotter.run_on_single_dataframe(
        csv, output_dir=analysis, save=True
    )
    print("eval stats:", {k: round(v, 4) for k, v in stats.items()})


if __name__ == "__main__":
    main()
