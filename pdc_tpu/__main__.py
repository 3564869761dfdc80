"""Unified command-line interface: ``python -m pdc_tpu <command> [args]``.

The reference drives every workflow from notebooks; pdc_tpu additionally
exposes the full train -> evaluate -> export -> preprocess surface as one
CLI so a TPU VM needs no notebook server:

    python -m pdc_tpu train --dataset_config cfg/composite.yaml --data_dir pdc
    python -m pdc_tpu evaluate --model_folder trained_models/net
    python -m pdc_tpu serve --model_folder trained_models/net --int8_static
    python -m pdc_tpu export-serving --model_folder ... --output net.stablehlo
    python -m pdc_tpu descriptor-images --model_folder ... --config ...
    python -m pdc_tpu preprocess --data_dir pdc/logs_proto
    python -m pdc_tpu debug-vis view --config ... --annotations pairs.yaml
    python -m pdc_tpu config-gen --data_dir pdc --out_dir config
    ...

``python -m pdc_tpu <command> --help`` forwards to each tool's own parser.
"""

from __future__ import annotations

import argparse
import runpy
import sys

# subcommands that delegate to a module's own __main__ block
DELEGATED = {
    "serve": "pdc_tpu.apps.serve",
    "export-serving": "pdc_tpu.apps.export_serving",
    "descriptor-images": "pdc_tpu.apps.compute_descriptor_images",
    "descriptor-video": "pdc_tpu.apps.make_descriptor_video",
    "debug-vis": "pdc_tpu.apps.debug_visualization",
    "preprocess": "pdc_tpu.pipeline.preprocessing",
    "config-gen": "pdc_tpu.data.config_gen",
    "migrate": "pdc_tpu.data.migrate",
    "download": "pdc_tpu.data.download",
    "statistics": "pdc_tpu.data.statistics",
}


def _cmd_train(argv):
    """Train a network with the reference folder contract
    (training.py:228 ``DenseCorrespondenceTraining.run``)."""
    p = argparse.ArgumentParser(prog="python -m pdc_tpu train")
    p.add_argument("--config", default=None,
                   help="training.yaml (default: configs/training.yaml)")
    p.add_argument("--dataset_config", required=True,
                   help="composite dataset yaml")
    p.add_argument("--data_dir", default=".", help="pdc data root")
    p.add_argument("--name", default=None,
                   help="model folder name (training.logging_dir_name)")
    p.add_argument("--logging_dir", default=None,
                   help="parent dir for model folders (default trained_models)")
    p.add_argument("--num_iterations", type=int, default=None,
                   help="override training.num_iterations")
    p.add_argument("--data_parallel", action="store_true",
                   help="DP over all local chips (training.data_parallel; "
                        "global batch = batch_size * n_chips)")
    p.add_argument("--fsdp", action="store_true",
                   help="with --data_parallel: ZeRO-shard params + Adam "
                        "moments over the chips (training.fsdp)")
    p.add_argument("--tensor_parallel", type=int, default=None, metavar="N",
                   help="channel-shard the network over N chips "
                        "(training.tensor_parallel); remaining chips form "
                        "a leading data axis")
    p.add_argument("--pipeline", type=int, default=None, metavar="S",
                   help="GPipe-pipeline the network over S stages "
                        "(training.pipeline; frozen-BN semantics); "
                        "remaining chips form a leading data axis")
    args = p.parse_args(argv)

    import os

    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.training.train import DenseCorrespondenceTraining
    from pdc_tpu.utils.compilation_cache import enable
    from pdc_tpu.utils.yaml_io import load_yaml

    enable()
    config = (load_yaml(args.config) if args.config
              else DenseCorrespondenceTraining.load_default_config())
    if args.name:
        config["training"]["logging_dir_name"] = args.name
    if args.logging_dir:
        config["training"]["logging_dir"] = args.logging_dir
    if args.num_iterations is not None:
        config["training"]["num_iterations"] = args.num_iterations
    if args.data_parallel:
        config["training"]["data_parallel"] = True
    if args.fsdp:
        config["training"]["fsdp"] = True
    if args.tensor_parallel is not None:
        config["training"]["tensor_parallel"] = args.tensor_parallel
    if args.pipeline is not None:
        config["training"]["pipeline"] = args.pipeline
    dataset = SpartanDataset(
        config=load_yaml(args.dataset_config), data_dir=args.data_dir,
        config_dir=os.path.dirname(os.path.abspath(args.dataset_config)))
    trainer = DenseCorrespondenceTraining(config=config, dataset=dataset)
    trainer.run()
    print(f"trained model folder: {trainer.logging_dir}")


def _cmd_experiment(argv):
    """Run one of the reference's experiment protocols headlessly
    (dense_correspondence/experiments/*/; pdc_tpu.experiments)."""
    p = argparse.ArgumentParser(prog="python -m pdc_tpu experiment")
    p.add_argument("protocol", nargs="?", default=None,
                   help="protocol name (omit with --list)")
    p.add_argument("--list", action="store_true", dest="list_protocols",
                   help="list available protocols")
    p.add_argument("--steps", type=int, default=None,
                   help="override per-variant training steps "
                        "(default: the notebook's full count)")
    p.add_argument("--width", type=int, default=None, help="default 640")
    p.add_argument("--height", type=int, default=None, help="default 480")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--num_eval_pairs", type=int, default=None,
                   help="default 100")
    p.add_argument("--num_matches_per_pair", type=int, default=None,
                   help="default 100")
    p.add_argument("--save_rate", type=int, default=None)
    p.add_argument("--smoke", action="store_true",
                   help="tiny CI-sized run (4 steps, 64x48); explicit "
                        "sizing flags still override its presets")
    p.add_argument("--data_dir", default=None,
                   help="published pdc data root (default: synthetic "
                        "stand-in dataset)")
    p.add_argument("--dataset_dir", default=None,
                   help="composite-config dir (default: "
                        "configs/dataset/composite)")
    p.add_argument("--logging_dir", default=None)
    p.add_argument("--max_runs", type=int, default=None,
                   help="truncate the variant grid")
    p.add_argument("--run_filter", default=None,
                   help="regex selecting a subset of the variant grid by "
                        "run name (e.g. one multi_object grid cell)")
    p.add_argument("--seeds", type=int, default=1,
                   help="replicate every selected run under N training "
                        "seeds (training.seed=1..N); result.json gains "
                        "cross-seed mean/min/max/spread aggregates")
    p.add_argument("--no_eval", action="store_true")
    p.add_argument("--eval_only", action="store_true",
                   help="skip training; evaluate the already-trained model "
                        "folders under logging_dir (resume after a failed "
                        "eval pass)")
    args = p.parse_args(argv)

    from pdc_tpu.experiments import Scale, list_protocols, run_protocol

    if args.list_protocols or not args.protocol:
        for name, n_runs, desc in list_protocols():
            print(f"{name:28s} {n_runs:3d} runs  {desc}")
        return 0

    from pdc_tpu.utils.compilation_cache import enable

    enable()
    # --smoke is a preset, not a lockout: any explicitly-passed sizing flag
    # overrides the corresponding preset value
    scale = Scale.smoke() if args.smoke else Scale.full()
    for field in ("steps", "width", "height", "batch_size",
                  "num_eval_pairs", "num_matches_per_pair", "save_rate"):
        val = getattr(args, field)
        if val is not None:
            setattr(scale, field, val)
    run_protocol(args.protocol, scale=scale, data_dir=args.data_dir,
                 dataset_dir=args.dataset_dir, logging_dir=args.logging_dir,
                 train=not args.eval_only, evaluate=not args.no_eval,
                 max_runs=args.max_runs, run_filter=args.run_filter,
                 seeds=args.seeds)
    return 0


def _cmd_evaluate(argv):
    """Full analysis pipeline on a model folder
    (evaluation.py:2307-2410 ``run_evaluation_on_network``)."""
    p = argparse.ArgumentParser(prog="python -m pdc_tpu evaluate")
    p.add_argument("--model_folder", required=True)
    p.add_argument("--num_image_pairs", type=int, default=100)
    p.add_argument("--num_matches_per_image_pair", type=int, default=100)
    p.add_argument("--output_dir", default=None,
                   help="default: <model_folder>/analysis")
    p.add_argument("--iteration", type=int, default=None)
    p.add_argument("--no_qualitative", action="store_true")
    args = p.parse_args(argv)

    from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation
    from pdc_tpu.utils.compilation_cache import enable

    enable()
    out = DenseCorrespondenceEvaluation.run_evaluation_on_network(
        args.model_folder, num_image_pairs=args.num_image_pairs,
        num_matches_per_image_pair=args.num_matches_per_image_pair,
        output_dir=args.output_dir, iteration=args.iteration,
        qualitative=not args.no_qualitative)
    print(f"analysis written: {out if out else args.output_dir or args.model_folder + '/analysis'}")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    commands = ["train", "evaluate", "experiment"] + sorted(DELEGATED)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        print("commands:", ", ".join(commands))
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "train":
        return _cmd_train(rest)
    if cmd == "evaluate":
        return _cmd_evaluate(rest)
    if cmd == "experiment":
        return _cmd_experiment(rest)
    if cmd in DELEGATED:
        saved_argv = sys.argv
        sys.argv = [f"python -m {DELEGATED[cmd]}"] + rest
        try:
            runpy.run_module(DELEGATED[cmd], run_name="__main__")
        finally:
            sys.argv = saved_argv
        return 0
    print(f"unknown command: {cmd}\ncommands: {', '.join(commands)}",
          file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
