"""``python -m pdc_tpu`` unified CLI: dispatch, delegation, and an
end-to-end train -> evaluate run driven purely through the CLI surface
(the reference drives these workflows from notebooks; pdc_tpu exposes them
as subcommands — see pdc_tpu/__main__.py)."""

import copy
import os

import pytest

import pdc_tpu.__main__ as cli
from pdc_tpu.data.synthetic import SyntheticScene
from pdc_tpu.utils.yaml_io import load_yaml, save_yaml

W, H = 64, 48


def test_help_exits_zero(capsys):
    assert cli.main([]) == 0
    assert cli.main(["--help"]) == 0
    out = capsys.readouterr().out
    assert "train" in out and "evaluate" in out


def test_unknown_command(capsys):
    assert cli.main(["frobnicate"]) == 2
    assert "unknown command" in capsys.readouterr().err


def test_delegated_command_runs(tmp_path, capsys):
    """Delegated dispatch executes the target module's own __main__."""
    logs = tmp_path / "data" / "logs_proto"
    for i, name in enumerate(["2020-01-01-shoe-a", "2020-01-02-shoe-b"]):
        SyntheticScene(width=32, height=24, num_frames=2, seed=i).write_scene(
            str(logs / name))
    out_dir = tmp_path / "cfg"
    cli.main(["config-gen", "--data_dir", str(tmp_path / "data"),
              "--out_dir", str(out_dir), "--test_fraction", "0.5"])
    composites = list(out_dir.rglob("*.yaml"))
    assert composites, "config-gen wrote no YAMLs through the CLI"
    assert "2 scenes" in capsys.readouterr().out


def test_delegated_help_does_not_crash():
    """--help on a delegated tool raises SystemExit(0), not an error."""
    with pytest.raises(SystemExit) as e:
        cli.main(["config-gen", "--help"])
    assert e.value.code == 0


@pytest.mark.slow
def test_train_then_evaluate_via_cli(tmp_path):
    """Full workflow purely through CLI argv: write scenes, config-gen,
    train (tiny schedule), then evaluate the produced model folder."""
    data_dir = tmp_path / "data"
    logs = data_dir / "logs_proto"
    for i, name in enumerate(["2020-01-01-shoe-a", "2020-01-02-shoe-b",
                              "2020-01-03-shoe-c"]):
        SyntheticScene(width=W, height=H, num_frames=4, seed=i).write_scene(
            str(logs / name))
    cfg_dir = tmp_path / "cfg"
    cli.main(["config-gen", "--data_dir", str(data_dir),
              "--out_dir", str(cfg_dir), "--test_fraction", "0.34"])
    composite = next(cfg_dir.rglob("composite/*.yaml"), None) or \
        next(cfg_dir.rglob("*.yaml"))

    from pdc_tpu.training.train import DenseCorrespondenceTraining
    cfg = copy.deepcopy(DenseCorrespondenceTraining.load_default_config())
    t = cfg["training"]
    t.update(num_iterations=4, batch_size=1, num_matching_attempts=128,
             num_non_matches_per_match=5, cross_scene_num_samples=64,
             save_rate=1000, logging_rate=1000)
    net = cfg["dense_correspondence_network"]
    net["image_width"], net["image_height"] = W, H
    net["backbone"]["resnet_name"] = "Resnet18_8s"
    train_yaml = tmp_path / "training.yaml"
    save_yaml(cfg, str(train_yaml))

    cli.main(["train", "--config", str(train_yaml),
              "--dataset_config", str(composite),
              "--data_dir", str(data_dir),
              "--name", "cli_run",
              "--logging_dir", str(tmp_path / "trained_models")])
    folder = tmp_path / "trained_models" / "cli_run"
    assert (folder / "000004.ckpt").exists()
    assert (folder / "dataset.yaml").exists()

    cli.main(["evaluate", "--model_folder", str(folder),
              "--num_image_pairs", "3",
              "--num_matches_per_image_pair", "16",
              "--no_qualitative"])
    analysis = folder / "analysis"
    csvs = list(analysis.rglob("*.csv"))
    assert csvs, "evaluate wrote no CSVs through the CLI"
