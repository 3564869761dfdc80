"""Experiment-protocol registry + runner tests.

The registry must cover every reference experiment directory
(``/root/reference/dense_correspondence/experiments/``), every override
must target a real training-config key, and a smoke-scale protocol must run
train -> evaluate -> result.json end to end.
"""

import copy
import json
import os

import pytest

from pdc_tpu.experiments import PROTOCOLS, Scale, list_protocols, run_protocol
from pdc_tpu.training.train import DenseCorrespondenceTraining

# the reference's experiment directories (SURVEY.md L9)
REFERENCE_DIRS = {
    "baymax", "benchmark", "caterpillar", "domain_randomization", "hats",
    "mugs", "multi_object", "normalize_descriptors", "shoes",
    "shoes_consistent", "starbot",
}


def test_registry_covers_every_reference_dir():
    covered = {p.reference_dir for p in PROTOCOLS.values()}
    assert REFERENCE_DIRS <= covered, REFERENCE_DIRS - covered


def test_registry_shapes():
    for p in PROTOCOLS.values():
        assert p.runs, p.name
        assert p.num_iterations > 0
        names = [r.name for r in p.runs]
        assert len(names) == len(set(names)), f"duplicate run names in {p.name}"
    # the grids the notebooks sweep
    assert len(PROTOCOLS["multi_object"].runs) == 24  # 2 regimes x 4 M x 3 D
    assert len(PROTOCOLS["hats"].runs) == 12          # 2 variants x 2 M x 3 D
    assert len(PROTOCOLS["domain_randomization"].runs) == 2


def test_overrides_target_real_config_keys():
    base = DenseCorrespondenceTraining.load_default_config()
    for p in PROTOCOLS.values():
        for run in p.runs:
            for dotted in run.overrides:
                d = copy.deepcopy(base)
                for part in dotted.split(".")[:-1]:
                    assert part in d, (p.name, run.name, dotted)
                    d = d[part]
                leaf = dotted.split(".")[-1]
                # data_type_probabilities keys are the 5 sample types
                assert leaf in d or dotted.startswith(
                    "training.data_type_probabilities."), (
                    p.name, run.name, dotted)


def test_composites_exist_in_published_corpus():
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "dataset", "composite")
    for p in PROTOCOLS.values():
        names = {p.composite}
        names.update(r.composite for r in p.runs if r.composite)
        names.update(c for _, c in p.eval_composites)
        for n in names:
            assert os.path.exists(os.path.join(root, n)), (p.name, n)


def test_list_protocols():
    rows = list_protocols()
    assert len(rows) == len(PROTOCOLS)
    assert all(len(r) == 3 for r in rows)


@pytest.mark.slow
def test_domain_randomization_smoke(tmp_path):
    summary = run_protocol(
        "domain_randomization", scale=Scale.smoke(),
        logging_dir=str(tmp_path / "dr"))
    assert set(summary["networks"]) == {
        "baymax_standard_3", "baymax_no_domain_randomization_3"}
    for info in summary["networks"].values():
        assert os.path.exists(os.path.join(info["model_folder"],
                                           "training.yaml"))
        assert "pck_at_5px" in info["test"]
    out = json.load(open(tmp_path / "dr" / "result.json"))
    assert out["protocol"] == "domain_randomization"
    assert os.path.exists(tmp_path / "dr" / "comparison_test.png")


@pytest.mark.slow
def test_multi_object_truncated_smoke(tmp_path):
    summary = run_protocol(
        "multi_object", scale=Scale.smoke(), max_runs=1,
        logging_dir=str(tmp_path / "mo"))
    assert summary["runs_truncated"] == 23
    (info,) = summary["networks"].values()
    # scored on both the isolated and cluttered evaluation sets
    assert "analysis_isolated_scene" in info
    assert "analysis_cluttered_scene" in info


def test_seed_replication_aggregates(tmp_path):
    """--seeds N replicates every run under distinct training seeds and the
    summary carries cross-seed mean/min/max/spread (VERDICT r4 task 2)."""
    summary = run_protocol(
        "domain_randomization", scale=Scale.smoke(), seeds=2,
        run_filter="^baymax_standard", logging_dir=str(tmp_path / "dr"))
    assert set(summary["networks"]) == {
        "baymax_standard_3__seed1", "baymax_standard_3__seed2"}
    # each replica trained with its own seed, recorded in the run overrides
    seeds = {summary["networks"][n]["overrides"]["training.seed"]
             for n in summary["networks"]}
    assert seeds == {1, 2}
    agg = summary["seed_aggregates"]["baymax_standard_3"]["test"]
    for k in ("pck_at_5px", "pck_at_10px"):
        a = agg[k]
        assert a["n"] == 2
        assert a["min"] <= a["mean"] <= a["max"]
        assert a["spread"] == pytest.approx(a["max"] - a["min"])


def test_run_filter_unmatched_raises():
    with pytest.raises(ValueError):
        run_protocol("domain_randomization", scale=Scale.smoke(),
                     run_filter="no_such_run")


def test_per_run_composite_scored_on_own_dataset(tmp_path):
    """A run with its own train composite (benchmark's shoes_consistent_3)
    is evaluated on THAT composite, not the protocol default — the
    reference's run_evaluation_on_network loads each network's model-folder
    dataset (ADVICE r4 medium)."""
    summary = run_protocol(
        "benchmark", scale=Scale.smoke(), logging_dir=str(tmp_path / "b"))
    nets = summary["networks"]
    assert nets["cbs_3"]["test_composite"] == (
        "caterpillar_baymax_starbot_all_front_single_only.yaml")
    assert nets["shoes_consistent_3"]["test_composite"] == (
        "shoe_train_all_shoes.yaml")
    # one overlay per composite group
    assert os.path.exists(tmp_path / "b" / "comparison_test.png")
    assert os.path.exists(
        tmp_path / "b" / "comparison_test_shoe_train_all_shoes.png")
