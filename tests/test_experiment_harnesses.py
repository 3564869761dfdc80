"""Experiment surface: param sweep, two-task benchmark protocol, SIFT
qualitative analysis (reference training_param_sweep.ipynb,
experiments/benchmark/training_benchmark.ipynb, evaluation.py:1554-1687)."""

import json
import os
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")
sys.path.insert(0, EXAMPLES)


def test_sift_qualitative_analysis(tmp_path):
    cv2 = pytest.importorskip("cv2")
    assert hasattr(cv2, "SIFT_create")
    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation as DCE

    ds = SpartanDataset.make_synthetic(num_scenes=1, width=128, height=96,
                                       num_frames=4, object_radius=0.3)
    name = ds.get_random_scene_name()
    png = str(tmp_path / "sift.png")
    r = DCE.single_image_pair_sift_analysis(ds, name, 0, 1, output_path=png)
    assert r["num_keypoints_a"] > 0 and r["num_keypoints_b"] > 0
    if r["good"]:
        assert os.path.getsize(png) > 0
        errs = [row["norm_diff_pred_3d"] for row in r["rows"] if row["is_valid"]]
        assert all(np.isfinite(errs))


@pytest.mark.slow
def test_param_sweep_harness(tmp_path, capsys):
    import training_param_sweep

    old_argv = sys.argv
    sys.argv = ["x", "--steps", "4", "--width", "64", "--height", "48",
                "--values", "0.1,1.0", "--num_eval_pairs", "1",
                "--logging_dir", str(tmp_path)]
    try:
        training_param_sweep.main()
    finally:
        sys.argv = old_argv
    summary = json.load(open(tmp_path / "sweep_summary.json"))
    assert len(summary) == 2
    for v in summary.values():
        assert "pck_at_5px" in v["test"]
        assert os.path.exists(os.path.join(v["model_folder"], "training.yaml"))


@pytest.mark.slow
def test_training_benchmark_harness(tmp_path):
    import training_benchmark

    old_argv = sys.argv
    sys.argv = ["x", "--name", "t", "--steps", "4", "--width", "64",
                "--height", "48", "--num_eval_pairs", "1",
                "--logging_dir", str(tmp_path)]
    try:
        training_benchmark.main()
    finally:
        sys.argv = old_argv
    summary = json.load(open(tmp_path / "t" / "benchmark_summary.json"))
    assert "single_object" in summary and "class_consistent" in summary
    assert summary["single_object"]["across_object_mean_distance"] is not None
    assert set(summary["class_consistent"]["per_keypoint"]) == {"center", "edge"}


@pytest.mark.slow
def test_paper_figures_harness(tmp_path):
    """descriptor_dim figure end to end (paper_figures/multi_object_descriptor_dim.ipynb)."""
    import paper_figures

    old_argv = sys.argv
    sys.argv = ["x", "--figure", "descriptor_dim", "--dims", "3,5",
                "--steps", "4", "--width", "64", "--height", "48",
                "--num_eval_pairs", "1", "--num_matches_per_pair", "10",
                "--logging_dir", str(tmp_path)]
    try:
        paper_figures.main()
    finally:
        sys.argv = old_argv
    summary = json.load(open(tmp_path / "summary.json"))
    assert set(summary) == {"D3", "D5"}
    for v in summary.values():
        assert "pck_at_5px" in v
    # registry-driven overlay + the dim curve figure
    assert os.path.getsize(tmp_path / "comparison_test.png") > 0
    assert os.path.getsize(tmp_path / "pck_vs_dim.png") > 0
    # trained descriptor dims really differ
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

    dcn = DenseCorrespondenceNetwork.from_model_folder(str(tmp_path / "D5"))
    assert dcn.descriptor_dimension == 5


def test_bag_of_tricks_variants():
    from paper_figures import variant_configs

    variants = dict(variant_configs("bag_of_tricks", []))
    assert variants["no_domain_randomization"] == {
        "training.domain_randomize": False}
    assert variants["normalized_descriptors"] == {
        "dense_correspondence_network.normalize": True}
    assert "no_flip_augmentation" in variants and "baseline" in variants


def test_orb_matching_comparison(tmp_path):
    """ORB cross-check matching variant (visual_matching_comparisons.ipynb)."""
    cv2 = pytest.importorskip("cv2")
    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation as DCE

    ds = SpartanDataset.make_synthetic(num_scenes=1, width=128, height=96,
                                       num_frames=4, object_radius=0.3)
    name = ds.get_random_scene_name()
    png = str(tmp_path / "orb.png")
    r = DCE.single_image_pair_sift_analysis(ds, name, 0, 1, output_path=png,
                                            detector="orb")
    assert r["num_keypoints_a"] >= 0
    if r["good"]:
        assert os.path.getsize(png) > 0
    with pytest.raises(ValueError):
        DCE.single_image_pair_sift_analysis(ds, name, 0, 1, detector="surf")


def test_finding_correspondences_example(tmp_path):
    """Headless analog of pytorch-finding-correspondences.ipynb: plots both
    figures, reports valid counts and the timed device dispatch."""
    import finding_correspondences

    r = finding_correspondences.main([
        "--width", "64", "--height", "48", "--num_attempts", "20",
        "--num_attempts_timed", "500", "--num_non_matches_per_match", "4",
        "--output_dir", str(tmp_path)])
    assert 0 < r["num_valid"] <= 20
    assert 0 < r["timed_valid"] <= 500
    assert r["timed_seconds"] > 0
    for p in r["plots"]:
        assert os.path.getsize(p) > 0
