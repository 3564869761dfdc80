"""Round-2 evaluation flows: dual-mode orchestration, keypoint pipeline,
network registry, qualitative suite, cluster plots (reference
evaluation.py:96-241, :407-472, :1203-1552, :1979-2070, :2307-2463,
:2466-2620)."""

import copy
import os

import numpy as np
import pytest

from pdc_tpu.data.dataset import SpartanDataset
from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation as DCE
from pdc_tpu.training.train import DenseCorrespondenceTraining

W, H = 64, 48

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def split_dataset():
    return SpartanDataset.make_synthetic(
        num_scenes=2, num_objects=2, width=W, height=H, num_frames=4,
        num_test_scenes=2)


@pytest.fixture(scope="module")
def model_folder(tmp_path_factory, split_dataset):
    cfg = copy.deepcopy(DenseCorrespondenceTraining.load_default_config())
    t = cfg["training"]
    t.update(num_iterations=4, batch_size=1, num_matching_attempts=128,
             num_non_matches_per_match=5, cross_scene_num_samples=64,
             save_rate=1000, logging_rate=1000,
             logging_dir=str(tmp_path_factory.mktemp("models")),
             logging_dir_name="flow_net")
    net = cfg["dense_correspondence_network"]
    net["image_width"] = W
    net["image_height"] = H
    net["backbone"]["resnet_name"] = "Resnet18_8s"
    trainer = DenseCorrespondenceTraining(config=cfg, dataset=split_dataset)
    return trainer.run()


def test_dataset_mode_split(split_dataset):
    ds = split_dataset
    ds.set_train_mode()
    train_names = set(ds.scenes)
    ds.set_test_mode()
    test_names = set(ds.scenes)
    ds.set_train_mode()
    assert train_names and test_names
    assert train_names.isdisjoint(test_names)
    # cross-split lookup still works (annotation YAMLs span splits)
    assert ds.get_scene(next(iter(test_names))) is not None


def test_dataset_reconstruction_from_config(split_dataset):
    ds2 = SpartanDataset.from_dataset_config(split_dataset.config, mode="test")
    ds2.set_test_mode()
    split_dataset.set_test_mode()
    assert set(ds2.scenes) == set(split_dataset.scenes)
    split_dataset.set_train_mode()


def test_run_evaluation_on_network_dual_mode(model_folder):
    res = DCE.run_evaluation_on_network(
        model_folder, dataset=None, num_image_pairs=2,
        num_matches_per_image_pair=10, num_qualitative_pairs=1)
    # train + test CSVs with distinct scene sets
    import pandas as pd

    df_train = pd.read_csv(res["train_csv"], index_col=0)
    df_test = pd.read_csv(res["test_csv"], index_col=0)
    assert len(df_train) and len(df_test)
    assert set(df_train["scene_name"]).isdisjoint(set(df_test["scene_name"]))
    # combined overlay figure + per-mode stats
    assert os.path.exists(res["quant_plots"])
    assert "pck_at_5px" in res["train"] and "pck_at_5px" in res["test"]
    # across-object (2 objects) + qualitative artifacts
    assert os.path.exists(res["across_object_csv"])
    for mode in ("train", "test"):
        assert any(p.endswith("matches.png") for p in res["qualitative"][mode])
        assert any(p.endswith("descriptors.png") for p in res["qualitative"][mode])


def _make_keypoint_labels(ds, num_images=2):
    labels = []
    for sname in sorted(ds.scenes)[:num_images]:
        sc = ds.get_scene(sname)
        on = np.argwhere(sc.mask[0] != 0)
        v1, u1 = on[len(on) // 3]
        v2, u2 = on[2 * len(on) // 3]
        labels.append({
            "scene_name": sname, "object_id": sc.object_id, "image_idx": 0,
            "keypoints": {"top": {"u": int(u1), "v": int(v1)},
                          "bottom": {"u": int(u2), "v": int(v2)}},
        })
    return labels


def test_cross_instance_keypoint_pipeline(model_folder, split_dataset):
    from pdc_tpu.evaluation.keypoints import (
        keypoint_statistics,
        run_cross_instance_keypoint_evaluation_on_network,
    )

    split_dataset.set_train_mode()
    labels = _make_keypoint_labels(split_dataset)
    df = run_cross_instance_keypoint_evaluation_on_network(
        model_folder, labels, dataset=split_dataset)
    # 1 pair x 2 orderings x 2 keypoints
    assert len(df) == 4
    assert set(df["keypoint_name"]) == {"top", "bottom"}
    assert df["pixel_match_error_l2"].notna().all()

    stats = keypoint_statistics(df)
    assert len(stats) == 2
    assert (stats["num_pairs"] == 2).all()

    out = os.path.join(model_folder, "analysis/cross_scene_keypoints")
    for f in ("data.csv", "keypoint_statistics.csv", "keypoint_stats.yaml"):
        assert os.path.exists(os.path.join(out, f)), f


def test_keypoint_mismatched_names_raises(model_folder, split_dataset):
    from pdc_tpu.evaluation.keypoints import (
        single_image_pair_cross_scene_keypoints_quantitative_analysis,
    )
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

    dcn = DenseCorrespondenceNetwork.from_model_folder(model_folder)
    labels = _make_keypoint_labels(split_dataset)
    del labels[1]["keypoints"]["top"]
    with pytest.raises(ValueError, match="appears in one list"):
        single_image_pair_cross_scene_keypoints_quantitative_analysis(
            dcn, split_dataset, labels[0], labels[1])


def test_network_registry_and_comparison(model_folder, split_dataset, tmp_path):
    registry = {
        "networks": {
            "net_a": {"model_folder": model_folder},
            # reference format: path to a params file inside the folder
            "net_b": {"path_to_network_params": os.path.join(
                model_folder, "000004.ckpt")},
        },
        "output_dir": str(tmp_path / "comparison"),
        "params": {"num_image_pairs": 1, "num_matches_per_image_pair": 5},
    }
    dce = DCE(registry, dataset=split_dataset)
    assert dce.network_names() == ["net_a", "net_b"]

    dcn = dce.load_network_from_config("net_b")
    assert dcn.descriptor_dimension == 3

    stats = dce.compare_networks(mode="train")
    assert set(stats) == {"net_a", "net_b"}
    assert os.path.exists(str(tmp_path / "comparison" / "comparison_train.png"))
    # per-network per-mode CSVs written by evaluate_single_network
    assert os.path.exists(str(tmp_path / "comparison" / "net_a" / "train" / "data.csv"))


def test_registry_unknown_network_raises(split_dataset):
    dce = DCE({"networks": {}}, dataset=split_dataset)
    with pytest.raises(ValueError, match="not in config"):
        dce.load_network_from_config("missing")


def test_2d_cluster_plot(model_folder, split_dataset, tmp_path):
    from pdc_tpu.evaluation.qualitative import make_2d_cluster_plot
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

    dcn = DenseCorrespondenceNetwork.from_model_folder(model_folder)
    samples = make_2d_cluster_plot(
        dcn, split_dataset, num_images=4, num_samples_per_image=10,
        plot_background=True, output_dir=str(tmp_path))
    assert "background" in samples
    assert any(k.startswith("object_") for k in samples)
    for tag in ("xy", "yz", "xz"):
        assert os.path.exists(str(tmp_path / f"cluster_plot_{tag}.png"))


def test_keypoint_qualitative_figure(model_folder, split_dataset, tmp_path):
    from pdc_tpu.evaluation.qualitative import (
        single_image_pair_keypoint_qualitative_analysis,
    )
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

    dcn = DenseCorrespondenceNetwork.from_model_folder(model_folder)
    labels = _make_keypoint_labels(split_dataset)
    kd_a = dict(scene_name=labels[0]["scene_name"], image_idx=0,
                **labels[0]["keypoints"]["top"])
    kd_b = dict(scene_name=labels[1]["scene_name"], image_idx=0,
                **labels[1]["keypoints"]["top"])
    fig = single_image_pair_keypoint_qualitative_analysis(dcn, split_dataset,
                                                          kd_a, kd_b)
    fig.savefig(str(tmp_path / "kp.png"))
    assert os.path.getsize(str(tmp_path / "kp.png")) > 0
