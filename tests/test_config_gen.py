"""Dataset-config generator: discover scenes on disk, emit the scene-list /
composite YAML corpus, and load it back through SpartanDataset (replaces the
reference's 85 hand-maintained config/dense_correspondence/dataset YAMLs)."""

import os

import pytest

from pdc_tpu.data.config_gen import (
    discover_scenes,
    generate_dataset_configs,
    group_scenes_by_object,
    make_scene_list_config,
)
from pdc_tpu.data.synthetic import SyntheticScene
from pdc_tpu.utils.yaml_io import load_yaml


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("pdc_data")
    logs = root / "logs_proto"
    for i, name in enumerate(
            ["2020-01-01-caterpillar-a", "2020-01-02-caterpillar-b",
             "2020-01-03-caterpillar-c", "2020-02-01-shoe-a",
             "2020-02-02-shoe-b"]):
        scene = SyntheticScene(width=32, height=24, num_frames=2, seed=i)
        scene.write_scene(str(logs / name))
    # an invalid entry that must be skipped (no pose data)
    os.makedirs(logs / "broken_scene" / "processed" / "images")
    return str(root)


def test_discover_scenes_validates_layout(data_root):
    scenes = discover_scenes(data_root)
    assert len(scenes) == 5
    assert "broken_scene" not in scenes
    assert scenes == sorted(scenes)


def test_group_by_prefix():
    groups = group_scenes_by_object(
        ["a-1", "a-2", "b-1", "c-1"],
        object_of={"a-": "caterpillar", "b-": "shoe"})
    assert groups == {"caterpillar": ["a-1", "a-2"], "shoe": ["b-1"],
                      "object": ["c-1"]}


def test_scene_list_split_deterministic():
    cfg = make_scene_list_config("cat", [f"s{i}" for i in range(10)],
                                 test_fraction=0.2)
    assert cfg["object_id"] == "cat"
    assert len(cfg["train"]) == 8 and len(cfg["test"]) == 2
    assert cfg["test"] == ["s8", "s9"]
    # always at least one test scene (and at least one train scene)
    tiny = make_scene_list_config("cat", ["only", "two"], test_fraction=0.0)
    assert len(tiny["test"]) == 1 and len(tiny["train"]) == 1


def test_generate_and_load_roundtrip(data_root, tmp_path):
    out = str(tmp_path / "config")
    res = generate_dataset_configs(
        data_root, out, composite_name="synthetic_two_objects",
        object_of={"2020-01": "caterpillar", "2020-02": "shoe"},
        test_fraction=0.34)
    assert res["num_scenes"] == 5
    assert set(res["single_object"]) == {"caterpillar", "shoe"}

    composite = load_yaml(res["composite"])
    assert len(composite["single_object_scenes_config_files"]) == 2
    assert composite["multi_object_scenes_config_files"] == []

    # the generated corpus loads through the dataset layer in both modes
    from pdc_tpu.data.dataset import SpartanDataset

    ds = SpartanDataset(config=composite, data_dir=data_root,
                        config_dir=out)
    ds.set_train_mode()
    train = set(ds.scenes)
    ds.set_test_mode()
    test = set(ds.scenes)
    assert train and test and train.isdisjoint(test)
    assert len(train) + len(test) == 5
    # object ids flowed through from the scene lists
    name = next(iter(train))
    assert ds.get_scene(name).object_id in ("caterpillar", "shoe")


def test_multi_object_routing(data_root, tmp_path):
    out = str(tmp_path / "config")
    res = generate_dataset_configs(
        data_root, out, object_of={"2020-01": "caterpillar", "2020-02": "both"},
        multi_object_ids=["both"])
    composite = load_yaml(res["composite"])
    assert len(composite["multi_object_scenes_config_files"]) == 1
    assert "both" in res["multi_object"]


def test_copy_dataset_scenes(data_root, tmp_path):
    """Dataset-subset extraction (reference scripts/dataset_copy_util.ipynb)."""
    from pdc_tpu.data.config_gen import copy_dataset_scenes

    out = str(tmp_path / "config")
    res = generate_dataset_configs(
        data_root, out, object_of={"2020-01": "caterpillar", "2020-02": "shoe"})
    composite = load_yaml(res["composite"])

    target = str(tmp_path / "subset")
    dry = copy_dataset_scenes(composite, out, data_root, target, dry_run=True)
    assert len(dry) == 5
    assert not os.path.exists(os.path.join(target, "logs_proto"))

    copied = copy_dataset_scenes(composite, out, data_root, target)
    assert sorted(copied) == sorted(dry)
    for name in copied:
        assert os.path.exists(os.path.join(
            target, "logs_proto", name, "processed", "images", "pose_data.yaml"))
    # idempotent: second run copies nothing
    assert copy_dataset_scenes(composite, out, data_root, target) == []
    # the copied tree is itself a loadable data root
    from pdc_tpu.data.config_gen import discover_scenes

    assert len(discover_scenes(target)) == 5


def test_migrate_old_format_logs(tmp_path):
    """Old flat scene layout -> processed/raw (reference
    scripts/convert_data_to_new_format.py)."""
    from pdc_tpu.data.migrate import migrate_logs

    logs = tmp_path / "logs_proto"
    old = logs / "old_scene"
    (old / "images").mkdir(parents=True)
    (old / "images" / "000000_rgb.png").write_bytes(b"png")
    (old / "fusion_mesh.ply").write_bytes(b"ply")
    (old / "fusion.bag").write_bytes(b"bag")
    new = logs / "new_scene"
    (new / "processed" / "images").mkdir(parents=True)

    assert migrate_logs(str(logs), dry_run=True) == ["old_scene"]
    assert (old / "fusion_mesh.ply").exists()  # dry run moved nothing

    assert migrate_logs(str(logs)) == ["old_scene"]
    assert (old / "processed" / "fusion_mesh.ply").exists()
    assert (old / "processed" / "images" / "000000_rgb.png").exists()
    assert (old / "raw" / "fusion.bag").exists()
    assert not (old / "fusion_mesh.ply").exists()
    # idempotent; new-format scene untouched
    assert migrate_logs(str(logs)) == []
    assert (new / "processed" / "images").exists()
