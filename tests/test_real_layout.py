"""First contact with the PUBLISHED pdc on-disk layout.

The synthetic fixtures elsewhere are sanitized; the published dataset
(reference ``doc/data_organization.md``) has non-contiguous downsampled
%06d indices, pose_data.yaml keys without files, the full spartan/ROS
``camera_info.yaml`` calibration variant, twin ``_visible_mask`` /
``_depth_cropped`` files, and ``raw/`` rosbag siblings. These tests pin the
on-disk contract over a miniature tree with all of those quirks
(tests/fixtures/real_layout.py) — including one log in the PRE-migration
flat layout — and drive the whole first-contact journey:
download(dry-run) -> migrate -> config-gen -> preprocess -> train ->
evaluate. (VERDICT r3 item 5.)
"""

import os
import shutil

import numpy as np
import pytest

from pdc_tpu.data.dataset import SpartanDataset
from pdc_tpu.data.scene import SceneStructure
from pdc_tpu.utils.yaml_io import load_yaml, save_yaml
from tests.fixtures.real_layout import write_miniature_scene

W, H = 64, 48

SCENES = ["2018-04-10-16-02-59", "2018-04-10-16-04-10", "2018-04-10-16-08-46"]


def _write_tree(data_dir, scenes=SCENES, num_frames=4):
    """Miniature logs_proto tree; each scene has distinct geometry (seed)."""
    indices = {}
    for i, name in enumerate(scenes):
        processed = os.path.join(data_dir, "logs_proto", name, "processed")
        indices[name] = write_miniature_scene(
            processed, num_frames=num_frames, width=W, height=H, seed=i,
            first_index=3 + 2 * i, stride=17 + i)
    return indices


def _flatten_to_old_layout(scene_dir):
    """Rewrite a new-layout log into the pre-migration flat layout
    (everything at top level + fusion.bag; reference
    scripts/convert_data_to_new_format.py is the forward migration)."""
    processed = os.path.join(scene_dir, "processed")
    raw = os.path.join(scene_dir, "raw")
    for name in os.listdir(processed):
        shutil.move(os.path.join(processed, name),
                    os.path.join(scene_dir, name))
    os.rmdir(processed)
    bag = next(f for f in os.listdir(raw) if f.endswith(".bag"))
    shutil.move(os.path.join(raw, bag), os.path.join(scene_dir, "fusion.bag"))
    os.rmdir(raw)


def test_miniature_scene_quirks(tmp_path):
    """The loader navigates every published-layout quirk: non-contiguous
    file indices, orphan pose keys, the ROS camera_info variant."""
    processed = str(tmp_path / "logs_proto" / SCENES[0] / "processed")
    written = write_miniature_scene(processed, num_frames=4, width=W,
                                    height=H, first_index=3, stride=17)
    assert written == [3, 20, 37, 54]

    structure = SceneStructure(processed)
    # pose_data has orphan keys (1, 29) the downsampler dropped
    pose_map = structure.load_pose_data()
    assert set(written) < set(pose_map.keys())
    assert {1, 29} <= set(pose_map.keys())

    # the ROS calibration variant parses down to the 3x3 + size
    intr = structure.load_camera_intrinsics()
    assert (intr.width, intr.height) == (W, H)
    assert intr.fx > 0 and abs(intr.cx - (W / 2 - 0.5)) < 1e-6

    from pdc_tpu.data.dataset import SceneData

    sd = SceneData.from_structure(structure, SCENES[0])
    assert sd.num_frames == 4
    # frame ids are the on-disk indices, orphans dropped
    assert sd.frame_ids is not None
    np.testing.assert_array_equal(sd.file_indices, written)
    assert sd.position(37) == 2
    with pytest.raises(KeyError):
        sd.position(29)  # orphan pose key has no frame
    # poses align with file indices (camera orbit: consecutive positions
    # differ)
    assert not np.allclose(sd.poses[0], sd.poses[1])


def test_migrate_flat_layout(tmp_path):
    """A pre-migration flat log migrates in place and then loads."""
    from pdc_tpu.data.migrate import migrate_scene_to_new_format

    scene_dir = str(tmp_path / "logs_proto" / SCENES[0])
    write_miniature_scene(os.path.join(scene_dir, "processed"),
                          num_frames=3, width=W, height=H)
    _flatten_to_old_layout(scene_dir)
    assert os.path.isfile(os.path.join(scene_dir, "fusion_mesh.ply"))

    assert migrate_scene_to_new_format(scene_dir) is True
    assert os.path.isfile(
        os.path.join(scene_dir, "processed", "fusion_mesh.ply"))
    assert os.path.isfile(os.path.join(scene_dir, "raw", "fusion.bag"))
    # second run is a no-op
    assert migrate_scene_to_new_format(scene_dir) is False

    from pdc_tpu.data.dataset import SceneData

    sd = SceneData.from_structure(
        SceneStructure(os.path.join(scene_dir, "processed")), SCENES[0])
    assert sd.num_frames == 3


@pytest.mark.slow
def test_first_contact_journey(tmp_path):
    """download(dry-run) -> migrate -> config-gen -> preprocess -> train ->
    evaluate over the miniature published-layout tree."""
    data_dir = str(tmp_path / "pdc")
    _write_tree(data_dir)
    # one log arrives in the pre-migration flat layout
    _flatten_to_old_layout(os.path.join(data_dir, "logs_proto", SCENES[1]))

    # -- migrate ---------------------------------------------------------
    from pdc_tpu.data.migrate import migrate_logs

    logs_dir = os.path.join(data_dir, "logs_proto")
    migrated = migrate_logs(logs_dir)
    assert [os.path.basename(m) for m in migrated] == [SCENES[1]]

    # -- config-gen ------------------------------------------------------
    from pdc_tpu.data.config_gen import generate_dataset_configs

    cfg_dir = str(tmp_path / "cfg")
    generate_dataset_configs(data_dir, cfg_dir, test_fraction=0.34)
    composites = sorted(os.listdir(os.path.join(cfg_dir, "composite")))
    assert composites
    composite = os.path.join(cfg_dir, "composite", composites[0])

    # -- download dry-run (URL expansion only; zero egress) --------------
    from pdc_tpu.data.download import scene_urls_from_composite_config

    urls = scene_urls_from_composite_config(
        load_yaml(composite), config_dir=os.path.dirname(composite))
    assert len(urls) == len(SCENES)
    assert all(u.endswith(".tar.gz") for u in urls)
    assert any(SCENES[0] in u for u in urls)

    # -- preprocess (change detection re-derives masks + depth) ----------
    from pdc_tpu.pipeline.preprocessing import run_change_detection_pipeline

    results = run_change_detection_pipeline(logs_dir, redo=True,
                                            render_full_depth=True)
    assert len(results) == len(SCENES)
    assert all(n > 0 for n in results.values())
    # rendered depth still loads with the non-contiguous indices
    structure = SceneStructure(
        os.path.join(logs_dir, SCENES[0], "processed"))
    idx0 = structure.frame_indices()[0]
    assert os.path.isfile(structure.depth_image_filename(idx0))

    # -- train -----------------------------------------------------------
    from tests.test_train import tiny_config
    from pdc_tpu.training.train import DenseCorrespondenceTraining

    ds = SpartanDataset(config=load_yaml(composite), data_dir=data_dir,
                        config_dir=os.path.dirname(composite))
    assert ds.num_scenes == 2  # train split
    cfg = tiny_config(tmp_path, iters=4, batch=2)
    cfg["training"]["logging_dir_name"] = "first_contact"
    trainer = DenseCorrespondenceTraining(config=cfg, dataset=ds)
    folder = trainer.run()
    losses = trainer._logging_dict["train"]["loss"]
    assert len(losses) == 4 and np.isfinite(losses).all()

    # -- evaluate --------------------------------------------------------
    from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation

    df = DenseCorrespondenceEvaluation.evaluate_network_quantitative(
        trainer.get_dcn(), ds, num_image_pairs=2,
        num_matches_per_image_pair=16)
    assert len(df) > 0
    assert np.isfinite(df["pixel_match_error_l2"].to_numpy()).all()
