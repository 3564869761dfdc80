"""All-logs preprocessing driver + crop-box authoring (reference
run_change_detection_pipeline.py:27-92, mesh_processing.py:32-108,
config/stations/*/change_detection.yaml)."""

import os

import numpy as np
import pytest

from pdc_tpu.data.synthetic import SyntheticScene
from pdc_tpu.pipeline.change_detection import (
    OrientedCropBox,
    fit_crop_box,
)
from pdc_tpu.pipeline.preprocessing import (
    already_ran_change_detection,
    discover_processed_scenes,
    run_change_detection_pipeline,
)


@pytest.fixture(scope="module")
def logs_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("logs_proto")
    for i, seed in enumerate((0, 1)):
        sc = SyntheticScene(width=64, height=48, num_frames=3, seed=seed)
        sc.write_scene(str(root / f"scene_{i}"))
    return str(root)


def test_discover_and_skip(logs_dir):
    scenes = discover_processed_scenes(logs_dir)
    assert len(scenes) == 2
    # write_scene emits masks + depth, so scenes read as already done
    assert all(already_ran_change_detection(s) for s in scenes)
    res = run_change_detection_pipeline(logs_dir)
    assert all(v == 0 for v in res.values())


def test_discover_rejects_unfused_scene(tmp_path):
    os.makedirs(tmp_path / "raw_scene")
    with pytest.raises(ValueError, match="run fusion"):
        discover_processed_scenes(str(tmp_path))


def test_fit_crop_box_finds_object():
    sc = SyntheticScene(width=64, height=48, num_frames=2)
    box = fit_crop_box(sc.fusion_points())
    # the object disc has radius 0.25 centered at the origin
    cx, cy = box.transform[0, 3], box.transform[1, 3]
    assert abs(cx) < 0.05 and abs(cy) < 0.05
    assert 0.4 < box.dimensions[0] < 0.8
    assert 0.4 < box.dimensions[1] < 0.8
    # the filtered points are the object puck, not the table
    kept = box.filter(sc.fusion_points())
    assert kept.shape[0] > 100
    assert (kept[:, 2] > 0.005).all()


def test_station_config_roundtrip():
    sc = SyntheticScene(width=64, height=48, num_frames=2)
    box = fit_crop_box(sc.fusion_points())
    cfg = box.to_station_config()
    assert set(cfg["crop_box"]) == {"transform", "dimensions"}
    box2 = OrientedCropBox.from_station_config(cfg)
    np.testing.assert_allclose(box2.transform, box.transform, atol=1e-9)
    assert box2.dimensions == pytest.approx(box.dimensions)


def test_reference_station_config_parses():
    """The shipped station YAML format (RLG_iiwa_1/change_detection.yaml)
    loads unchanged."""
    cfg = {
        "crop_box": {
            "transform": {
                "quaternion": {"w": 1, "x": 0, "y": 0, "z": 0},
                "translation": {"x": 0.66757267, "y": 0, "z": 0.18953078},
            },
            "dimensions": {"x": 0.5, "y": 0.7, "z": 0.4},
        },
        "point_size": 3,
    }
    box = OrientedCropBox.from_station_config(cfg)
    assert box.transform[0, 3] == pytest.approx(0.66757267)
    # a point inside the box survives filtering, one outside does not
    inside = np.array([[0.66, 0.0, 0.19]])
    outside = np.array([[2.0, 0.0, 0.19]])
    assert box.filter(inside).shape[0] == 1
    assert box.filter(outside).shape[0] == 0


@pytest.mark.slow
def test_pipeline_regenerates_masks(logs_dir):
    from PIL import Image

    res = run_change_detection_pipeline(logs_dir, redo=True)
    assert all(v == 3 for v in res.values())
    scene = discover_processed_scenes(logs_dir)[0]
    # fitted crop box was persisted in station format
    assert os.path.exists(os.path.join(scene, "crop_box.yaml"))
    regen = np.array(Image.open(
        os.path.join(scene, "image_masks", "000000_mask.png")))
    sc = SyntheticScene(width=64, height=48, num_frames=3, seed=0)
    _, _, true_mask, _ = sc.render(0)
    inter = ((regen > 0) & (true_mask > 0)).sum()
    union = ((regen > 0) | (true_mask > 0)).sum()
    assert inter / union > 0.5, f"regenerated mask IoU too low: {inter/union}"
    # depth re-render exists for every frame
    for i in range(3):
        assert os.path.exists(os.path.join(
            scene, "rendered_images", "%06d_depth.png" % i))


def test_cli_main(logs_dir, capsys):
    from pdc_tpu.pipeline.preprocessing import main

    main(["--data_dir", logs_dir])
    out = capsys.readouterr().out
    assert "already done" in out


def test_process_scene_fused_matches_two_pass(tmp_path):
    """The fused one-dispatch scene pass (device-side mask + uint16 mm
    encoding, renderer.render_scene_products) writes byte-identical PNGs to
    the two-pass run() + render_depth_images() flow."""
    from PIL import Image

    from pdc_tpu.pipeline.change_detection import ChangeDetection, fit_crop_box

    a = tmp_path / "a" / "scene"
    b = tmp_path / "b" / "scene"
    sc = SyntheticScene(width=64, height=48, num_frames=3, seed=4)
    for d in (a, b):
        sc.write_scene(str(d))

    outputs = {}
    for name, d in (("two_pass", a), ("fused", b)):
        cd, structure = ChangeDetection.from_data_folder(
            str(d / "processed"))
        cd.set_crop_box(fit_crop_box(cd.points))
        if name == "two_pass":
            n = cd.run(structure)
            cd.render_depth_images(structure)
        else:
            n = cd.process_scene(structure)
        assert n == 3
        frames = {}
        for i in range(3):
            frames[i] = tuple(
                np.asarray(Image.open(os.path.join(dirpath, fn % i)))
                for dirpath, fn in (
                    (structure.masks_dir, "%06d_mask.png"),
                    (structure.rendered_images_dir, "%06d_depth_cropped.png"),
                    (structure.rendered_images_dir, "%06d_depth.png")))
        outputs[name] = frames

    for i in range(3):
        for got, want in zip(outputs["fused"][i], outputs["two_pass"][i]):
            np.testing.assert_array_equal(got, want)


def test_over_budget_scene_preps_once(tmp_path, monkeypatch):
    """When the fused render is over the fragment budget, the driver must
    go straight to the two-pass flow — NOT re-enter process_scene, which
    repeats process_scene_start's full per-pose host prep on exactly the
    heaviest scenes (ADVICE r4). The budget path is simulated by forcing
    render_scene_products_start to report over-budget (None)."""
    import pdc_tpu.pipeline.renderer as renderer
    from pdc_tpu.pipeline.change_detection import ChangeDetection

    root = tmp_path / "logs"
    sc = SyntheticScene(width=64, height=48, num_frames=3, seed=2)
    sc.write_scene(str(root / "scene_hot"))

    calls = {"n": 0}
    real = renderer.render_scene_products_start

    def counting_over_budget(*args, **kwargs):
        calls["n"] += 1
        return real(*args, **kwargs, max_fragments=0)  # always over budget

    monkeypatch.setattr(renderer, "render_scene_products_start",
                        counting_over_budget)

    # the sentinel is distinguishable from the structural-fallback None
    cd, structure = ChangeDetection.from_data_folder(
        str(root / "scene_hot" / "processed"))
    from pdc_tpu.pipeline.change_detection import fit_crop_box

    cd.set_crop_box(fit_crop_box(cd.points))
    assert cd.process_scene_start(structure) is ChangeDetection.OVER_BUDGET
    calls["n"] = 0

    res = run_change_detection_pipeline(str(root), redo=True)
    assert list(res.values()) == [3]  # frames still written via two-pass
    assert calls["n"] == 1, f"host prep ran {calls['n']}x for one scene"
