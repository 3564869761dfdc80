"""Aux components: mesh descriptors, downloader expansion, eval utils."""

import os

import jax.numpy as jnp
import numpy as np

from pdc_tpu.data.dataset import SpartanDataset

W, H = 64, 48


class IdentityDCN:
    descriptor_dimension = 3
    image_mean = np.zeros(3)
    image_std_dev = np.ones(3)

    def forward_on_img(self, rgb):
        return jnp.asarray(rgb, jnp.float32) / 255.0


def test_mesh_descriptors():
    from pdc_tpu.apps.mesh_descriptors import compute_mesh_descriptors

    ds = SpartanDataset.make_synthetic(num_scenes=1, width=W, height=H, num_frames=6)
    scene = ds.get_scene("scene_000")
    # vertices on the object disc (world plane z=0)
    rng = np.random.RandomState(0)
    r = 0.2 * np.sqrt(rng.rand(200))
    th = rng.rand(200) * 2 * np.pi
    pts = np.stack([r * np.cos(th), r * np.sin(th), np.zeros(200)], -1)

    out = compute_mesh_descriptors(IdentityDCN(), scene, pts)
    assert out["descriptors"].shape == (200, 3)
    # disc center is visible from the whole ring of cameras
    assert (out["num_observations"] > 0).mean() > 0.9
    # identity descriptors = texture colors; two views of the same vertex
    # agree, so the averaged descriptor should be close to any single
    # frame's sample for well-observed vertices
    seen = out["num_observations"] > 3
    assert seen.sum() > 50
    assert np.isfinite(out["descriptors"]).all()


def test_mesh_descriptor_save(tmp_path):
    from pdc_tpu.apps.mesh_descriptors import save_mesh_descriptors
    from pdc_tpu.data.scene import SceneStructure

    structure = SceneStructure(str(tmp_path))
    out = save_mesh_descriptors(
        {"vertices": np.zeros((3, 3)), "descriptors": np.zeros((3, 2)),
         "num_observations": np.zeros(3)},
        structure, "net_a",
    )
    assert os.path.exists(out)
    loaded = np.load(out)
    assert loaded["descriptors"].shape == (3, 2)


def test_download_url_expansion(tmp_path):
    from pdc_tpu.data.download import download_pdc_data, scene_urls_from_composite_config
    from pdc_tpu.utils.yaml_io import save_yaml

    scenes_yaml = os.path.join(tmp_path, "caterpillar_scenes.yaml")
    save_yaml({"train": ["2018-04-10-16-02-59", "2018-04-16-14-25-19"],
               "test": ["2018-04-10-16-08-46"]}, scenes_yaml)
    composite = os.path.join(tmp_path, "composite.yaml")
    save_yaml({"logs_root_path": "logs_proto",
               "single_object_scenes_config_files": ["caterpillar_scenes.yaml"]},
              composite)

    from pdc_tpu.utils.yaml_io import load_yaml

    urls = scene_urls_from_composite_config(load_yaml(composite), config_dir=str(tmp_path))
    assert len(urls) == 3
    assert all(u.endswith(".tar.gz") for u in urls)
    assert any("2018-04-10-16-02-59" in u for u in urls)

    handled = download_pdc_data(composite, str(tmp_path), dry_run=True)
    assert len(handled) == 3


def test_panda_wrapper_and_keypoint_df():
    from pdc_tpu.evaluation.utils import (
        PandaDataFrameWrapper,
        convert_keypoint_annotations_to_dataframe,
    )

    w = PandaDataFrameWrapper(["a", "b"])
    w.set_value("a", 1)
    try:
        w.set_value("nope", 2)
        assert False
    except KeyError:
        pass
    df = w.dataframe
    assert list(df.columns) == ["a", "b"]

    from pdc_tpu.apps.annotate_correspondences import make_annotation_entry

    ann = make_annotation_entry("s1", 0, [(1, 2)], "s2", 3, [(4, 5)])
    kdf = convert_keypoint_annotations_to_dataframe([ann])
    assert len(kdf) == 1
    assert kdf["u_b"].iloc[0] == 4


def test_distributed_single_process_fallback():
    """ensure_initialized must be a safe no-op in single-process runs and
    expose the topology helpers (reference has no distributed layer;
    SURVEY 2c)."""
    import jax

    from pdc_tpu.parallel.distributed import (
        ensure_initialized,
        local_scene_subset,
        process_info,
    )

    assert ensure_initialized() is False  # single process
    assert ensure_initialized() is False  # idempotent
    info = process_info()
    assert info["process_count"] == 1
    assert info["global_device_count"] == len(jax.devices())

    names = [f"scene_{i}" for i in range(7)]
    parts = [local_scene_subset(names, process_index=i, process_count=3)
             for i in range(3)]
    flat = sorted(n for p in parts for n in p)
    assert flat == sorted(names)
    assert max(len(p) for p in parts) - min(len(p) for p in parts) <= 1
