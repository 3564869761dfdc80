"""Reference-API accessors + file-index/array-position mapping.

The reference's image indices are pose_data.yaml keys (%06d file numbers),
which need not start at 0 or be contiguous (frames with missing files are
dropped at load; spartan_dataset_masked.py:1186 exists precisely because
scenes may not start at index 0). pdc_tpu stores frames in dense in-memory
arrays, so every public accessor maps file index -> array position through
``SceneData.frame_ids``.
"""

import dataclasses

import numpy as np
import pytest

from pdc_tpu.data.dataset import ImageType, SpartanDataset


def _make_offset_dataset(offset=10, step=3):
    """Synthetic dataset whose single scene pretends its frames live at
    on-disk indices offset, offset+step, ... (non-contiguous)."""
    ds = SpartanDataset.make_synthetic(num_scenes=1, width=32, height=24,
                                       num_frames=6)
    name = ds.get_scene_list()[0]
    scene = ds.get_scene(name)
    ids = np.arange(scene.num_frames) * step + offset
    patched = dataclasses.replace(scene, frame_ids=ids)
    for mode in ("train", "test"):
        reg = ds._registry(mode)
        if name in reg["scenes"]:
            reg["scenes"][name] = patched
    return ds, name, patched, ids


def test_position_mapping_roundtrip():
    ds, name, scene, ids = _make_offset_dataset()
    for pos, fid in enumerate(ids):
        assert scene.position(int(fid)) == pos
        assert scene.frame_id(pos) == int(fid)
    with pytest.raises(KeyError):
        scene.position(int(ids[0]) + 1)  # between two real ids
    with pytest.raises(KeyError):
        scene.position(0)  # before the first frame


def test_accessors_use_file_indices():
    ds, name, scene, ids = _make_offset_dataset()
    fid = int(ids[2])
    rgb, depth, mask, pose = ds.get_rgbd_mask_pose(name, fid)
    np.testing.assert_array_equal(rgb, scene.rgb[2])
    np.testing.assert_array_equal(depth, scene.depth[2])
    np.testing.assert_array_equal(mask, scene.mask[2])
    np.testing.assert_array_equal(pose, scene.poses[2])
    np.testing.assert_array_equal(
        ds.get_rgb_image_from_scene_name_and_idx(name, fid), scene.rgb[2])
    np.testing.assert_array_equal(
        ds.get_depth_image_from_scene_name_and_idx(name, fid), scene.depth[2])
    np.testing.assert_array_equal(
        ds.get_mask_image_from_scene_name_and_idx(name, fid), scene.mask[2])
    np.testing.assert_array_equal(
        ds.get_pose_from_scene_name_and_idx(name, fid), scene.poses[2])
    assert ds.get_first_image_index(name) == int(ids[0])


def test_sampling_returns_file_indices():
    ds, name, scene, ids = _make_offset_dataset()
    valid = set(int(i) for i in ids)
    for _ in range(10):
        idx = ds.get_random_image_index(name)
        assert idx in valid
        idx_b = ds.get_img_idx_with_different_pose(
            name, scene.poses[scene.position(idx)])
        if idx_b is not None:
            assert idx_b in valid

    # the training pipeline still assembles correct pairs
    pair = ds.sample_pair()
    if pair.match_type != -1:
        ia = pair.metadata["image_a_idx"]
        assert ia in valid
        np.testing.assert_array_equal(pair.rgb_a,
                                      scene.rgb[scene.position(ia)])
    batch = ds.make_host_batch(2)
    assert batch["rgb_a"].shape[0] == 2


def test_contiguous_scene_is_identity():
    ds = SpartanDataset.make_synthetic(num_scenes=1, width=32, height=24,
                                       num_frames=4)
    name = ds.get_scene_list()[0]
    scene = ds.get_scene(name)
    assert scene.frame_ids is None
    assert scene.position(3) == 3
    np.testing.assert_array_equal(scene.file_indices, np.arange(4))
    with pytest.raises(KeyError):
        scene.position(4)


def test_scene_listing_accessors():
    ds = SpartanDataset.make_synthetic(num_scenes=2, num_objects=2,
                                       width=32, height=24, num_frames=4)
    names = ds.get_scene_list()
    assert sorted(names) == sorted(ds.scenes.keys())
    assert list(ds.scene_generator()) == names
    objects = ds.get_list_of_objects()
    assert len(objects) == 2
    per_object = [s for o in objects for s in ds.get_scene_list_for_object(o)]
    assert sorted(per_object) == sorted(names)

    rgb, depth, mask, pose = ds.get_random_rgbd_mask_pose()
    assert rgb.shape == (24, 32, 3) and depth.shape == (24, 32)
    assert mask.shape == (24, 32) and pose.shape == (4, 4)

    ds.load_all_pose_data()  # no-op, must not raise

    # synthetic scenes have no on-disk layout
    with pytest.raises(ValueError):
        ds.get_full_path_for_scene(names[0])
    with pytest.raises(ValueError):
        ds.get_image_filename(names[0], 0, ImageType.RGB)


def test_image_filename_for_disk_scene(tmp_path):
    from pdc_tpu.data.scene import SceneStructure

    structure = SceneStructure(str(tmp_path / "processed"))
    ds = SpartanDataset.make_synthetic(num_scenes=1, width=32, height=24,
                                       num_frames=2)
    name = ds.get_scene_list()[0]
    scene = dataclasses.replace(ds.get_scene(name), structure=structure)
    ds._registry("train")["scenes"][name] = scene
    assert ds.get_full_path_for_scene(name) == structure.processed_folder
    assert ds.get_image_filename(name, 7, ImageType.RGB).endswith(
        "images/000007_rgb.png")
    assert "depth" in ds.get_image_filename(name, 7, ImageType.DEPTH)
    assert "mask" in ds.get_image_filename(name, 7, ImageType.MASK)
    with pytest.raises(ValueError):
        ds.get_image_filename(name, 7, 99)


def test_static_uv_helpers():
    u = np.array([1, 5, 0])
    v = np.array([2, 0, 3])
    flat = SpartanDataset.flatten_uv_tensor((u, v), image_width=8)
    np.testing.assert_array_equal(flat, v * 8 + u)
    img = SpartanDataset.mask_image_from_uv_flat_tensor(flat, 8, 4)
    assert img.shape == (32,)
    assert img.sum() == 3
    assert img[2 * 8 + 1] == 1 and img[3] == 0
