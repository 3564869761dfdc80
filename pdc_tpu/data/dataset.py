"""SpartanDataset — host-side scene index + pair sampling.

Rebuild of the reference dataset layer (``spartan_dataset_masked.py:39-1333``,
``dense_correspondence_dataset_masked.py:40-723``) with the work split
TPU-style:

  * THIS module (host): scene bookkeeping from the same composite YAML config
    format, pose preloading, pose-difference rejection sampling, PNG decode,
    per-sample type draws, and batch assembly into stacked uint8/uint16
    arrays.
  * :mod:`pdc_tpu.data.assembler` (device): everything from correspondence
    finding through augmentation and index flattening, as one jitted,
    vmapped XLA program.

Sample types and their probabilities mirror ``SpartanDatasetDataType`` (enum
codes 0-4) and the ``data_type_probabilities`` training-config block.
"""

from __future__ import annotations

import dataclasses
import os
import random as pyrandom
from typing import Dict, List, Optional

import numpy as np

from pdc_tpu.data.scene import SceneStructure
from pdc_tpu.geom.transforms import pose_angle, pose_distance
from pdc_tpu.losses.composer import (
    MATCH_TYPE_DIFFERENT_OBJECT,
    MATCH_TYPE_MULTI_OBJECT,
    MATCH_TYPE_SINGLE_OBJECT_ACROSS_SCENE,
    MATCH_TYPE_SINGLE_OBJECT_WITHIN_SCENE,
    MATCH_TYPE_SYNTHETIC_MULTI_OBJECT,
)
from pdc_tpu.utils.yaml_io import load_yaml

class ImageType:
    """Reference ``dense_correspondence_dataset_masked.py:35`` image-kind
    codes (used by ``get_image_filename``)."""

    RGB = 0
    DEPTH = 1
    MASK = 2


DATA_TYPE_NAMES = {
    "SINGLE_OBJECT_WITHIN_SCENE": MATCH_TYPE_SINGLE_OBJECT_WITHIN_SCENE,
    "SINGLE_OBJECT_ACROSS_SCENE": MATCH_TYPE_SINGLE_OBJECT_ACROSS_SCENE,
    "DIFFERENT_OBJECT": MATCH_TYPE_DIFFERENT_OBJECT,
    "MULTI_OBJECT": MATCH_TYPE_MULTI_OBJECT,
    "SYNTHETIC_MULTI_OBJECT": MATCH_TYPE_SYNTHETIC_MULTI_OBJECT,
}


@dataclasses.dataclass
class SceneData:
    """In-memory frames of one processed scene log."""

    name: str
    rgb: np.ndarray    # [N, H, W, 3] uint8
    depth: np.ndarray  # [N, H, W] uint16 (mm)
    mask: np.ndarray   # [N, H, W] uint8
    poses: np.ndarray  # [N, 4, 4] float64 camera-to-world
    K: np.ndarray      # [3, 3]
    object_id: Optional[str] = None
    # on-disk %06d file indices of the loaded frames (pose_data.yaml keys
    # need not start at 0 or be contiguous; frames with missing files are
    # dropped at load). None => positions and file ids coincide.
    frame_ids: Optional[np.ndarray] = None
    # source layout (None for synthetic/in-memory scenes)
    structure: Optional[SceneStructure] = None

    @property
    def num_frames(self):
        return self.rgb.shape[0]

    @property
    def file_indices(self) -> np.ndarray:
        """The reference's image indices (pose_data.yaml keys / %06d file
        numbers) for each loaded frame position."""
        if self.frame_ids is None:
            return np.arange(self.num_frames)
        return self.frame_ids

    def position(self, file_idx: int) -> int:
        """Array position of the frame with on-disk index ``file_idx``.

        Annotation YAMLs (``new_annotated_pairs.yaml`` image_idx fields) and
        every reference-facing accessor use FILE indices; the in-memory
        arrays are positional. Identity when the scene's indices are
        contiguous from 0 (the common pdc layout)."""
        if self.frame_ids is None:
            if not 0 <= file_idx < self.num_frames:
                raise KeyError(f"scene {self.name}: no frame {file_idx}")
            return int(file_idx)
        pos = int(np.searchsorted(self.frame_ids, file_idx))
        if pos >= len(self.frame_ids) or self.frame_ids[pos] != file_idx:
            raise KeyError(f"scene {self.name}: no frame with file index "
                           f"{file_idx} (have {len(self.frame_ids)} frames "
                           f"in [{self.frame_ids[0]}, {self.frame_ids[-1]}])")
        return pos

    def frame_id(self, pos: int) -> int:
        """On-disk file index of the frame at array position ``pos``."""
        if self.frame_ids is None:
            return int(pos)
        return int(self.frame_ids[pos])

    @staticmethod
    def from_structure(structure: SceneStructure, name: str, object_id=None):
        """Decode a scene from the pdc on-disk layout (parallel native PNG
        decode when ``native/libpdc_loader.so`` is available, PIL fallback)."""
        from pdc_tpu.data.native_loader import load_scene_frames

        intr = structure.load_camera_intrinsics()
        pose_map = structure.load_pose_data()
        indices = sorted(pose_map.keys())
        # keep only frames whose files exist
        indices = [
            i for i in indices
            if os.path.exists(structure.rgb_image_filename(i))
            and os.path.exists(structure.depth_image_filename(i))
        ]
        rgb, depth, mask = load_scene_frames(
            structure, indices, intr.height, intr.width
        )
        poses = np.stack([pose_map[i] for i in indices])
        ids = np.asarray(indices, np.int64)
        if ids.size and ids[0] == 0 and ids[-1] == ids.size - 1:
            ids = None  # contiguous from 0: positions == file ids
        return SceneData(
            name=name, rgb=rgb, depth=depth, mask=mask,
            poses=poses, K=intr.K, object_id=object_id,
            frame_ids=ids, structure=structure,
        )

    @staticmethod
    def from_synthetic(scene, name: str = "synthetic", object_id="synthetic_object"):
        rgb, depth, mask, poses = scene.render_all()
        return SceneData(name=name, rgb=rgb, depth=depth, mask=mask,
                         poses=poses, K=scene.K, object_id=object_id)


@dataclasses.dataclass
class SamplePair:
    """One host-assembled training pair (device assembly happens later)."""

    match_type: int
    rgb_a: np.ndarray
    depth_a: np.ndarray
    mask_a: np.ndarray
    pose_a: np.ndarray
    rgb_b: np.ndarray
    depth_b: np.ndarray
    mask_b: np.ndarray
    pose_b: np.ndarray
    K: np.ndarray
    metadata: dict
    # second within-scene pair (SYNTHETIC_MULTI_OBJECT compositing only)
    second: "SamplePair | None" = None


class SpartanDataset:
    """Scene registry + pair sampler.

    Construct either from the reference's composite dataset YAML config
    (``config`` dict with ``logs_root_path`` +
    ``single_object_scenes_config_files`` lists, resolved against
    ``config_dir``/data_dir), from an expanded config, or directly from
    in-memory :class:`SceneData` (synthetic scenes, tests).
    """

    # pose-difference rejection thresholds
    # (dense_correspondence_dataset_masked.py:260-287)
    POSE_DIST_THRESHOLD = 0.2   # metres
    POSE_ANGLE_THRESHOLD = 20.0  # degrees

    def __init__(self, scenes: Optional[List[SceneData]] = None, mode: str = "train",
                 config: Optional[dict] = None, config_expanded: Optional[dict] = None,
                 data_dir: Optional[str] = None, config_dir: Optional[str] = None,
                 seed: int = 0):
        self.mode = mode
        self._rng = pyrandom.Random(seed)
        self._np_rng = np.random.RandomState(seed)
        # per-mode scene registries: mode -> {scenes, single, multi}; composite
        # configs load each split lazily on first access (the reference
        # reloads scene lists on set_train_mode/set_test_mode,
        # dense_correspondence_dataset_masked.py:521 + spartan :154-222)
        self._registries: Dict[str, dict] = {}
        self.config = config_expanded or config or {}
        self._composite_config = None
        self._data_dir = data_dir
        self._config_dir = config_dir

        # training-config-injected parameters
        # (dense_correspondence_dataset_masked.py:521-589 defaults)
        self.num_matching_attempts = 10000
        self.num_non_matches_per_match = 150
        self.fraction_masked_non_matches = 0.5
        self.fraction_background_non_matches = 0.5
        self.cross_scene_num_samples = 10000
        self.sample_matches_only_off_mask = True
        self._use_image_b_mask_inv = True
        self._domain_randomize = True
        self._data_type_probabilities = {MATCH_TYPE_SINGLE_OBJECT_WITHIN_SCENE: 1.0}

        if scenes is not None:
            for s in scenes:
                self.add_scene(s)
        elif config is not None and "single_object_scenes_config_files" in config:
            self._composite_config = config

    def config_snapshot(self) -> dict:
        """Config dict for a model folder's ``dataset.yaml`` snapshot
        (reference training.py:525-541). For composite on-disk datasets the
        snapshot additionally records absolute ``data_dir``/``config_dir`` so
        :meth:`from_dataset_config` can reconstruct the dataset from the
        snapshot alone (reference evaluation.py:139-141)."""
        cfg = dict(self.config or {})
        if self._composite_config is not None:
            cfg["data_dir"] = os.path.abspath(self._data_dir or ".")
            if self._config_dir is not None:
                cfg["config_dir"] = os.path.abspath(self._config_dir)
        return cfg

    def reset_seed(self, seed: int = 1):
        """Re-seed the host-side sampling RNGs — the analog of the
        reference's ``utils.reset_random_seed()`` (utils.py:332-336), which
        every quantitative-eval entry point calls (evaluation.py:259, 310,
        356, 420, 483, 2171, 2332) so eval CSVs are reproducible."""
        self._rng = pyrandom.Random(seed)
        self._np_rng = np.random.RandomState(seed)

    # -- construction ---------------------------------------------------------

    def _registry(self, mode: str) -> dict:
        """Scene registry for a split, lazily loaded for composite configs."""
        if mode not in self._registries:
            reg = {"scenes": {}, "single": {}, "multi": []}
            self._registries[mode] = reg
            if self._composite_config is not None:
                self._load_from_composite_config(
                    self._composite_config, self._data_dir, self._config_dir, mode
                )
        return self._registries[mode]

    def add_scene(self, scene: SceneData, multi_object: bool = False,
                  modes=("train", "test")):
        """Register a scene. In-memory scenes default to both splits (the
        reference's in-notebook datasets behave the same way when a scene
        appears in both YAML lists); pass ``modes=("test",)`` etc. to build a
        real split."""
        if isinstance(modes, str):
            modes = (modes,)
        for mode in modes:
            reg = self._registry(mode)
            reg["scenes"][scene.name] = scene
            if multi_object:
                reg["multi"].append(scene.name)
            else:
                oid = scene.object_id or scene.name
                reg["single"].setdefault(oid, []).append(scene.name)

    def _load_from_composite_config(self, config, data_dir, config_dir, mode=None):
        """Parse the reference's composite dataset YAML
        (spartan_dataset_masked.py:154-222): per-object scene-list YAMLs with
        train/test splits, resolved under logs_root_path."""
        logs_root = config.get("logs_root_path", "logs_proto")
        data_dir = data_dir or os.environ.get("DC_DATA_DIR", ".")
        logs_dir = os.path.join(data_dir, logs_root)
        split_key = mode or self.mode  # 'train' or 'test'

        def load_scene_list(scene_cfg_file, multi_object):
            from pdc_tpu.data.config_gen import resolve_scene_list_path

            path = resolve_scene_list_path(scene_cfg_file, config_dir)
            sc = load_yaml(path)
            object_id = sc.get("object_id", os.path.splitext(os.path.basename(path))[0])
            for scene_name in sc.get(split_key, sc.get("scenes", [])):
                processed = os.path.join(logs_dir, scene_name, "processed")
                sd = SceneData.from_structure(
                    SceneStructure(processed), scene_name, object_id=object_id
                )
                self.add_scene(sd, multi_object=multi_object, modes=(split_key,))

        for f in config.get("single_object_scenes_config_files", []):
            load_scene_list(f, multi_object=False)
        for f in config.get("multi_object_scenes_config_files", []):
            load_scene_list(f, multi_object=True)

    # -- train/test mode (reference dense_correspondence_dataset_masked.py) ----

    def set_train_mode(self):
        self.mode = "train"

    def set_test_mode(self):
        self.mode = "test"

    # -- parameter injection ----------------------------------------------------

    def set_parameters_from_training_config(self, training_config: dict):
        """Same contract as the reference
        (dense_correspondence_dataset_masked.py:521-589)."""
        t = training_config["training"]
        self.num_matching_attempts = int(t["num_matching_attempts"])
        self.sample_matches_only_off_mask = bool(t["sample_matches_only_off_mask"])
        self.num_non_matches_per_match = int(t["num_non_matches_per_match"])
        self.fraction_masked_non_matches = float(t["fraction_masked_non_matches"])
        self.fraction_background_non_matches = float(t["fraction_background_non_matches"])
        self._use_image_b_mask_inv = bool(t.get("use_image_b_mask_inv", True))
        self.cross_scene_num_samples = int(t.get("cross_scene_num_samples", 10000))
        self._domain_randomize = bool(t.get("domain_randomize", True))
        probs = t.get("data_type_probabilities", {"SINGLE_OBJECT_WITHIN_SCENE": 1})
        self._data_type_probabilities = {
            DATA_TYPE_NAMES[k]: float(v) for k, v in probs.items() if float(v) > 0
        }

    @property
    def num_masked_non_matches_per_match(self):
        return int(self.num_non_matches_per_match * self.fraction_masked_non_matches)

    @property
    def num_background_non_matches_per_match(self):
        return int(self.num_non_matches_per_match * self.fraction_background_non_matches)

    # -- basic accessors ---------------------------------------------------------

    @property
    def _scenes(self) -> Dict[str, SceneData]:
        return self._registry(self.mode)["scenes"]

    @property
    def _single_object_scene_names(self) -> Dict[str, List[str]]:
        return self._registry(self.mode)["single"]

    @property
    def _multi_object_scene_names(self) -> List[str]:
        return self._registry(self.mode)["multi"]

    @property
    def scenes(self):
        return self._scenes

    @property
    def num_scenes(self):
        return len(self._scenes)

    def get_number_of_unique_single_objects(self):
        """Reference spartan_dataset_masked.py — gates across-object eval."""
        return len(self._single_object_scene_names)

    def get_random_object_id_and_int(self):
        ids = sorted(self._single_object_scene_names.keys())
        i = self._rng.randrange(len(ids))
        return ids[i], i

    @property
    def num_images_total(self):
        return sum(s.num_frames for s in self._scenes.values())

    def get_scene(self, name) -> SceneData:
        """Scene lookup: active split first, then the other split (human
        annotation YAMLs may name scenes from either split)."""
        if name in self._scenes:
            return self._scenes[name]
        for mode in ("train", "test"):
            reg = self._registry(mode)
            if name in reg["scenes"]:
                return reg["scenes"][name]
        raise KeyError(name)

    def get_random_scene_name(self) -> str:
        return self._rng.choice(sorted(self._scenes.keys()))

    def get_random_single_object_scene_name(self, object_id: str) -> str:
        return self._rng.choice(self._single_object_scene_names[object_id])

    def get_random_object_id(self) -> str:
        return self._rng.choice(sorted(self._single_object_scene_names.keys()))

    def get_two_different_object_ids(self):
        ids = sorted(self._single_object_scene_names.keys())
        assert len(ids) >= 2, "need >= 2 objects for DIFFERENT_OBJECT samples"
        a, b = self._rng.sample(ids, 2)
        return a, b

    def get_different_scene_for_object(self, object_id: str, scene_name: str) -> str:
        others = [s for s in self._single_object_scene_names[object_id] if s != scene_name]
        assert others, f"object {object_id} has only one scene"
        return self._rng.choice(others)

    def has_multi_object_scenes(self):
        return len(self._multi_object_scene_names) > 0

    def get_random_multi_object_scene_name(self) -> str:
        return self._rng.choice(self._multi_object_scene_names)

    # -- pair sampling -------------------------------------------------------------

    def get_random_image_index(self, scene_name: str) -> int:
        """Random frame's FILE index (reference
        dense_correspondence_dataset_masked.py: indices are pose_data.yaml
        keys, not array positions)."""
        scene = self._scenes[scene_name]
        return scene.frame_id(self._rng.randrange(scene.num_frames))

    def get_img_idx_with_different_pose(self, scene_name: str, pose_a, num_attempts: int = 50):
        """Rejection-sample a frame (returned as a file index) whose pose
        differs by > 0.2 m or > 20 deg
        (reference dense_correspondence_dataset_masked.py:260-287)."""
        scene = self._scenes[scene_name]
        for _ in range(num_attempts):
            idx = self.get_random_image_index(scene_name)
            pose_b = scene.poses[scene.position(idx)]
            if (
                pose_distance(pose_a, pose_b) > self.POSE_DIST_THRESHOLD
                or np.degrees(pose_angle(pose_a, pose_b)) > self.POSE_ANGLE_THRESHOLD
            ):
                return idx
        return None

    def _draw_match_type(self) -> int:
        types = sorted(self._data_type_probabilities.keys())
        weights = [self._data_type_probabilities[t] for t in types]
        return int(self._rng.choices(types, weights=weights, k=1)[0])

    def sample_pair(self, match_type: Optional[int] = None) -> SamplePair:
        """Draw one training pair according to the configured type mix.

        Mirrors ``SpartanDataset.__getitem__`` (spartan_dataset_masked.py:111-
        150): within-scene types pick two sufficiently-different views of one
        scene; across-scene/different-object types pick frames from two
        scenes. The geometric/index assembly happens on device afterwards.
        """
        if match_type is None:
            match_type = self._draw_match_type()

        if match_type == MATCH_TYPE_SYNTHETIC_MULTI_OBJECT:
            # two within-scene pairs of two different objects, composited on
            # device (reference get_synthetic_multi_object_within_scene_data,
            # spartan_dataset_masked.py:890-1053)
            try:
                oid_a, oid_b = self.get_two_different_object_ids()
            except AssertionError:
                oid_a = oid_b = self.get_random_object_id()
            scene_a = self.get_random_single_object_scene_name(oid_a)
            scene_b = self.get_random_single_object_scene_name(oid_b)
            p1 = self._within_scene_pair(scene_a, MATCH_TYPE_SYNTHETIC_MULTI_OBJECT)
            p2 = self._within_scene_pair(scene_b, MATCH_TYPE_SYNTHETIC_MULTI_OBJECT)
            if p1.match_type == -1 or p2.match_type == -1:
                return p1 if p1.match_type == -1 else p2
            p1.metadata.update(object_id_a=oid_a, object_id_b=oid_b,
                               scene_name_b=scene_b)
            return dataclasses.replace(p1, second=p2)

        if match_type in (
            MATCH_TYPE_SINGLE_OBJECT_WITHIN_SCENE,
            MATCH_TYPE_MULTI_OBJECT,
        ):
            if match_type == MATCH_TYPE_MULTI_OBJECT and self.has_multi_object_scenes():
                scene_name = self.get_random_multi_object_scene_name()
            else:
                scene_name = self.get_random_scene_name()
            return self._within_scene_pair(scene_name, match_type)

        if match_type == MATCH_TYPE_SINGLE_OBJECT_ACROSS_SCENE:
            object_id = self.get_random_object_id()
            scene_name_a = self.get_random_single_object_scene_name(object_id)
            try:
                scene_name_b = self.get_different_scene_for_object(object_id, scene_name_a)
            except AssertionError:
                scene_name_b = scene_name_a
            meta = {"object_id": object_id}
        elif match_type == MATCH_TYPE_DIFFERENT_OBJECT:
            oid_a, oid_b = self.get_two_different_object_ids()
            scene_name_a = self.get_random_single_object_scene_name(oid_a)
            scene_name_b = self.get_random_single_object_scene_name(oid_b)
            meta = {"object_id_a": oid_a, "object_id_b": oid_b}
        else:
            raise ValueError(f"unknown match_type {match_type}")

        scene_a = self._scenes[scene_name_a]
        scene_b = self._scenes[scene_name_b]
        idx_a = self.get_random_image_index(scene_name_a)
        idx_b = self.get_random_image_index(scene_name_b)
        meta.update({"scene_name_a": scene_name_a, "scene_name_b": scene_name_b,
                     "image_a_idx": idx_a, "image_b_idx": idx_b, "type": match_type})
        pa, pb = scene_a.position(idx_a), scene_b.position(idx_b)
        return SamplePair(
            match_type=match_type,
            rgb_a=scene_a.rgb[pa], depth_a=scene_a.depth[pa],
            mask_a=scene_a.mask[pa], pose_a=scene_a.poses[pa],
            rgb_b=scene_b.rgb[pb], depth_b=scene_b.depth[pb],
            mask_b=scene_b.mask[pb], pose_b=scene_b.poses[pb],
            K=scene_a.K,
            metadata=meta,
        )

    def _within_scene_pair(self, scene_name: str, match_type: int) -> SamplePair:
        """Two sufficiently-different views of one scene (or the empty
        sentinel when the pose-rejection sampler fails)."""
        scene = self._scenes[scene_name]
        idx_a = self.get_random_image_index(scene_name)
        pa = scene.position(idx_a)
        idx_b = self.get_img_idx_with_different_pose(scene_name, scene.poses[pa])
        if idx_b is None:
            # empty-data path (reference training.py:304-306): signalled by
            # match_type -1; the device assembler zeroes the loss.
            return self._empty_pair(scene, pa)
        pb = scene.position(idx_b)
        return SamplePair(
            match_type=match_type,
            rgb_a=scene.rgb[pa], depth_a=scene.depth[pa],
            mask_a=scene.mask[pa], pose_a=scene.poses[pa],
            rgb_b=scene.rgb[pb], depth_b=scene.depth[pb],
            mask_b=scene.mask[pb], pose_b=scene.poses[pb],
            K=scene.K,
            metadata={"scene_name": scene_name, "image_a_idx": idx_a,
                      "image_b_idx": idx_b, "type": match_type},
        )

    def _empty_pair(self, scene, pos_a):
        return SamplePair(
            match_type=-1,
            rgb_a=scene.rgb[pos_a], depth_a=scene.depth[pos_a],
            mask_a=scene.mask[pos_a], pose_a=scene.poses[pos_a],
            rgb_b=scene.rgb[pos_a], depth_b=scene.depth[pos_a],
            mask_b=scene.mask[pos_a], pose_b=scene.poses[pos_a],
            K=scene.K,
            metadata={"type": -1},
        )

    def make_host_batch(self, batch_size: int, with_second_pair: bool = None):
        """Stack ``batch_size`` sampled pairs into contiguous arrays ready for
        a single host->device transfer. When the type mix includes
        SYNTHETIC_MULTI_OBJECT (or ``with_second_pair``), ``*_2`` arrays
        carry each sample's second pair (self-paired for other types)."""
        pairs = [self.sample_pair() for _ in range(batch_size)]
        if with_second_pair is None:
            with_second_pair = MATCH_TYPE_SYNTHETIC_MULTI_OBJECT in self._data_type_probabilities
        batch = {
            "match_type": np.asarray([p.match_type for p in pairs], np.int32),
            "rgb_a": np.stack([p.rgb_a for p in pairs]),
            "depth_a": np.stack([p.depth_a for p in pairs]),
            "mask_a": np.stack([p.mask_a for p in pairs]),
            "pose_a": np.stack([p.pose_a for p in pairs]).astype(np.float32),
            "rgb_b": np.stack([p.rgb_b for p in pairs]),
            "depth_b": np.stack([p.depth_b for p in pairs]),
            "mask_b": np.stack([p.mask_b for p in pairs]),
            "pose_b": np.stack([p.pose_b for p in pairs]).astype(np.float32),
            "K": np.stack([p.K for p in pairs]).astype(np.float32),
        }
        if with_second_pair:
            seconds = [p.second if p.second is not None else p for p in pairs]
            batch.update({
                "rgb_a_2": np.stack([p.rgb_a for p in seconds]),
                "depth_a_2": np.stack([p.depth_a for p in seconds]),
                "mask_a_2": np.stack([p.mask_a for p in seconds]),
                "pose_a_2": np.stack([p.pose_a for p in seconds]).astype(np.float32),
                "rgb_b_2": np.stack([p.rgb_b for p in seconds]),
                "depth_b_2": np.stack([p.depth_b for p in seconds]),
                "mask_b_2": np.stack([p.mask_b for p in seconds]),
                "pose_b_2": np.stack([p.pose_b for p in seconds]).astype(np.float32),
                "K_2": np.stack([p.K for p in seconds]).astype(np.float32),
            })
        return batch

    # -- misc parity helpers -------------------------------------------------------

    def get_rgbd_mask_pose(self, scene_name: str, img_idx: int):
        """Frame lookup by the reference's image index (%06d file number /
        pose_data.yaml key — the convention of annotation YAMLs and every
        reference accessor), mapped to the in-memory array position."""
        s = self.get_scene(scene_name)
        p = s.position(img_idx)
        return s.rgb[p], s.depth[p], s.mask[p], s.poses[p]

    # thin accessors kept for reference-API parity
    # (spartan_dataset_masked.py:357-389, dense_correspondence_dataset_masked.py)

    def get_camera_intrinsics(self, scene_name: str):
        """K matrix wrapper (reference returns a CameraIntrinsics; the `.K`
        attribute is what call sites use)."""
        from pdc_tpu.geom.camera import CameraIntrinsics

        s = self.get_scene(scene_name)
        H, W = s.rgb.shape[1:3]
        K = np.asarray(s.K)
        return CameraIntrinsics(cx=K[0, 2], cy=K[1, 2], fx=K[0, 0], fy=K[1, 1],
                                width=W, height=H)

    def get_pose_from_scene_name_and_idx(self, scene_name: str, img_idx: int):
        s = self.get_scene(scene_name)
        return s.poses[s.position(img_idx)]

    def get_rgb_image_from_scene_name_and_idx(self, scene_name: str, img_idx: int):
        s = self.get_scene(scene_name)
        return s.rgb[s.position(img_idx)]

    def get_mask_image_from_scene_name_and_idx(self, scene_name: str, img_idx: int):
        s = self.get_scene(scene_name)
        return s.mask[s.position(img_idx)]

    def get_depth_image_from_scene_name_and_idx(self, scene_name: str, img_idx: int):
        s = self.get_scene(scene_name)
        return s.depth[s.position(img_idx)]

    def get_image_mean(self):
        from pdc_tpu.utils.constants import DEFAULT_IMAGE_MEAN

        return list(DEFAULT_IMAGE_MEAN)

    def get_image_std_dev(self):
        from pdc_tpu.utils.constants import DEFAULT_IMAGE_STD

        return list(DEFAULT_IMAGE_STD)

    def rgb_image_to_tensor(self, rgb):
        """uint8 [H,W,3] -> normalized float32 [H,W,3] (NHWC, unlike the
        reference's CHW ToTensor+Normalize)."""
        x = np.asarray(rgb, np.float32) / 255.0
        mean = np.asarray(self.get_image_mean(), np.float32)
        std = np.asarray(self.get_image_std_dev(), np.float32)
        return (x - mean) / std

    # -- reference-API convenience accessors ---------------------------------
    # Thin delegates keeping the names a reference user reaches for in
    # notebooks/scripts; each cites its reference definition.

    def scene_generator(self, mode=None):
        """Yield every scene name of a split — single-object scenes first,
        then multi-object (reference spartan_dataset_masked.py:244-258)."""
        reg = self._registry(mode or self.mode)
        for object_id in sorted(reg["single"].keys()):
            for scene_name in reg["single"][object_id]:
                yield scene_name
        for scene_name in reg["multi"]:
            yield scene_name

    def get_scene_list(self, mode=None):
        """All scene names of a split (spartan_dataset_masked.py:260-272)."""
        return list(self.scene_generator(mode=mode))

    def get_list_of_objects(self):
        """Object ids with single-object scenes
        (spartan_dataset_masked.py:274-281)."""
        return sorted(self._registry(self.mode)["single"].keys())

    def get_scene_list_for_object(self, object_id: str, mode=None):
        """Scene names for one object in a split
        (spartan_dataset_masked.py:283-297)."""
        return list(self._registry(mode or self.mode)["single"][object_id])

    def get_full_path_for_scene(self, scene_name: str) -> str:
        """Path to the scene's ``processed/`` folder
        (spartan_dataset_masked.py:306-314). Only meaningful for scenes
        loaded from disk."""
        s = self.get_scene(scene_name)
        if s.structure is None:
            raise ValueError(
                f"scene {scene_name} is in-memory (synthetic); it has no "
                "on-disk processed folder")
        return s.structure.processed_folder

    def get_image_filename(self, scene_name: str, img_idx: int, image_type: int) -> str:
        """Full path of one frame's RGB/depth/mask PNG
        (dense_correspondence_dataset_masked.py:300-330 + ImageType)."""
        s = self.get_scene(scene_name)
        if s.structure is None:
            raise ValueError(f"scene {scene_name} has no on-disk files")
        if image_type == ImageType.RGB:
            return s.structure.rgb_image_filename(img_idx)
        if image_type == ImageType.DEPTH:
            return s.structure.depth_image_filename(img_idx)
        if image_type == ImageType.MASK:
            return s.structure.mask_image_filename(img_idx)
        raise ValueError(f"unknown image_type {image_type}")

    def get_first_image_index(self, scene_name: str) -> int:
        """Smallest on-disk frame index of a scene
        (spartan_dataset_masked.py:1186-1192 — indices need not start at 0)."""
        return int(self.get_scene(scene_name).file_indices[0])

    def get_random_rgbd_mask_pose(self):
        """(rgb, depth, mask, pose) of a random frame of a random scene
        (dense_correspondence_dataset_masked.py:246-258; used by descriptor
        statistics and the qualitative flows)."""
        scene_name = self.get_random_scene_name()
        idx = self.get_random_image_index(scene_name)
        return self.get_rgbd_mask_pose(scene_name, idx)

    def load_all_pose_data(self):
        """No-op kept for API parity: poses are always preloaded at scene
        construction (the reference hoists pose YAML loads out of DataLoader
        workers for thread-safety, spartan_dataset_masked.py:317-342; pdc_tpu
        has no worker processes to protect)."""

    @staticmethod
    def flatten_uv_tensor(uv_tensor, image_width: int):
        """(u, v) -> flat ``v * W + u`` indices
        (spartan_dataset_masked.py:1255-1264)."""
        u, v = uv_tensor
        return np.asarray(v) * image_width + np.asarray(u)

    @staticmethod
    def mask_image_from_uv_flat_tensor(uv_flat_tensor, image_width: int,
                                       image_height: int):
        """[W*H] 0/1 vector with ones at the given flat pixel indices
        (spartan_dataset_masked.py:1266-1283)."""
        img = np.zeros(image_width * image_height, np.int64)
        img[np.asarray(uv_flat_tensor, np.int64)] = 1
        return img

    @staticmethod
    def make_synthetic(num_scenes: int = 2, num_objects: int = 2,
                       num_test_scenes: int = 0, seed_offset: int = 0,
                       **scene_kwargs):
        """Build a fully in-memory synthetic dataset (tests, benchmarks).

        Scenes of the same object share a texture (so across-scene
        same-object attraction is learnable); different objects get distinct
        textures (so different-object repulsion is learnable).

        With ``num_test_scenes`` > 0 the dataset gets a real train/test split
        (test scenes use held-out camera-orbit seeds of the same objects);
        otherwise both modes share the scenes. ``seed_offset`` shifts every
        scene seed (textures/objects unchanged) — two datasets with
        different offsets are held-out scene sets of the SAME objects, the
        shape an isolated-vs-cluttered or cross-scene evaluation needs. The
        generator arguments are recorded in ``self.config`` so the
        trainer's ``dataset.yaml`` snapshot can reconstruct the dataset
        (reference evaluation.py:2352-2354)."""
        from pdc_tpu.data.synthetic import SyntheticScene

        ds = SpartanDataset()
        ds.config = {"synthetic": dict(num_scenes=num_scenes,
                                       num_objects=num_objects,
                                       num_test_scenes=num_test_scenes,
                                       seed_offset=seed_offset,
                                       **scene_kwargs)}
        for i in range(num_scenes):
            obj = i % max(num_objects, 1)
            sc = SyntheticScene(seed=seed_offset + i, texture_seed=obj,
                                **scene_kwargs)
            modes = ("train",) if num_test_scenes > 0 else ("train", "test")
            ds.add_scene(SceneData.from_synthetic(sc, name=f"scene_{i:03d}",
                                                  object_id=f"object_{obj}"),
                         modes=modes)
        for j in range(num_test_scenes):
            obj = j % max(num_objects, 1)
            sc = SyntheticScene(seed=1000 + seed_offset + j,
                                texture_seed=obj, **scene_kwargs)
            ds.add_scene(SceneData.from_synthetic(sc, name=f"test_scene_{j:03d}",
                                                  object_id=f"object_{obj}"),
                         modes=("test",))
        return ds

    @staticmethod
    def from_dataset_config(config: dict, mode: str = "train",
                            data_dir=None, config_dir=None):
        """Reconstruct a dataset from a ``dataset.yaml`` snapshot saved in a
        model folder (reference evaluation.py:139-141 + :2352-2354): either
        the composite-scene-list format or the synthetic-generator record."""
        if config and "synthetic" in config:
            ds = SpartanDataset.make_synthetic(**config["synthetic"])
            ds.mode = mode
            return ds
        config = dict(config or {})
        data_dir = data_dir or config.pop("data_dir", None)
        config_dir = config_dir or config.pop("config_dir", None)
        return SpartanDataset(config=config, mode=mode,
                              data_dir=data_dir, config_dir=config_dir)
