"""Change-detection mask generation — GL-free.

Rebuild of ``modules/.../change_detection/change_detection.py:75-455``: for
every frame of a scene log, generate the object mask by rendering the scene
geometry with and without the cropped foreground object and comparing depths.
The reference drives two VTK render windows through ``director``; here the
renders come from the JAX point-splat z-buffer (:mod:`pdc_tpu.pipeline.renderer`)
over (a) the crop-box-filtered foreground points and (b) the full/background
points, so the whole preprocessing pipeline runs on any host with a TPU/CPU
and zero OpenGL.

Mask rules (reference :274-329):
  * depth-pair strategy: foreground if the foreground render is closer than
    the background render by > threshold
  * crop strategy: foreground wherever the cropped-geometry render returns
    any depth at all
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from pdc_tpu.pipeline.renderer import mesh_vertices_from_ply, render_depth_from_points
from pdc_tpu.utils.constants import DEPTH_IM_SCALE


def compute_foreground_mask_from_depth_image_pair(depth_f, depth_b, threshold: float):
    """Foreground = pixels where the foreground render is closer by more than
    ``threshold`` metres (reference computeForegroundMaskFromDepthImagePair,
    change_detection.py:314-329; float math avoids its uint16-wraparound
    caveat).

    :param depth_f: [H, W] foreground-scene depth (0 = no return)
    :param depth_b: [H, W] background-scene depth
    :return: [H, W] uint8 mask
    """
    depth_f = np.asarray(depth_f, np.float64)
    depth_b = np.asarray(depth_b, np.float64)
    has_f = depth_f > 0
    far_b = np.where(depth_b > 0, depth_b, np.inf)
    mask = has_f & ((far_b - depth_f) > threshold)
    return mask.astype(np.uint8)


def compute_foreground_mask_using_crop_strategy(depth_cropped):
    """Foreground = anything the cropped geometry renders
    (reference :274-312)."""
    return (np.asarray(depth_cropped) > 0).astype(np.uint8)


@dataclasses.dataclass
class CropBox:
    """Axis-aligned world-frame crop box isolating the object on the table
    (the reference reads this from the station config YAMLs)."""

    min_pt: tuple
    max_pt: tuple

    def contains(self, points):
        p = np.asarray(points)
        lo = np.asarray(self.min_pt)
        hi = np.asarray(self.max_pt)
        return np.all((p >= lo) & (p <= hi), axis=1)

    def filter(self, points):
        p = np.asarray(points)
        return p[self.contains(p)]


@dataclasses.dataclass
class OrientedCropBox:
    """Posed crop box matching the station-config format
    (``config/stations/*/change_detection.yaml``: a center transform
    (quaternion + translation) plus x/y/z dimensions — what the reference's
    ``ReconstructionProcessing.spawnCropBox`` spawns,
    mesh_processing.py:37-52)."""

    transform: np.ndarray  # [4, 4] box-to-world
    dimensions: tuple      # (x, y, z) full extents

    def contains(self, points):
        from pdc_tpu.geom.transforms import invert_se3, transform_points

        p = np.asarray(points, np.float64)
        local = np.asarray(transform_points(
            invert_se3(np.asarray(self.transform, np.float64)), p))
        half = np.asarray(self.dimensions, np.float64) / 2.0
        return np.all(np.abs(local) <= half, axis=1)

    def filter(self, points):
        p = np.asarray(points)
        return p[self.contains(points)]

    @staticmethod
    def from_station_config(config: dict) -> "OrientedCropBox":
        """Parse the reference's station YAML ``crop_box`` block."""
        from pdc_tpu.geom.transforms import se3_from_quat_trans

        cb = config["crop_box"]
        q = cb["transform"]["quaternion"]
        t = cb["transform"]["translation"]
        T = se3_from_quat_trans(
            [q["w"], q["x"], q["y"], q["z"]], [t["x"], t["y"], t["z"]])
        dims = (cb["dimensions"]["x"], cb["dimensions"]["y"],
                cb["dimensions"]["z"])
        return OrientedCropBox(transform=np.asarray(T), dimensions=dims)

    def to_station_config(self) -> dict:
        """Emit the station-YAML crop_box block (the authoring counterpart of
        the reference's ``getCropBoxFrame`` printout, mesh_processing.py:54-57)."""
        from pdc_tpu.geom.transforms import quaternion_from_matrix

        w, x, y, z = np.asarray(
            quaternion_from_matrix(self.transform[:3, :3]), np.float64)
        tx, ty, tz = np.asarray(self.transform[:3, 3], np.float64)
        return {
            "crop_box": {
                "transform": {
                    "quaternion": {"w": float(w), "x": float(x),
                                   "y": float(y), "z": float(z)},
                    "translation": {"x": float(tx), "y": float(ty),
                                    "z": float(tz)},
                },
                "dimensions": {"x": float(self.dimensions[0]),
                               "y": float(self.dimensions[1]),
                               "z": float(self.dimensions[2])},
            }
        }


def fit_crop_box(points, table_quantile: float = 0.1, above_table: float = 0.01,
                 bound_quantile: float = 0.01, margin: float = 0.05):
    """Author a crop box from scene geometry — the headless replacement for
    the reference's drag-a-cube-in-director flow (mesh_processing.py:32-108):
    estimate the dominant horizontal surface, take the point cluster above
    it, and fit an axis-aligned box with a margin.

    :param points: [N, 3] world-frame scene points (e.g. fusion-mesh vertices)
    :param table_quantile: z-quantile treated as the table surface (the
        table is the lowest large surface of a tabletop scan, so a low
        quantile lands on it even when the object has more points)
    :param above_table: metres above the surface a point must be to count as
        object
    :param bound_quantile: robust min/max quantile for the box bounds
    :return: OrientedCropBox (identity rotation), in the station-config
        convention
    """
    p = np.asarray(points, np.float64)
    z_table = np.quantile(p[:, 2], table_quantile)
    obj = p[p[:, 2] > z_table + above_table]
    if obj.shape[0] < 10:
        raise ValueError(
            "no points above the estimated table surface; pass a crop box "
            f"explicitly (z_table={z_table:.3f})")
    lo = np.quantile(obj, bound_quantile, axis=0) - margin
    hi = np.quantile(obj, 1.0 - bound_quantile, axis=0) + margin
    lo[2] = z_table + above_table / 2.0  # box floor sits on the table
    center = (lo + hi) / 2.0
    dims = hi - lo
    T = np.eye(4)
    T[:3, 3] = center
    return OrientedCropBox(transform=T, dimensions=tuple(dims))


class ChangeDetection:
    """Per-scene mask/depth generation pipeline (reference ChangeDetection)."""

    def __init__(self, points_world: np.ndarray, K: np.ndarray,
                 image_height: int, image_width: int,
                 crop_box: Optional[CropBox] = None,
                 background_points: Optional[np.ndarray] = None,
                 depth_threshold: float = 0.01, splat_radius: int = 1,
                 faces: Optional[np.ndarray] = None,
                 background_faces: Optional[np.ndarray] = None,
                 raster_tile: Optional[int] = None):
        """
        :param points_world: scene geometry as world-frame points (TSDF mesh
            vertices)
        :param faces: optional [F, 3] triangles over ``points_world`` —
            renders go through the triangle rasterizer (hole-free, like the
            reference's VTK mesh rendering) instead of point splats
        :param background_points: geometry of the background-only scene; if
            None, the crop strategy is used
        :param raster_tile: per-triangle rasterization block size; None
            (default) bins faces by projected extent and renders each bin at
            the smallest covering power-of-two tile (several times fewer
            z-buffer updates than one blanket tile; warns if faces exceed
            the maximum tile — renderer.bin_faces_by_extent)
        """
        self.points = np.asarray(points_world, np.float32)
        self.faces = None if faces is None else np.asarray(faces, np.int32)
        self.K = np.asarray(K, np.float32)
        self.H, self.W = image_height, image_width
        self.crop_box = crop_box
        self.background_points = (
            None if background_points is None
            else np.asarray(background_points, np.float32)
        )
        self.background_faces = (
            None if background_faces is None
            else np.asarray(background_faces, np.int32)
        )
        self.depth_threshold = depth_threshold
        self.splat_radius = splat_radius
        self.raster_tile = raster_tile
        self.set_crop_box(crop_box)

    def set_crop_box(self, crop_box: Optional[CropBox]):
        """(Re)apply the foreground crop — keeps the point and face views
        consistent (callers must not poke ``_fg_points`` directly)."""
        self.crop_box = crop_box
        if crop_box is None:
            self._fg_points, self._fg_faces = self.points, self.faces
        elif self.faces is None:
            self._fg_points, self._fg_faces = crop_box.filter(self.points), None
        else:
            # keep all vertices (face indices stay valid); crop by FACES
            # with any vertex inside the box — VTK's crop clips triangles at
            # the boundary, so keeping boundary-straddling faces (slight
            # dilation) is closer than dropping them (a ring of erosion)
            inside = crop_box.contains(self.points)
            self._fg_points = self.points
            self._fg_faces = self.faces[np.any(inside[self.faces], axis=1)]

    @staticmethod
    def from_data_folder(processed_folder: str, crop_box: Optional[CropBox] = None,
                         **kwargs):
        """Load geometry + intrinsics from a processed scene folder
        (reference from_data_folder, change_detection.py:487). Faces in
        fusion_mesh.ply enable triangle rasterization automatically."""
        from pdc_tpu.data.scene import SceneStructure
        from pdc_tpu.pipeline.renderer import read_ply_mesh

        structure = SceneStructure(processed_folder)
        points, faces = read_ply_mesh(structure.fusion_mesh_filename)
        intr = structure.load_camera_intrinsics()
        return ChangeDetection(
            points, intr.K, intr.height, intr.width, crop_box=crop_box,
            faces=faces, **kwargs
        ), structure

    # -- per-frame ----------------------------------------------------------------

    def render_depth(self, camera_to_world, points=None, faces=None):
        pts = self.points if points is None else points
        if points is None and faces is None:
            faces = self.faces
        if faces is not None:
            from pdc_tpu.pipeline.renderer import (
                pick_raster_tile,
                render_depth_from_mesh,
            )

            # per-frame API: the static-shape scatter path compiles once per
            # tile value; the sort-based renderer's per-pose face bins would
            # change shapes (and recompile) on every call — reserved for the
            # whole-scene batched path (_render_depth_many)
            tile = self.raster_tile
            if tile is None:
                tile = pick_raster_tile(pts, faces, camera_to_world, self.K,
                                        self.H, self.W)
            d = render_depth_from_mesh(
                jnp.asarray(pts), jnp.asarray(faces),
                jnp.asarray(camera_to_world, jnp.float32),
                jnp.asarray(self.K), self.H, self.W,
                tile=tile,
            )
        else:
            d = render_depth_from_points(
                jnp.asarray(pts), jnp.asarray(camera_to_world, jnp.float32),
                jnp.asarray(self.K), self.H, self.W,
                splat_radius=self.splat_radius,
            )
        return np.asarray(d)

    def _render_depth_many(self, poses, points, faces):
        """All poses in one dispatch ([P, H, W]); per-frame dispatch +
        fetch round trips dominate wall time on a remote TPU runtime."""
        from pdc_tpu.pipeline.renderer import (
            render_depth_from_mesh_many,
            render_depth_from_points_many,
        )

        poses = np.asarray(poses, np.float32)
        if faces is not None:
            if self.raster_tile is None:
                from pdc_tpu.pipeline.renderer import (
                    render_depth_from_mesh_sorted_many)

                return np.asarray(render_depth_from_mesh_sorted_many(
                    points, faces, poses, self.K, self.H, self.W))
            d = render_depth_from_mesh_many(
                jnp.asarray(points), jnp.asarray(faces), jnp.asarray(poses),
                jnp.asarray(self.K), self.H, self.W,
                tile=self.raster_tile)
        else:
            d = render_depth_from_points_many(
                jnp.asarray(points), jnp.asarray(poses), jnp.asarray(self.K),
                self.H, self.W, splat_radius=self.splat_radius)
        return np.asarray(d)

    def compute_mask(self, camera_to_world):
        mask, depth_fg = self.compute_masks(
            np.asarray(camera_to_world, np.float32)[None])
        return mask[0], depth_fg[0]

    def compute_masks(self, poses):
        """Masks + foreground depth for a stack of poses, batched on device.

        :param poses: [P, 4, 4]
        :return: (masks [P, H, W] uint8, depth_fg [P, H, W] float32)
        """
        depth_fg = self._render_depth_many(poses, self._fg_points,
                                           self._fg_faces)
        if self.background_points is None:
            masks = np.stack([
                compute_foreground_mask_using_crop_strategy(d)
                for d in depth_fg])
            return masks, depth_fg
        depth_bg = self._render_depth_many(poses, self.background_points,
                                           self.background_faces)
        masks = np.stack([
            compute_foreground_mask_from_depth_image_pair(
                f, b, self.depth_threshold)
            for f, b in zip(depth_fg, depth_bg)])
        return masks, depth_fg

    # -- whole-scene batch (reference run(), :336-408) -------------------------------

    def run(self, structure, pose_map=None, save: bool = True):
        """Write %06d_mask.png + %06d_depth_cropped.png for every frame
        (writes go through the parallel native PNG encoder pool)."""
        from pdc_tpu.data.native_loader import (
            KIND_ENC_GRAY8, KIND_ENC_GRAY16, encode_batch)

        if pose_map is None:
            pose_map = structure.load_pose_data()
        os.makedirs(structure.masks_dir, exist_ok=True)
        os.makedirs(structure.rendered_images_dir, exist_ok=True)
        indices = sorted(pose_map.keys())
        masks, depths_fg = self.compute_masks(
            np.stack([pose_map[i] for i in indices]))
        writes = []
        if save:
            for idx, mask, depth_fg in zip(indices, masks, depths_fg):
                writes.append((
                    os.path.join(structure.masks_dir, "%06d_mask.png" % idx),
                    KIND_ENC_GRAY8, (mask * 255).astype(np.uint8)))
                depth_mm = np.clip(depth_fg * DEPTH_IM_SCALE, 0, 65535).astype(np.uint16)
                writes.append((
                    os.path.join(structure.rendered_images_dir,
                                 "%06d_depth_cropped.png" % idx),
                    KIND_ENC_GRAY16, depth_mm))
        if writes:
            encode_batch(writes, self.H, self.W)
        return len(pose_map)

    def process_scene(self, structure, pose_map=None, save: bool = True,
                      render_full_depth: bool = True):
        """Fused whole-scene pass: masks + cropped depth + full depth come
        back from ONE device dispatch with the on-disk encodings (uint8 /
        uint16 mm) already applied on device — see
        :func:`pdc_tpu.pipeline.renderer.render_scene_products`. Identical
        outputs to :meth:`run` + :meth:`render_depth_images` (the crop
        strategy's mask is ``depth_cropped > 0`` either way); those stay for
        the pair-strategy (background mesh) and point-splat cases, which
        this method falls back to.

        :return: number of frames written
        """
        handle = self.process_scene_start(structure, pose_map=pose_map,
                                          render_full_depth=render_full_depth)
        if handle is None or handle is self.OVER_BUDGET:
            return self.process_scene_two_pass(
                structure, pose_map=pose_map, save=save,
                render_full_depth=render_full_depth)
        return self.process_scene_finish(handle, save=save)

    def process_scene_two_pass(self, structure, pose_map=None,
                               save: bool = True,
                               render_full_depth: bool = True):
        """The chunk-bounded fallback (:meth:`run` +
        :meth:`render_depth_images`) as one call, so a caller that already
        learned the fused path is unusable (``process_scene_start``
        returning None / OVER_BUDGET) can skip straight here — exactly the
        heaviest scenes used to pay ``process_scene_start``'s full per-pose
        host prep twice via the ``process_scene`` re-entry."""
        n = self.run(structure, pose_map=pose_map, save=save)
        if render_full_depth:
            self.render_depth_images(structure, pose_map=pose_map,
                                     save=save)
        return n

    # over-budget marker: the fused render's host prep RAN but the fragment
    # count exceeded the budget — callers go straight to the two-pass flow
    # instead of re-entering process_scene (which would repeat the prep)
    OVER_BUDGET = "over_budget"

    def process_scene_start(self, structure, pose_map=None,
                            render_full_depth: bool = True):
        """Async half of :meth:`process_scene`: host prep + device DISPATCH
        (no fetch — jax dispatch is asynchronous). Returns a handle for
        :meth:`process_scene_finish`; or None when the scene structurally
        needs the two-pass fallback (no faces / pair strategy / forced
        tile); or :attr:`OVER_BUDGET` when the fused render's fragment
        count exceeds the budget — in both fallback cases the caller should
        use :meth:`process_scene_two_pass` (NOT :meth:`process_scene`,
        which would repeat the per-pose host prep). The all-logs driver
        overlaps scene i+1's host work with scene i's device render +
        transfer this way."""
        if (self.faces is None or self.background_points is not None
                or self.raster_tile is not None):
            return None
        from pdc_tpu.pipeline.renderer import render_scene_products_start

        if pose_map is None:
            pose_map = structure.load_pose_data()
        indices = sorted(pose_map.keys())
        poses = np.stack([pose_map[i] for i in indices])
        # full render reuses the fg render when nothing was cropped away
        full_faces = (self._fg_faces if not render_full_depth
                      else self.faces)
        out = render_scene_products_start(
            self.points, self._fg_faces, full_faces, poses, self.K,
            self.H, self.W, DEPTH_IM_SCALE)
        if out is None:  # over the fragment budget -> two-pass fallback
            return self.OVER_BUDGET
        return {"out": out, "indices": indices, "structure": structure,
                "render_full_depth": render_full_depth}

    def process_scene_finish(self, handle, save: bool = True):
        """Blocking half: fetch the packed buffer, unpack, write PNGs."""
        from pdc_tpu.data.native_loader import (
            KIND_ENC_GRAY8, KIND_ENC_GRAY16, encode_batch)
        from pdc_tpu.pipeline.renderer import unpack_scene_products

        structure = handle["structure"]
        indices = handle["indices"]
        render_full_depth = handle["render_full_depth"]
        os.makedirs(structure.masks_dir, exist_ok=True)
        os.makedirs(structure.rendered_images_dir, exist_ok=True)
        masks, depth_crop_mm, depth_full_mm = unpack_scene_products(
            handle["out"], self.H, self.W)
        writes = []
        if save:
            for k, idx in enumerate(indices):
                writes.append((
                    os.path.join(structure.masks_dir, "%06d_mask.png" % idx),
                    KIND_ENC_GRAY8, (masks[k] * 255).astype(np.uint8)))
                writes.append((
                    os.path.join(structure.rendered_images_dir,
                                 "%06d_depth_cropped.png" % idx),
                    KIND_ENC_GRAY16, depth_crop_mm[k]))
                if render_full_depth:
                    writes.append((
                        os.path.join(structure.rendered_images_dir,
                                     "%06d_depth.png" % idx),
                        KIND_ENC_GRAY16, depth_full_mm[k]))
        if writes:
            encode_batch(writes, self.H, self.W)
        return len(indices)

    def render_depth_images(self, structure, pose_map=None, save: bool = True):
        """Full-scene depth re-rendering (reference render_depth_images,
        :410-454) -> %06d_depth.png (parallel native PNG writes)."""
        from pdc_tpu.data.native_loader import KIND_ENC_GRAY16, encode_batch

        if pose_map is None:
            pose_map = structure.load_pose_data()
        os.makedirs(structure.rendered_images_dir, exist_ok=True)
        indices = sorted(pose_map.keys())
        depths = self._render_depth_many(
            np.stack([pose_map[i] for i in indices]), self.points, self.faces)
        writes = []
        if save:
            for idx, depth in zip(indices, depths):
                depth_mm = np.clip(depth * DEPTH_IM_SCALE, 0, 65535).astype(np.uint16)
                writes.append((
                    os.path.join(structure.rendered_images_dir, "%06d_depth.png" % idx),
                    KIND_ENC_GRAY16, depth_mm,
                ))
        if writes:
            encode_batch(writes, self.H, self.W)
        return len(pose_map)
