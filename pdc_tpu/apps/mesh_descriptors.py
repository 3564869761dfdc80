"""Per-vertex mesh descriptors.

The reference stores per-network mesh-descriptor ``.npz`` files alongside
each scene (``scene_structure.py:100-124`` path schema; consumed by the
mesh-coloring app whose compute module is missing from the reference
snapshot). This tool computes them TPU-style: project every mesh vertex into
each frame, check visibility against the rendered depth, and average the
descriptors sampled from the frames that see the vertex — all as batched
jitted programs.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from pdc_tpu.geom.transforms import invert_se3, transform_points
from pdc_tpu.utils.constants import DEPTH_IM_SCALE, OCCLUSION_MARGIN


@jax.jit
def _accumulate_frame(points_world, cam_to_world, K, depth, res):
    """One frame's contribution: per-vertex (descriptor sum, weight)."""
    H, W = depth.shape
    world_to_cam = invert_se3(jnp.asarray(cam_to_world, jnp.float32))
    pts_cam = transform_points(world_to_cam, points_world)
    z = pts_cam[:, 2]
    proj = pts_cam @ jnp.asarray(K, jnp.float32).T
    denom = jnp.where(jnp.abs(proj[:, 2]) < 1e-9, 1e-9, proj[:, 2])
    u = proj[:, 0] / denom
    v = proj[:, 1] / denom

    ui = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
    vi = jnp.clip(jnp.round(v).astype(jnp.int32), 0, H - 1)
    in_fov = (z > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)

    d = jnp.asarray(depth, jnp.float32)
    if not jnp.issubdtype(jnp.asarray(depth).dtype, jnp.floating):
        d = d / DEPTH_IM_SCALE
    d_at = d[vi, ui]
    visible = in_fov & (d_at > 0) & (d_at >= z - 2 * OCCLUSION_MARGIN)

    des = res[vi, ui, :]  # [N, D]
    w = visible.astype(jnp.float32)
    return des * w[:, None], w


def compute_mesh_descriptors(dcn, scene, points_world, frame_indices=None):
    """Average descriptor per mesh vertex over the frames that see it.

    :param scene: :class:`pdc_tpu.data.dataset.SceneData`
    :param points_world: [N, 3] mesh vertices (world frame)
    :return: dict with 'vertices' [N,3], 'descriptors' [N,D],
        'num_observations' [N]
    """
    pts = jnp.asarray(points_world, jnp.float32)
    if frame_indices is None:
        frame_indices = scene.file_indices
    D = dcn.descriptor_dimension
    acc = jnp.zeros((pts.shape[0], D))
    wsum = jnp.zeros((pts.shape[0],))
    for idx in frame_indices:
        i = scene.position(int(idx))  # frame_indices are %06d file ids
        res = dcn.forward_on_img(scene.rgb[i])
        s, w = _accumulate_frame(
            pts, jnp.asarray(scene.poses[i], jnp.float32),
            jnp.asarray(scene.K, jnp.float32), jnp.asarray(scene.depth[i]), res,
        )
        acc = acc + s
        wsum = wsum + w
    descriptors = np.asarray(acc) / np.maximum(np.asarray(wsum)[:, None], 1.0)
    return {
        "vertices": np.asarray(points_world),
        "descriptors": descriptors,
        "num_observations": np.asarray(wsum),
    }


def save_mesh_descriptors(result: dict, structure, network_name: str):
    """Write the per-network mesh-descriptor npz at the SceneStructure path."""
    out = os.path.join(
        structure.processed_folder, "mesh_descriptors",
        network_name, "mesh_descriptors.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, **result)
    return out
