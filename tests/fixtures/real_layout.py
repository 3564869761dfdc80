"""Miniature scene trees in the PUBLISHED pdc on-disk layout.

The published dataset (reference ``doc/data_organization.md``) has quirks the
hand-made synthetic fixtures never exercised:

* frame files are DOWNSAMPLED — %06d indices are non-contiguous and do not
  start at 0 (``000003_rgb.png``, ``000020_rgb.png``, ...);
* ``pose_data.yaml`` can hold MORE keys than there are files on disk
  (poses were logged for frames the downsampler later dropped);
* ``camera_info.yaml`` is the full spartan/ROS calibration variant
  (distortion + rectification + projection blocks around the
  ``camera_matrix``), not just the 3x3;
* ``images/`` also carries the registered RAW depth (``%06d_depth.png``)
  while training consumes ``rendered_images/%06d_depth.png``; masks come
  with human-readable ``_visible_mask`` twins and rendered depth with
  ``_depth_cropped`` twins;
* each log has a ``raw/fusion_<log>.bag`` sibling next to ``processed/``.

``write_miniature_scene`` writes all of that around real (synthetic-rendered)
frames, so loaders must navigate the quirks, not a sanitized layout.
"""

import os

import numpy as np


def write_miniature_scene(processed_dir, num_frames=4, width=64, height=48,
                          seed=0, first_index=3, stride=17,
                          orphan_pose_keys=(1, 29)):
    """Write one published-layout scene log under ``processed_dir``.

    Frames are rendered by :class:`pdc_tpu.data.synthetic.SyntheticScene`
    (so correspondences are geometrically real) but laid out with the
    published dataset's quirks. ``orphan_pose_keys`` are extra
    ``pose_data.yaml`` entries with no files on disk — loaders must drop
    them. Returns the sorted on-disk %06d file indices.
    """
    from PIL import Image

    from pdc_tpu.data.synthetic import SyntheticScene
    from pdc_tpu.geom.transforms import dict_from_se3
    from pdc_tpu.utils.yaml_io import save_yaml

    scene = SyntheticScene(width=width, height=height, num_frames=num_frames,
                           seed=seed)

    img_dir = os.path.join(processed_dir, "images")
    rendered_dir = os.path.join(processed_dir, "rendered_images")
    mask_dir = os.path.join(processed_dir, "image_masks")
    for d in (img_dir, rendered_dir, mask_dir):
        os.makedirs(d, exist_ok=True)
    # raw/ sibling with the redundant-date rosbag stub
    log_name = os.path.basename(os.path.dirname(processed_dir.rstrip(os.sep)))
    raw_dir = os.path.join(os.path.dirname(processed_dir.rstrip(os.sep)), "raw")
    os.makedirs(raw_dir, exist_ok=True)
    with open(os.path.join(raw_dir, f"fusion_{log_name}.bag"), "wb") as f:
        f.write(b"\x00miniature-fixture: not a real rosbag\n")

    file_indices = [first_index + i * stride for i in range(num_frames)]
    pose_data = {}
    for pos, idx in enumerate(file_indices):
        rgb, depth, mask, pose = scene.render(pos)
        Image.fromarray(rgb).save(os.path.join(img_dir, "%06d_rgb.png" % idx))
        # registered raw depth lives in images/; training reads rendered_images/
        Image.fromarray(depth).save(
            os.path.join(img_dir, "%06d_depth.png" % idx))
        Image.fromarray(depth).save(
            os.path.join(rendered_dir, "%06d_depth.png" % idx))
        Image.fromarray(depth).save(
            os.path.join(rendered_dir, "%06d_depth_cropped.png" % idx))
        Image.fromarray(mask * 255).save(
            os.path.join(mask_dir, "%06d_mask.png" % idx))
        visible = rgb.copy()
        visible[mask == 0] = 255
        Image.fromarray(visible).save(
            os.path.join(mask_dir, "%06d_visible_mask.png" % idx))
        pose_data[idx] = {
            "camera_to_world": dict_from_se3(pose),
            "timestamp": 1523374000.0 + 0.033 * idx,
            "rgb_image_filename": "%06d_rgb.png" % idx,
            "depth_image_filename": "%06d_depth.png" % idx,
        }

    # orphan pose entries: logged poses whose frames the downsampler dropped
    for k in orphan_pose_keys:
        if k in pose_data:
            continue
        pose_data[k] = {
            "camera_to_world": dict_from_se3(np.eye(4)),
            "timestamp": 1523374000.0 + 0.033 * k,
            "rgb_image_filename": "%06d_rgb.png" % k,
            "depth_image_filename": "%06d_depth.png" % k,
        }
    save_yaml(pose_data, os.path.join(img_dir, "pose_data.yaml"))

    # full spartan/ROS calibration variant around the camera_matrix
    intr = scene.intrinsics
    save_yaml(
        {
            "camera_matrix": {
                "rows": 3, "cols": 3,
                "data": [intr.fx, 0.0, intr.cx,
                         0.0, intr.fy, intr.cy,
                         0.0, 0.0, 1.0],
            },
            "distortion_model": "plumb_bob",
            "distortion_coefficients": {
                "rows": 1, "cols": 5, "data": [0.0, 0.0, 0.0, 0.0, 0.0]},
            "rectification_matrix": {
                "rows": 3, "cols": 3,
                "data": [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]},
            "projection_matrix": {
                "rows": 3, "cols": 4,
                "data": [intr.fx, 0.0, intr.cx, 0.0,
                         0.0, intr.fy, intr.cy, 0.0,
                         0.0, 0.0, 1.0, 0.0]},
            "image_width": width,
            "image_height": height,
            "camera_name": "camera_carmine_1",
        },
        os.path.join(img_dir, "camera_info.yaml"),
    )
    scene.write_fusion_mesh(processed_dir)
    return file_indices
