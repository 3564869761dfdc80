"""Fusion reconstruction + PLY reader tests."""

import os

import numpy as np

from pdc_tpu.data.synthetic import SyntheticScene
from pdc_tpu.pipeline.change_detection import CropBox
from pdc_tpu.pipeline.fusion_reconstruction import CameraPoses, TSDFReconstruction
from pdc_tpu.pipeline.renderer import mesh_vertices_from_ply


def _write_ascii_ply(path, pts):
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for p in pts:
            f.write(f"{p[0]} {p[1]} {p[2]}\n")


def _write_binary_ply(path, pts):
    import struct

    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {len(pts)}\n".encode())
        f.write(b"property float x\nproperty float y\nproperty float z\n")
        f.write(b"end_header\n")
        for p in pts:
            f.write(struct.pack("<fff", *p))


def test_ply_reader_ascii(tmp_path):
    pts = np.array([[0.0, 1.0, 2.0], [3.5, -1.0, 0.25]])
    path = os.path.join(tmp_path, "m.ply")
    _write_ascii_ply(path, pts)
    out = mesh_vertices_from_ply(path)
    np.testing.assert_allclose(out, pts, rtol=1e-6)


def test_ply_reader_binary(tmp_path):
    pts = np.array([[0.0, 1.0, 2.0], [3.5, -1.0, 0.25]], np.float32)
    path = os.path.join(tmp_path, "m.ply")
    _write_binary_ply(path, pts)
    out = mesh_vertices_from_ply(path)
    np.testing.assert_allclose(out, pts, rtol=1e-6)


def test_tsdf_reconstruction(tmp_path):
    scene = SyntheticScene(width=64, height=48, num_frames=4)
    processed = scene.write_scene(os.path.join(tmp_path, "log"))
    # fabricate a fusion mesh: plane points
    xs = np.linspace(-1, 1, 50)
    gx, gy = np.meshgrid(xs, xs)
    pts = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], -1)
    _write_ascii_ply(os.path.join(processed, "fusion_mesh.ply"), pts)

    recon = TSDFReconstruction.from_data_folder(
        processed, crop_box=CropBox((-0.3, -0.3, -0.1), (0.3, 0.3, 0.1))
    )
    assert recon.all_points.shape == (2500, 3)
    assert len(recon.points) < 2500  # crop box filtered
    T = recon.get_camera_to_world(0)
    np.testing.assert_allclose(T, scene.poses[0], atol=1e-6)

    depth = recon.render_depth(0)
    assert depth.shape == (48, 64)
    assert (depth > 0).any()

    depth_crop = recon.render_depth(0, cropped=True)
    assert (depth_crop > 0).sum() < (depth > 0).sum()


def test_camera_poses():
    poses = CameraPoses({0: np.eye(4), 5: np.diag([1.0, 1, 1, 1])})
    assert poses.indices == [0, 5]
    assert len(poses) == 2
