"""Triangle-mesh depth rasterizer (the VTK mesh-render analog):
perspective-correct depth, occlusion, winding, PLY face IO, and the
change-detection integration."""

import numpy as np
import pytest

from pdc_tpu.pipeline.renderer import (
    read_ply_mesh,
    render_depth_from_mesh,
    render_depth_from_points,
)

H, W = 48, 64
K = np.array([[50.0, 0, 32.0], [0, 50.0, 24.0], [0, 0, 1.0]], np.float32)
EYE = np.eye(4, dtype=np.float32)


def _quad(z_fn, x0=-0.3, x1=0.3, y0=-0.2, y1=0.2):
    """Two triangles spanning a quad at depth z_fn(x, y)."""
    corners = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
    verts = np.array([[x, y, z_fn(x, y)] for x, y in corners], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, faces


def test_flat_quad_exact_depth():
    verts, faces = _quad(lambda x, y: 1.5)
    depth = np.asarray(render_depth_from_mesh(verts, faces, EYE, K, H, W,
                                              tile=32))
    # pixel (cx, cy) looks at (0, 0, 1.5) — inside the quad
    assert depth[24, 32] == pytest.approx(1.5, abs=1e-3)
    # quad projects to u in [cx - fx*0.3/1.5, cx + ...] = [22, 42]
    inside = depth[24, 24:41]
    np.testing.assert_allclose(inside, 1.5, atol=1e-3)
    assert depth[24, 2] == 0.0 and depth[2, 32] == 0.0  # outside


def test_perspective_correct_slanted_plane():
    # plane z = 1 + x: the depth at pixel u is the ray-plane intersection
    # z(u) = 1 / (1 - (u - cx)/fx), nonlinear in u — linear-in-screen-space
    # z interpolation would get this wrong; 1/z interpolation is exact
    verts, faces = _quad(lambda x, y: 1.0 + x)
    depth = np.asarray(render_depth_from_mesh(verts, faces, EYE, K, H, W,
                                              tile=40))
    for u in (28, 32, 36):
        alpha = (u + 0.5 - 32.0) / 50.0  # x/z along the pixel-center ray
        z_expect = 1.0 / (1.0 - alpha)
        assert depth[24, u] == pytest.approx(z_expect, rel=1e-3), u


def test_occlusion_and_winding():
    # far quad (both windings) + near quad occluding the center
    far_v, far_f = _quad(lambda x, y: 2.0)
    near_v, near_f = _quad(lambda x, y: 1.0, x0=-0.05, x1=0.05,
                           y0=-0.05, y1=0.05)
    verts = np.concatenate([far_v, near_v])
    faces = np.concatenate([far_f[:, ::-1], near_f + 4])  # reversed winding far
    depth = np.asarray(render_depth_from_mesh(verts, faces, EYE, K, H, W,
                                              tile=32))
    assert depth[24, 32] == pytest.approx(1.0, abs=1e-3)  # near wins
    assert depth[24, 28] == pytest.approx(2.0, abs=1e-3)  # far elsewhere


def test_mesh_renders_fill_point_splat_holes():
    # sparse vertices: splats leave holes, triangles do not
    verts, faces = _quad(lambda x, y: 1.2)
    d_mesh = np.asarray(render_depth_from_mesh(verts, faces, EYE, K, H, W,
                                               tile=32))
    d_pts = np.asarray(render_depth_from_points(verts, EYE, K, H, W,
                                                splat_radius=1))
    assert (d_mesh > 0).sum() > 5 * (d_pts > 0).sum()


def _write_ply(path, verts, faces, binary):
    if binary:
        with open(path, "wb") as f:
            f.write(b"ply\nformat binary_little_endian 1.0\n")
            f.write(b"element vertex %d\n" % len(verts))
            f.write(b"property float x\nproperty float y\nproperty float z\n")
            f.write(b"element face %d\n" % len(faces))
            f.write(b"property list uchar int vertex_indices\n")
            f.write(b"end_header\n")
            f.write(np.asarray(verts, "<f4").tobytes())
            fdt = np.dtype([("n", "u1"), ("idx", "<i4", (3,))])
            rec = np.zeros(len(faces), fdt)
            rec["n"] = 3
            rec["idx"] = faces
            f.write(rec.tobytes())
    else:
        with open(path, "w") as f:
            f.write("ply\nformat ascii 1.0\n")
            f.write(f"element vertex {len(verts)}\n")
            f.write("property float x\nproperty float y\nproperty float z\n")
            f.write(f"element face {len(faces)}\n")
            f.write("property list uchar int vertex_indices\n")
            f.write("end_header\n")
            for v in verts:
                f.write("%.6f %.6f %.6f\n" % tuple(v))
            for a, b, c in faces:
                f.write(f"3 {a} {b} {c}\n")


@pytest.mark.parametrize("binary", [False, True])
def test_ply_face_roundtrip(tmp_path, binary):
    verts, faces = _quad(lambda x, y: 1.0)
    path = str(tmp_path / ("m_bin.ply" if binary else "m_ascii.ply"))
    _write_ply(path, verts, faces, binary)
    rv, rf = read_ply_mesh(path)
    np.testing.assert_allclose(rv, verts, atol=1e-5)
    np.testing.assert_array_equal(rf, faces)


def test_ply_without_faces(tmp_path):
    verts, _ = _quad(lambda x, y: 1.0)
    path = str(tmp_path / "pts.ply")
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("end_header\n")
        for v in verts:
            f.write("%.6f %.6f %.6f\n" % tuple(v))
    rv, rf = read_ply_mesh(path)
    assert rf is None and rv.shape == (4, 3)


def test_change_detection_uses_mesh(tmp_path):
    """from_data_folder picks up faces; crop-box filtering keeps faces with
    any vertex inside (boundary triangles survive, as with VTK clipping)."""
    from pdc_tpu.pipeline.change_detection import ChangeDetection, CropBox

    verts, faces = _quad(lambda x, y: 1.5)
    cd = ChangeDetection(verts, K, H, W, faces=faces, raster_tile=32,
                         crop_box=CropBox((-1, -1, 0), (1, 1, 3)))
    mask, depth_fg = cd.compute_mask(EYE)
    assert mask[24, 32] == 1 and depth_fg[24, 32] > 0
    # crop box excluding the quad -> no faces survive -> empty render
    cd2 = ChangeDetection(verts, K, H, W, faces=faces, raster_tile=32,
                          crop_box=CropBox((5, 5, 5), (6, 6, 6)))
    mask2, _ = cd2.compute_mask(EYE)
    assert mask2.sum() == 0


def test_auto_tile_covers_coarse_triangles():
    """With raster_tile=None, ChangeDetection renders size-binned — a coarse
    2-triangle quad (screen extent ~20 px, larger than the TSDF default
    tile=8) lands in a covering bin and renders hole-free."""
    from pdc_tpu.pipeline.change_detection import ChangeDetection
    from pdc_tpu.pipeline.renderer import pick_raster_tile

    verts, faces = _quad(lambda x, y: 1.5)
    tile = pick_raster_tile(verts, faces, EYE, K, H, W)
    assert tile >= 20  # quad spans ~20 x 14 px
    cd = ChangeDetection(verts, K, H, W, faces=faces)  # raster_tile=None
    _, depth_fg = cd.compute_mask(EYE)
    inside = depth_fg[24, 24:41]
    np.testing.assert_allclose(inside, 1.5, atol=1e-3)


def test_binned_render_matches_blanket_tile():
    """Size-binned rasterization is EXACT vs one blanket covering tile:
    mixed mesh (fine grid + one coarse quad + one face behind the camera),
    two poses, per-pixel equality."""
    from pdc_tpu.pipeline.renderer import (
        bin_faces_by_extent,
        render_depth_from_mesh_binned_many,
        render_depth_from_mesh_many,
    )

    rng = np.random.RandomState(0)
    # fine grid of small triangles around z=1.8
    g = 8
    xs = np.linspace(-0.25, 0.25, g)
    ys = np.linspace(-0.18, 0.18, g)
    gv = np.array([[x, y, 1.8 + 0.02 * rng.rand()] for y in ys for x in xs],
                  np.float32)
    gf = []
    for j in range(g - 1):
        for i in range(g - 1):
            a, b, c, d = (j * g + i, j * g + i + 1,
                          (j + 1) * g + i, (j + 1) * g + i + 1)
            gf += [[a, b, d], [a, d, c]]
    # one coarse near quad + one face fully behind the camera
    qv, qf = _quad(lambda x, y: 1.0, x0=-0.06, x1=0.06, y0=-0.05, y1=0.05)
    bv = np.array([[0, 0, -1.0], [1, 0, -1.0], [0, 1, -1.0]], np.float32)
    verts = np.concatenate([gv, qv, bv])
    faces = np.concatenate([np.asarray(gf, np.int32),
                            qf + len(gv),
                            np.asarray([[0, 1, 2]], np.int32) + len(gv) + 4])
    pose2 = EYE.copy()
    pose2[0, 3] = 0.05
    poses = np.stack([EYE, pose2])

    bins = bin_faces_by_extent(verts, faces, poses, K, H, W)
    assert len(bins) >= 2  # fine faces and the coarse quad separate
    assert sum(len(fb) for fb, _ in bins) < len(faces)  # behind-face dropped

    d_binned = np.asarray(render_depth_from_mesh_binned_many(
        verts, faces, poses, K, H, W))
    d_blanket = np.asarray(render_depth_from_mesh_many(
        verts, faces, poses, K, H, W, tile=32))
    np.testing.assert_array_equal(d_binned, d_blanket)


def test_pick_raster_tile_warns_on_truncation(caplog):
    """Triangles larger than max_tile log the truncated-face count instead
    of failing silently (the pre-round-3 behavior)."""
    import logging

    from pdc_tpu.pipeline.renderer import pick_raster_tile

    verts, faces = _quad(lambda x, y: 1.5)
    with caplog.at_level(logging.WARNING, "pdc_tpu.pipeline.renderer"):
        tile = pick_raster_tile(verts, faces, EYE, K, H, W, max_tile=16)
    assert tile == 16
    assert any("render truncated" in r.message for r in caplog.records)


def test_pick_raster_tile_ignores_offscreen_and_behind():
    """Faces behind the camera or fully off-screen must not inflate the
    tile (the rasterizer culls them anyway)."""
    from pdc_tpu.pipeline.renderer import pick_raster_tile

    behind = np.array([[-5, -5, -1.0], [5, -5, -1.0], [0, 5, -1.0]],
                      np.float32)
    offscreen = np.array([[50, 50, 1.0], [51, 50, 1.0], [50, 51, 1.0]],
                         np.float32)
    verts = np.concatenate([behind, offscreen])
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    assert pick_raster_tile(verts, faces, EYE, K, H, W) == 8


def test_synthetic_fusion_mesh_pipeline(tmp_path):
    """End-to-end from disk: synthetic scene writes a triangulated
    fusion_mesh.ply; change detection loads it, rasterizes, and the mask
    agrees with the scene's analytic object mask."""
    from pdc_tpu.data.synthetic import SyntheticScene
    from pdc_tpu.pipeline.change_detection import (
        ChangeDetection, CropBox)

    scene = SyntheticScene(width=64, height=48, num_frames=2)
    scene.write_scene(str(tmp_path / "scene"))
    processed = str(tmp_path / "scene" / "processed")

    box = CropBox((-scene.object_radius * 1.2, -scene.object_radius * 1.2,
                   0.005),
                  (scene.object_radius * 1.2, scene.object_radius * 1.2, 0.1))
    cd, structure = ChangeDetection.from_data_folder(processed, crop_box=box)
    assert cd.faces is not None and len(cd.faces) > 100

    rgb, depth, gt_mask, pose = scene.render(0)
    mask, depth_fg = cd.compute_mask(pose)
    gt = gt_mask > 0
    pred = mask > 0
    inter = (gt & pred).sum()
    union = (gt | pred).sum()
    assert inter / union > 0.7, f"IoU {inter/union:.2f}"


def test_sorted_render_matches_blanket_tile():
    """Sort-based z-buffering (no scatter) is EXACT vs the scatter path on
    the mixed mesh."""
    from pdc_tpu.pipeline.renderer import (
        render_depth_from_mesh_many,
        render_depth_from_mesh_sorted_many,
    )

    rng = np.random.RandomState(1)
    g = 6
    xs = np.linspace(-0.25, 0.25, g)
    ys = np.linspace(-0.18, 0.18, g)
    gv = np.array([[x, y, 1.8 + 0.02 * rng.rand()] for y in ys for x in xs],
                  np.float32)
    gf = []
    for j in range(g - 1):
        for i in range(g - 1):
            a, b, c, d = (j * g + i, j * g + i + 1,
                          (j + 1) * g + i, (j + 1) * g + i + 1)
            gf += [[a, b, d], [a, d, c]]
    qv, qf = _quad(lambda x, y: 1.0, x0=-0.06, x1=0.06, y0=-0.05, y1=0.05)
    verts = np.concatenate([gv, qv])
    faces = np.concatenate([np.asarray(gf, np.int32), qf + len(gv)])
    pose2 = EYE.copy()
    pose2[1, 3] = -0.04
    poses = np.stack([EYE, pose2])

    d_sorted = np.asarray(render_depth_from_mesh_sorted_many(
        verts, faces, poses, K, H, W))
    d_blanket = np.asarray(render_depth_from_mesh_many(
        verts, faces, poses, K, H, W, tile=32))
    np.testing.assert_array_equal(d_sorted, d_blanket)


def test_sorted_render_empty_view():
    """No visible faces -> all-zero depth (sentinel pixels never hit)."""
    from pdc_tpu.pipeline.renderer import render_depth_from_mesh_sorted_many

    verts = np.array([[0, 0, -1.0], [1, 0, -1.0], [0, 1, -1.0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    d = np.asarray(render_depth_from_mesh_sorted_many(
        verts, faces, EYE, K, H, W))
    assert d.shape == (1, H, W) and (d == 0).all()


def test_points_sorted_matches_scatter():
    """Sort-based point-splat rendering == the scatter z-buffer."""
    from pdc_tpu.pipeline.renderer import (
        render_depth_from_points_many,
        render_depth_from_points_sorted_many,
    )

    rng = np.random.RandomState(2)
    pts = np.stack([rng.uniform(-0.4, 0.4, 600),
                    rng.uniform(-0.3, 0.3, 600),
                    rng.uniform(0.8, 2.5, 600)], axis=-1).astype(np.float32)
    pts[:10, 2] = -1.0  # some behind the camera
    pose2 = EYE.copy()
    pose2[0, 3] = 0.03
    poses = np.stack([EYE, pose2])
    d_scatter = np.asarray(render_depth_from_points_many(pts, poses, K, H, W))
    d_sorted = np.asarray(render_depth_from_points_sorted_many(
        pts, poses, K, H, W))
    np.testing.assert_array_equal(d_scatter, d_sorted)


def test_viewport_straddling_quad_exact():
    """A quad hanging off the viewport edges (bbox min far outside; the
    raster block anchor clamps to 0) still fills exactly its visible
    region with analytic depth — in the sorted path AND the blanket-tile
    scatter path."""
    from pdc_tpu.pipeline.renderer import render_depth_from_mesh_sorted_many

    # x0 maps to u = 32 + 50*(-1.2)/1.5 = -8 (off-screen left); y0 maps to
    # v = -16 (off-screen top) — the clamped anchor path
    verts, faces = _quad(lambda x, y: 1.5, x0=-1.2, x1=0.1, y0=-1.2, y1=0.1)
    d_sorted = np.asarray(render_depth_from_mesh_sorted_many(
        verts, faces, EYE, K, H, W, max_tile=128))[0]
    d_scatter = np.asarray(render_depth_from_mesh(
        verts, faces, EYE, K, H, W, tile=128))
    np.testing.assert_array_equal(d_sorted, d_scatter)
    # visible extent: u in [0, cx + fx*0.1/1.5) = [0, 35.33), v likewise
    assert d_sorted[10, 0] == pytest.approx(1.5, abs=1e-3)   # left edge
    assert d_sorted[0, 10] == pytest.approx(1.5, abs=1e-3)   # top edge
    np.testing.assert_allclose(d_sorted[10, :35], 1.5, atol=1e-3)
    assert (d_sorted[10, 36:] == 0).all()
    assert (d_sorted[28:, :] == 0).all()


def test_prepare_sorted_render_counts_and_culling():
    """prepare_sorted_render: bins by candidate-center count (a ~2.2 px
    bbox triangle needs a tile-2 block, not tile-4) and per-pose culling
    keeps exactly the faces that can land pixels under each pose."""
    from pdc_tpu.pipeline.renderer import (
        prepare_sorted_render,
        projected_face_pixel_counts,
    )

    # one small on-screen triangle + one behind the camera + one off-screen
    verts = np.array([
        [0.00, 0.00, 1.5], [0.05, 0.00, 1.5], [0.00, 0.05, 1.5],   # ~1.7 px
        [0.0, 0.0, -1.0], [0.1, 0.0, -1.0], [0.0, 0.1, -1.0],      # behind
        [9.0, 9.0, 1.5], [9.1, 9.0, 1.5], [9.0, 9.1, 1.5],         # off
    ], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
    counts = projected_face_pixel_counts(verts, faces, EYE, K, H, W)
    assert counts[0] > 0 and counts[1] == 0 and counts[2] == 0

    pose2 = EYE.copy()
    pose2[0, 3] = 50.0  # everything off-screen under the second pose
    prep = prepare_sorted_render(verts, faces, np.stack([EYE, pose2]),
                                 K, H, W)
    (fb, idx, tile), = prep
    assert tile == 2                      # count metric, not bbox extent
    assert fb.shape == (2, 3)             # visible face + sentinel row
    assert idx.shape == (2, 1)
    assert idx[0, 0] == 0                 # pose 1 sees the triangle
    assert idx[1, 0] == 1                 # pose 2: padded to the sentinel
