"""Point-cloud segmentation toolbox + director-utils analogs.

Covers the DRC/PCL-filter surface (pipeline/segmentation.py, reference
``modules/.../utils/segmentation.py`` + PCL semantics) and the VTK camera
conversions (geom/view_utils.py, reference ``utils/director_utils.py``)
with analytic ground truth.
"""

import numpy as np
import pytest

from pdc_tpu.geom.camera import CameraIntrinsics
from pdc_tpu.geom.view_utils import (
    ViewCamera,
    camera_transform_from_view,
    focal_length_to_view_angle,
    transform_from_pose,
    view_angle_to_focal_length,
    view_from_camera_transform,
    view_params_from_intrinsics,
)
from pdc_tpu.pipeline.segmentation import (
    crop_to_line_segment,
    estimate_normals,
    euclidean_cluster,
    fit_plane_ransac,
    icp_point_to_point,
    remove_radius_outliers,
    segment_table,
    voxel_down_sample,
)


def _random_rotation(rng):
    q = rng.normal(size=4)
    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


# ---------------------------------------------------------------------------
# voxel grid
# ---------------------------------------------------------------------------

def test_voxel_down_sample_centroids():
    # two occupied voxels at size 1.0: [0,1)^3 and [2,3) on x
    pts = np.array([[0.2, 0.2, 0.2], [0.4, 0.4, 0.4], [2.5, 0.5, 0.5]])
    out = voxel_down_sample(pts, 1.0)
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out[0], [0.3, 0.3, 0.3])
    np.testing.assert_allclose(out[1], [2.5, 0.5, 0.5])


def test_voxel_down_sample_negative_coords_and_empty():
    pts = np.array([[-0.5, -0.5, -0.5], [-0.4, -0.6, -0.5], [0.5, 0.5, 0.5]])
    out = voxel_down_sample(pts, 1.0)
    assert out.shape == (2, 3)  # [-1,0)^3 and [0,1)^3
    assert voxel_down_sample(np.empty((0, 3)), 1.0).shape == (0, 3)


# ---------------------------------------------------------------------------
# plane fitting / table segmentation
# ---------------------------------------------------------------------------

def test_fit_plane_ransac_recovers_plane_under_outliers():
    rng = np.random.default_rng(0)
    n_in, n_out = 400, 100
    # plane z = 0.2x - 0.1y + 3  ->  normal ~ [-0.2, 0.1, 1]
    xy = rng.uniform(-1, 1, size=(n_in, 2))
    z = 0.2 * xy[:, 0] - 0.1 * xy[:, 1] + 3.0
    inliers = np.column_stack([xy, z + rng.normal(0, 0.002, n_in)])
    outliers = rng.uniform(-2, 2, size=(n_out, 3)) + [0, 0, 5]
    pts = np.vstack([inliers, outliers])
    normal, d, mask = fit_plane_ransac(pts, distance_threshold=0.01, seed=1)
    expected = np.array([-0.2, 0.1, 1.0])
    expected /= np.linalg.norm(expected)
    cos = abs(normal @ expected)
    assert cos > 0.9999
    assert mask[:n_in].mean() > 0.98  # recovers (almost) all inliers
    assert mask[n_in:].mean() < 0.05


def test_segment_table_splits_objects_above_plane():
    rng = np.random.default_rng(2)
    table = np.column_stack([rng.uniform(0, 1, (500, 2)),
                             rng.normal(0, 0.001, 500)])
    # an object sitting 5cm above the table
    obj = rng.normal(0, 0.02, size=(80, 3)) + [0.5, 0.5, 0.05]
    pts = np.vstack([table, obj])
    seg = segment_table(pts, distance_threshold=0.005, above_table=0.01,
                        seed=0)
    # normal oriented toward the side holding the object (z-up here)
    assert seg["normal"][2] > 0.99
    assert seg["table_mask"][:500].mean() > 0.98
    assert seg["above_mask"][500:].mean() > 0.9
    assert not seg["above_mask"][:500].any()


# ---------------------------------------------------------------------------
# clustering / outliers / normals
# ---------------------------------------------------------------------------

def test_euclidean_cluster_two_blobs_and_min_size():
    rng = np.random.default_rng(3)
    a = rng.normal(0, 0.01, size=(50, 3))
    b = rng.normal(0, 0.01, size=(30, 3)) + [1.0, 0, 0]
    lone = np.array([[5.0, 5.0, 5.0]])
    labels = euclidean_cluster(np.vstack([a, b, lone]), radius=0.1,
                               min_cluster_size=2)
    assert (labels[:50] == 0).all()       # biggest cluster labeled 0
    assert (labels[50:80] == 1).all()
    assert labels[80] == -1               # singleton below min size


def test_euclidean_cluster_chain_connectivity():
    # a chain of points each 0.9*radius apart is ONE cluster
    pts = np.column_stack([np.arange(10) * 0.09,
                           np.zeros(10), np.zeros(10)])
    labels = euclidean_cluster(pts, radius=0.1)
    assert (labels == 0).all()


def test_remove_radius_outliers():
    rng = np.random.default_rng(4)
    dense = rng.normal(0, 0.01, size=(40, 3))
    iso = np.array([[3.0, 3.0, 3.0]])
    filtered, keep = remove_radius_outliers(np.vstack([dense, iso]),
                                            radius=0.1, min_neighbors=3)
    assert keep[:40].all()
    assert not keep[40]
    assert len(filtered) == 40


def test_estimate_normals_plane_and_orientation():
    rng = np.random.default_rng(5)
    pts = np.column_stack([rng.uniform(0, 1, (300, 2)), np.zeros(300)])
    normals = estimate_normals(pts, radius=0.15,
                               orient_toward=[0.5, 0.5, 2.0])
    ok = ~np.isnan(normals[:, 0])
    assert ok.mean() > 0.95
    # all normals ~ +z (oriented toward the viewpoint above the plane)
    assert (normals[ok][:, 2] > 0.99).all()


# ---------------------------------------------------------------------------
# ICP
# ---------------------------------------------------------------------------

def test_icp_recovers_known_rigid_transform():
    rng = np.random.default_rng(6)
    target = rng.uniform(-0.5, 0.5, size=(300, 3))
    # small rotation (5 deg about z) + translation
    ang = np.radians(5.0)
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    t = np.array([0.03, -0.02, 0.01])
    T_true = np.eye(4)
    T_true[:3, :3], T_true[:3, 3] = R, t
    # source = inverse-transformed target (so T_true maps source -> target)
    source = (target - t) @ R
    res = icp_point_to_point(source, target,
                             max_correspondence_distance=0.1)
    np.testing.assert_allclose(res["transform"], T_true, atol=1e-6)
    assert res["rmse"] < 1e-6
    assert res["num_correspondences"] == 300


def test_icp_with_noise_and_partial_overlap():
    rng = np.random.default_rng(7)
    target = rng.uniform(-0.5, 0.5, size=(400, 3))
    t = np.array([0.02, 0.01, -0.015])
    source = target[:350] - t + rng.normal(0, 0.001, (350, 3))
    res = icp_point_to_point(source, target,
                             max_correspondence_distance=0.08)
    np.testing.assert_allclose(res["transform"][:3, 3], t, atol=5e-3)


# ---------------------------------------------------------------------------
# crop primitive
# ---------------------------------------------------------------------------

def test_crop_to_line_segment():
    pts = np.array([[0.5, 9.0, 9.0],   # inside along x in [0,1]
                    [-0.1, 0.0, 0.0],  # before p1
                    [1.1, 0.0, 0.0]])  # past p2
    filtered, keep = crop_to_line_segment(pts, [0, 0, 0], [1, 0, 0])
    assert keep.tolist() == [True, False, False]
    np.testing.assert_allclose(filtered, pts[:1])
    with pytest.raises(ValueError):
        crop_to_line_segment(pts, [0, 0, 0], [0, 0, 0])


# ---------------------------------------------------------------------------
# view utils (director_utils.py analogs)
# ---------------------------------------------------------------------------

def test_transform_from_pose_matches_se3_from_dict():
    d = {"quaternion": {"w": 1.0, "x": 0.0, "y": 0.0, "z": 0.0},
         "translation": {"x": 1.0, "y": 2.0, "z": 3.0}}
    T = transform_from_pose(d)
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3])
    np.testing.assert_allclose(T[:3, :3], np.eye(3))


def test_camera_transform_view_round_trip():
    rng = np.random.default_rng(8)
    for _ in range(20):
        T = np.eye(4)
        T[:3, :3] = _random_rotation(rng)
        T[:3, 3] = rng.uniform(-2, 2, 3)
        view = view_from_camera_transform(T)
        T2 = camera_transform_from_view(view)
        np.testing.assert_allclose(T2, T, atol=1e-10)


def test_camera_transform_orthonormalizes_skew_view_up():
    # VTK view-up need not be orthogonal to forward; the RDF frame must
    # still come out orthonormal with z along forward
    view = ViewCamera(position=[0, 0, 0], focal_point=[0, 0, 2],
                      view_up=[0.3, -1.0, 0.4])
    T = camera_transform_from_view(view)
    R = T[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(R[:, 2], [0, 0, 1], atol=1e-12)


def test_focal_length_view_angle_round_trip():
    f = 528.0
    ang = focal_length_to_view_angle(f, 480)
    assert view_angle_to_focal_length(ang, 480) == pytest.approx(f)
    # the reference's Asus default: 480-tall image at f=528 -> ~48.9 deg
    assert ang == pytest.approx(48.888, abs=0.01)


def test_view_params_from_intrinsics_centered_and_offset():
    # perfectly centered principal point -> zero window offsets
    cam = CameraIntrinsics(cx=320.0, cy=240.0, fx=528.0, fy=528.0,
                           width=640, height=480)
    p = view_params_from_intrinsics(cam)
    assert p["window_center"] == (0.0, 0.0)
    assert p["aspect_scale"] == 1.0
    assert p["view_angle"] == pytest.approx(
        focal_length_to_view_angle(528.0, 480))
    # offset principal point: director_utils.py:128-129 sign convention
    cam2 = CameraIntrinsics(cx=330.0, cy=230.0, fx=600.0, fy=500.0,
                            width=640, height=480)
    p2 = view_params_from_intrinsics(cam2)
    assert p2["window_center"][0] == pytest.approx(-2 * 10 / 640)
    assert p2["window_center"][1] == pytest.approx(2 * -10 / 480)
    assert p2["aspect_scale"] == pytest.approx(1.2)


def test_non_finite_points_do_not_poison_neighbors():
    """A single NaN point (PCL is_dense=False) must not corrupt the grid
    hash for the rest of the cloud (int64-cast NaN poisons the extents)."""
    pts = np.array([[0, 0, 0], [0.001, 0, 0], [np.nan, 0, 0], [5.0, 5, 5]])
    labels = euclidean_cluster(pts, 0.01)
    assert labels[0] == labels[1]          # 1 mm apart -> same cluster
    assert labels[2] == -1                 # NaN point skipped
    assert labels[3] != labels[0]

    _, keep = remove_radius_outliers(pts, radius=0.01, min_neighbors=2)
    assert keep[0] and keep[1] and not keep[2]

    down = voxel_down_sample(pts, 0.0005)
    assert np.isfinite(down).all() and len(down) == 3  # NaN row dropped


def test_radius_outlier_counts_include_self_like_pcl():
    """PCL's radiusSearch counts the query point itself: an isolated PAIR
    survives min_neighbors=2 (count self + 1 other)."""
    pts = np.array([[0.0, 0, 0], [0.005, 0, 0], [9.0, 9, 9]])
    _, keep = remove_radius_outliers(pts, radius=0.01, min_neighbors=2)
    assert keep[0] and keep[1] and not keep[2]


def test_degenerate_ransac_raises():
    line = np.stack([np.linspace(0, 1, 50)] + [np.zeros(50)] * 2, axis=1)
    with pytest.raises(ValueError, match="degenerate"):
        fit_plane_ransac(line, refine=False)


def test_segment_table_near_band_not_below():
    """Up-side points inside (threshold, above_table] are near_mask, not
    below_mask — a caller dropping below must not delete low objects."""
    rng = np.random.default_rng(11)
    table = np.column_stack([rng.uniform(0, 1, (400, 2)),
                             rng.normal(0, 0.001, 400)])
    obj = rng.normal(0, 0.005, size=(30, 3)) + [0.5, 0.5, 0.10]
    low = np.array([[0.5, 0.5, 0.03]])     # 3 cm up: in the near band
    under = np.array([[0.5, 0.5, -0.30]])
    pts = np.vstack([table, obj, low, under])
    seg = segment_table(pts, distance_threshold=0.005, above_table=0.05)
    assert seg["normal"][2] > 0.99  # majority of off-plane mass is above
    assert seg["above_mask"][400:430].mean() > 0.9
    assert not seg["below_mask"][430]
    assert seg["near_mask"][430]
    assert seg["below_mask"][431]
    assert not seg["above_mask"][431]


def test_neighbor_candidate_explosion_raises_before_allocating():
    from pdc_tpu.pipeline.segmentation import _neighbor_pairs

    pts = np.random.default_rng(0).uniform(0, 0.001, (600, 3))
    with pytest.raises(ValueError, match="max_pairs"):
        _neighbor_pairs(pts, radius=1.0, max_pairs=10_000)


def test_pose_dict_key_spellings():
    """Reference getQuaternionFromDict accepts quaternion/orientation/
    rotation spellings (utils.py:78-95)."""
    from pdc_tpu.geom.transforms import se3_from_dict
    from pdc_tpu.geom.view_utils import transform_from_pose

    q = {"w": 1.0, "x": 0.0, "y": 0.0, "z": 0.0}
    t = {"x": 1.0, "y": 2.0, "z": 3.0}
    T0 = se3_from_dict({"quaternion": q, "translation": t})
    for key in ("orientation", "rotation"):
        np.testing.assert_array_equal(
            transform_from_pose({key: q, "translation": t}), T0)
    with pytest.raises(ValueError, match="quaternion"):
        se3_from_dict({"translation": t})
