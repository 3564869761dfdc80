"""Change-detection / renderer / apps tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from pdc_tpu.data.dataset import SpartanDataset
from pdc_tpu.data.synthetic import SyntheticScene
from pdc_tpu.pipeline.change_detection import (
    ChangeDetection,
    CropBox,
    compute_foreground_mask_from_depth_image_pair,
    compute_foreground_mask_using_crop_strategy,
)
from pdc_tpu.pipeline.renderer import render_depth_from_points

W, H = 64, 48


def test_render_depth_matches_analytic():
    """Point-splat render of plane points must reproduce the analytic depth."""
    scene = SyntheticScene(width=W, height=H, num_frames=4)
    _, depth_gt, _, poses = scene.render_all()

    # dense point sampling of the plane z=0 (~0.5 cm spacing where the
    # cameras look)
    xs = np.linspace(-1.5, 1.5, 600)
    ys = np.linspace(-1.5, 1.5, 600)
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], axis=-1).astype(np.float32)

    d = np.asarray(render_depth_from_points(
        jnp.asarray(pts), jnp.asarray(poses[0], jnp.float32),
        jnp.asarray(scene.K, jnp.float32), H, W, splat_radius=1,
    ))
    gt = depth_gt[0].astype(np.float64) / 1000.0

    # compare only pixels whose true plane point lies inside the sampled
    # region (pixels beyond it get filled by smeared splats — expected for a
    # point renderer with finite geometry)
    d_world, c = scene._rays_world(scene.poses[0])
    t = gt
    p_world = c[None, None, :] + t[..., None] * d_world
    inside = (np.abs(p_world[..., 0]) < 1.2) & (np.abs(p_world[..., 1]) < 1.2)
    both = (d > 0) & (gt > 0) & inside
    assert both.mean() > 0.4
    err = np.abs(d[both] - gt[both])
    assert np.median(err) < 0.03
    assert np.percentile(err, 90) < 0.1


def test_foreground_mask_from_depth_pair():
    df = np.array([[1.0, 0.0], [2.0, 0.5]])
    db = np.array([[1.5, 1.0], [2.0, 0.0]])
    mask = compute_foreground_mask_from_depth_image_pair(df, db, 0.1)
    # [0,0]: closer by 0.5 -> fg; [0,1]: no fg return -> bg;
    # [1,0]: same depth -> bg; [1,1]: fg return, bg missing -> fg
    np.testing.assert_array_equal(mask, [[1, 0], [0, 1]])


def test_crop_strategy_mask():
    d = np.array([[0.0, 1.0], [2.0, 0.0]])
    np.testing.assert_array_equal(
        compute_foreground_mask_using_crop_strategy(d), [[0, 1], [1, 0]]
    )


def test_change_detection_end_to_end(tmp_path):
    """Masks from crop-box change detection roughly agree with the synthetic
    scene's own object masks."""
    scene = SyntheticScene(width=W, height=H, num_frames=3)
    _, _, mask_gt, poses = scene.render_all()

    # object disc points + background plane points
    n = 200
    rs = np.sqrt(np.random.RandomState(0).rand(n * n)) * scene.object_radius
    th = np.random.RandomState(1).rand(n * n) * 2 * np.pi
    obj_pts = np.stack([rs * np.cos(th), rs * np.sin(th), np.zeros(n * n)], -1)
    xs = np.linspace(-2, 2, 300)
    gx, gy = np.meshgrid(xs, xs)
    bg_pts = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], -1)
    all_pts = np.concatenate([obj_pts, bg_pts]).astype(np.float32)

    r = scene.object_radius
    cd = ChangeDetection(
        all_pts, scene.K, H, W,
        crop_box=CropBox((-r, -r, -0.01), (r, r, 0.01)),
        splat_radius=1,
    )
    mask, depth_fg = cd.compute_mask(poses[0])
    gt = mask_gt[0]
    inter = float(np.logical_and(mask, gt).sum())
    union = float(np.logical_or(mask, gt).sum())
    assert union > 0 and inter / union > 0.5  # crop box is square vs disc GT

    # file outputs
    from pdc_tpu.data.scene import SceneStructure

    structure = SceneStructure(str(tmp_path))
    pose_map = {i: poses[i] for i in range(3)}
    n_frames = cd.run(structure, pose_map=pose_map)
    assert n_frames == 3
    assert os.path.exists(structure.mask_image_filename(2))
    n_frames = cd.render_depth_images(structure, pose_map=pose_map)
    assert os.path.exists(os.path.join(structure.rendered_images_dir, "000002_depth.png"))


def test_scene_disk_roundtrip(tmp_path):
    """write_scene -> SceneStructure/SceneData reload preserves everything."""
    from pdc_tpu.data.dataset import SceneData
    from pdc_tpu.data.scene import SceneStructure

    scene = SyntheticScene(width=W, height=H, num_frames=3)
    processed = scene.write_scene(os.path.join(tmp_path, "scene_x"))
    sd = SceneData.from_structure(SceneStructure(processed), "scene_x")
    assert sd.num_frames == 3
    rgb, depth, mask, poses = scene.render_all()
    np.testing.assert_array_equal(sd.rgb, rgb)
    np.testing.assert_array_equal(sd.depth, depth)
    np.testing.assert_array_equal(sd.mask, mask)
    np.testing.assert_allclose(sd.poses, poses, atol=1e-6)
    np.testing.assert_allclose(sd.K, scene.K, atol=1e-9)


def test_heatmap_engine():
    from pdc_tpu.apps.live_heatmap_visualization import HeatmapEngine

    class IdentityDCN:
        image_mean = np.zeros(3)
        image_std_dev = np.ones(3)

        def forward_on_img(self, rgb):
            return jnp.asarray(rgb, jnp.float32) / 255.0

    ds = SpartanDataset.make_synthetic(num_scenes=1, width=W, height=H, num_frames=4)
    scene = ds.get_scene("scene_000")
    eng = HeatmapEngine([IdentityDCN()])
    eng.set_images(scene.rgb[0], scene.rgb[0])
    results = eng.find_best_match(10, 10)
    best_uv, diff, heat = results[0]
    assert diff < 1e-5
    assert heat.shape == (H, W)
    assert heat[best_uv[1], best_uv[0]] > 0.99


def test_grasp_point_stream():
    from pdc_tpu.apps.live_heatmap_visualization import GraspPointStream
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

    dcn = DenseCorrespondenceNetwork.from_config({
        "descriptor_dimension": 3, "image_width": W, "image_height": H,
        "backbone": {"model_class": "Resnet", "resnet_name": "Resnet18_8s"},
    })
    ds = SpartanDataset.make_synthetic(num_scenes=1, width=W, height=H, num_frames=4)
    scene = ds.get_scene("scene_000")
    res = np.asarray(dcn.forward_on_img(scene.rgb[0]))
    queries = res[[10, 20], [15, 30], :]  # descriptors at 2 pixels
    stream = GraspPointStream(dcn, queries)
    uv, dist = stream.process_frame(scene.rgb[0])
    assert uv.shape == (2, 2)
    np.testing.assert_array_equal(uv[0], [15, 10])
    np.testing.assert_array_equal(uv[1], [30, 20])
    # the matmul dist^2 formulation loses ~1e-3 to cancellation near zero
    assert (dist < 1e-2).all()


def test_heatmap_visualization_surface():
    """The cv2 UI wrapper class itself (reference HeatmapVisualization) —
    regression for a refactor that clobbered the class statement and left
    its body as dead code inside a neighboring function."""
    import inspect

    from pdc_tpu.apps import live_heatmap_visualization as m

    assert inspect.isclass(m.HeatmapVisualization)
    for name in ("from_config", "run", "_get_new_images"):
        assert callable(getattr(m.HeatmapVisualization, name))
    assert inspect.isfunction(m.compose_target_panel)

    # _get_new_images drives the engine with a dataset pair (headless path)
    class StubEngine:
        images = None

        def set_images(self, a, b):
            self.images = (a, b)

    ds = SpartanDataset.make_synthetic(num_scenes=1, width=W, height=H,
                                       num_frames=4)
    vis = m.HeatmapVisualization.__new__(m.HeatmapVisualization)
    vis._dataset, vis._engine = ds, StubEngine()
    vis._get_new_images()
    a, b = vis._engine.images
    assert a.shape == (H, W, 3) and b.shape == (H, W, 3)
    np.testing.assert_array_equal(a, vis._rgb_a)


def test_descriptor_image_export(tmp_path):
    from pdc_tpu.apps.compute_descriptor_images import compute_descriptor_images_for_scene
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

    dcn = DenseCorrespondenceNetwork.from_config({
        "descriptor_dimension": 3, "image_width": W, "image_height": H,
        "backbone": {"model_class": "Resnet", "resnet_name": "Resnet18_8s"},
    })
    ds = SpartanDataset.make_synthetic(num_scenes=1, width=W, height=H, num_frames=5)
    out = os.path.join(tmp_path, "desc")
    n = compute_descriptor_images_for_scene(dcn, ds.get_scene("scene_000"), out, batch_size=2)
    assert n == 5
    arr = np.load(os.path.join(out, "000004_descriptor.npy"))
    assert arr.shape == (H, W, 3)
    # padded batch must not corrupt earlier frames: re-check frame 0 equals
    # a direct forward
    direct = np.asarray(dcn.forward_on_img(ds.get_scene("scene_000").rgb[0]))
    saved = np.load(os.path.join(out, "000000_descriptor.npy"))
    np.testing.assert_allclose(saved, direct, atol=1e-5)
