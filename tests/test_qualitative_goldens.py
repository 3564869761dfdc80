"""Golden-artifact tests for the qualitative/visual suite (VERDICT r4 task
8): the PNG panels the evaluation writes must keep LOOKING right, not just
keep their shapes — descriptor RGB normalization, JET heatmap blend, the
correspondence panel, descriptor colormaps, and the 2-D cluster plots are
compared against committed goldens.

Numpy-valued artifacts compare exactly; matplotlib figures compare with a
small mean-absolute-difference budget (font hinting can wiggle across
matplotlib point releases without the plot being wrong).

Regenerate after an INTENTIONAL visual change with:

    PDC_REGEN_GOLDENS=1 python -m pytest tests/test_qualitative_goldens.py

Reference outputs these golden: plotting.py:5-74 (normalize_descriptor),
visualization.py:8-33 (JET heatmap), evaluation.py:530-602 / 1412-1418 /
2466-2620 (colormaps, match panel, cluster plots),
live_heatmap_visualization.py:254-331 (heat blend)."""

import os

import jax
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "goldens")
REGEN = os.environ.get("PDC_REGEN_GOLDENS") == "1"


def _check(name: str, got: np.ndarray, atol: float = 0.0,
           mean_tol: float = 0.0):
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    if REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, data=got)
        return
    assert os.path.exists(path), f"missing golden {path} (regen with " \
                                 f"PDC_REGEN_GOLDENS=1)"
    want = np.load(path)["data"]
    assert got.shape == want.shape, (name, got.shape, want.shape)
    if mean_tol:
        diff = np.abs(got.astype(np.float64) - want.astype(np.float64))
        assert diff.mean() <= mean_tol, (name, diff.mean())
    else:
        np.testing.assert_allclose(got, want, atol=atol, err_msg=name)


def _fig_rgb(fig) -> np.ndarray:
    fig.canvas.draw()
    return np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()


def test_normalize_descriptor_goldens():
    from pdc_tpu.evaluation.plotting import (
        normalize_descriptor,
        normalize_descriptor_pair,
    )

    rng = np.random.RandomState(42)
    res_a = rng.randn(12, 16, 3) * 2.0 + 0.3
    res_b = rng.randn(12, 16, 3) * 0.5 - 1.0
    _check("normalize_plain", normalize_descriptor(res_a), atol=1e-12)
    stats = {"min": [-1.0, -2.0, -1.5], "max": [2.5, 2.0, 3.0]}
    _check("normalize_stats", normalize_descriptor(res_a, stats), atol=1e-12)
    na, nb = normalize_descriptor_pair(res_a, res_b)
    _check("normalize_pair_a", na, atol=1e-12)
    _check("normalize_pair_b", nb, atol=1e-12)


def test_heatmap_goldens():
    from pdc_tpu.ops.matching import gaussian_heatmap_from_norm_diffs
    from pdc_tpu.utils.visualization import (
        _jet_colormap,
        compute_gaussian_kernel_heatmap_from_norm_diffs,
    )

    rng = np.random.RandomState(7)
    norm_diffs = np.abs(rng.randn(24, 32)).astype(np.float32) * 0.3
    heat = np.asarray(gaussian_heatmap_from_norm_diffs(norm_diffs))
    _check("heat_gray", heat, atol=1e-6)
    ramp = np.linspace(0.0, 1.0, 256).reshape(8, 32)
    _check("jet_numpy", _jet_colormap(ramp))
    try:
        import cv2  # noqa: F401

        _check("heat_jet_cv2",
               compute_gaussian_kernel_heatmap_from_norm_diffs(norm_diffs))
    except ImportError:
        if not REGEN:
            pytest.skip("cv2 not available for the cv2-JET golden")


def test_heat_blend_golden():
    pytest.importorskip("cv2")
    from pdc_tpu.apps.live_heatmap_visualization import compose_target_panel

    rng = np.random.RandomState(3)
    tgt = rng.randint(0, 255, (24, 32, 3), dtype=np.uint8)
    heat = np.clip(np.abs(rng.randn(24, 32)) * 0.5, 0, 1)
    _check("heat_blend", compose_target_panel(tgt, heat, (20, 10)))


def test_correspondence_panel_golden():
    from pdc_tpu.data.synthetic import SyntheticScene
    from pdc_tpu.evaluation.qualitative import draw_correspondence_panel

    sc = SyntheticScene(width=64, height=48, num_frames=2, seed=5)
    rgb, _, _, _ = sc.render_all()
    rng = np.random.RandomState(5)
    uv_a = np.stack([rng.randint(0, 64, 6), rng.randint(0, 48, 6)], -1)
    uv_b = np.stack([rng.randint(0, 64, 6), rng.randint(0, 48, 6)], -1)
    ax = draw_correspondence_panel(rgb[0], rgb[1], uv_a, uv_b,
                                   title="golden panel")
    img = _fig_rgb(ax.figure)
    import matplotlib.pyplot as plt

    plt.close(ax.figure)
    _check("panel_correspondence", img, mean_tol=1.0)


def test_descriptor_colormap_golden():
    from pdc_tpu.evaluation.qualitative import plot_descriptor_colormaps

    rng = np.random.RandomState(11)
    res_a = rng.randn(48, 64, 3)
    res_b = rng.randn(48, 64, 3) * 0.7 + 0.2
    mask = (rng.rand(48, 64) > 0.4).astype(np.uint8)
    fig = plot_descriptor_colormaps(res_a, res_b, mask_a=mask, mask_b=mask,
                                    plot_masked=True)
    img = _fig_rgb(fig)
    import matplotlib.pyplot as plt

    plt.close(fig)
    _check("panel_colormaps", img, mean_tol=1.0)


def test_cluster_plot_golden(tmp_path):
    from PIL import Image

    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.evaluation.qualitative import make_2d_cluster_plot
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

    cfg = {"descriptor_dimension": 3, "image_width": 64, "image_height": 48,
           "backbone": {"model_class": "Resnet",
                        "resnet_name": "Resnet18_8s"}}
    dcn = DenseCorrespondenceNetwork.from_config(
        cfg, rng=jax.random.PRNGKey(3))
    ds = SpartanDataset.make_synthetic(num_scenes=2, width=64, height=48,
                                       num_frames=3)
    ds.reset_seed(17)
    make_2d_cluster_plot(dcn, ds, num_images=3, num_samples_per_image=16,
                         plot_background=True, output_dir=str(tmp_path))
    img = np.asarray(Image.open(tmp_path / "cluster_plot_xy.png"))[..., :3]
    _check("panel_cluster_xy", img, mean_tol=1.0)
