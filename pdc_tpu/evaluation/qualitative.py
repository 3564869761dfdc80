"""Qualitative evaluation suite — the plots researchers eyeball.

Rebuild of the reference's qualitative flows
(``evaluation.py:1979-2070`` evaluate_network_qualitative,
``:1203-1430`` same-scene / cross-scene / keypoint pair analysis,
``:530-602`` plot_descriptor_colormaps, ``:2466-2620`` make_2d_cluster_plot)
re-designed for a headless TPU workflow:

  * no cv2 HighGUI / plt.show() — every figure is written to a PNG under an
    output directory, so one call on a model folder produces the full
    artifact set;
  * best matches are computed for ALL sampled pixels in one on-device batch
    (``best_matches_batch``) instead of a python loop of per-pixel argmins;
  * the cv2.drawMatches panel is re-implemented with matplotlib (grayscale
    side-by-side + colored match lines), removing the cv2 dependency.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pdc_tpu.evaluation.plotting import (
    normalize_descriptor,
    normalize_descriptor_pair,
)
from pdc_tpu.ops.matching import best_matches_batch, norm_diffs_for_descriptor
from pdc_tpu.ops.sampling import sample_from_mask
from pdc_tpu.utils.visualization import (
    compute_gaussian_kernel_heatmap_from_norm_diffs,
)

logger = logging.getLogger(__name__)


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _to_gray_rgb(img):
    """uint8 RGB -> grayscale replicated to 3 channels (the reference draws
    matches over cv2 grayscale images so the colored lines stand out)."""
    img = np.asarray(img)
    gray = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    return np.repeat(gray[..., None], 3, axis=2).astype(np.uint8)


def draw_correspondence_panel(rgb_a, rgb_b, uv_a, uv_b, ax=None, title=None,
                              gray: bool = True):
    """Side-by-side image pair with colored lines joining correspondences —
    the cv2.drawMatches equivalent (reference evaluation.py:1412-1418) built
    on matplotlib so it runs headless without OpenCV.

    :param uv_a, uv_b: [N, 2] pixel coords, uv_b in image-b frame
    :return: the matplotlib Axes
    """
    plt = _plt()
    rgb_a, rgb_b = np.asarray(rgb_a), np.asarray(rgb_b)
    Ha, Wa = rgb_a.shape[:2]
    Hb, Wb = rgb_b.shape[:2]
    H = max(Ha, Hb)
    panel = np.zeros((H, Wa + Wb, 3), np.uint8)
    panel[:Ha, :Wa] = _to_gray_rgb(rgb_a) if gray else rgb_a
    panel[:Hb, Wa:] = _to_gray_rgb(rgb_b) if gray else rgb_b

    if ax is None:
        fig, ax = plt.subplots(figsize=(15, 6))
    ax.imshow(panel)
    uv_a = np.atleast_2d(np.asarray(uv_a, np.float64))
    uv_b = np.atleast_2d(np.asarray(uv_b, np.float64))
    cmap = plt.get_cmap("hsv")
    n = max(len(uv_a), 1)
    for i, ((ua, va), (ub, vb)) in enumerate(zip(uv_a, uv_b)):
        c = cmap(i / n)
        ax.plot([ua, ub + Wa], [va, vb], color=c, linewidth=1.0)
        ax.scatter([ua, ub + Wa], [va, vb], color=c, s=12)
    ax.set_axis_off()
    if title:
        ax.set_title(title)
    return ax


def plot_descriptor_colormaps(res_a, res_b, descriptor_image_stats=None,
                              mask_a=None, mask_b=None, plot_masked=False,
                              descriptor_norm_type="mask_image"):
    """RGB colormap figure of a descriptor-image pair, optionally with
    masked variants (reference evaluation.py:530-602). D must be 1 or 3.

    :return: matplotlib Figure
    """
    plt = _plt()
    res_a, res_b = np.asarray(res_a), np.asarray(res_b)
    nrows = 2 if plot_masked else 1
    fig, axes = plt.subplots(nrows=nrows, ncols=2, squeeze=False,
                             figsize=(15, 5 * nrows))

    if descriptor_image_stats is None:
        res_a_norm, res_b_norm = normalize_descriptor_pair(res_a, res_b)
    else:
        res_a_norm = normalize_descriptor(res_a, descriptor_image_stats[descriptor_norm_type])
        res_b_norm = normalize_descriptor(res_b, descriptor_image_stats[descriptor_norm_type])

    axes[0][0].imshow(np.squeeze(res_a_norm))
    axes[0][1].imshow(np.squeeze(res_b_norm))
    axes[0][0].set_title("descriptor image a")
    axes[0][1].set_title("descriptor image b")

    if plot_masked:
        assert mask_a is not None and mask_b is not None
        mask_a = (np.asarray(mask_a) != 0)
        mask_b = (np.asarray(mask_b) != 0)
        ma = mask_a[..., None].astype(res_a.dtype)
        mb = mask_b[..., None].astype(res_b.dtype)
        if descriptor_image_stats is None:
            # joint min/max over the masked pixels only (reference
            # normalize_masked_descriptor_pair, plotting.py:77-116)
            both = np.concatenate([
                res_a[mask_a].reshape(-1, res_a.shape[-1]),
                res_b[mask_b].reshape(-1, res_b.shape[-1]),
            ], axis=0)
            stats = {"min": both.min(axis=0), "max": both.max(axis=0)}
            res_a_nm = normalize_descriptor(res_a, stats) * ma
            res_b_nm = normalize_descriptor(res_b, stats) * mb
        else:
            res_a_nm = normalize_descriptor(res_a * ma, descriptor_image_stats["mask_image"]) * ma
            res_b_nm = normalize_descriptor(res_b * mb, descriptor_image_stats["mask_image"]) * mb
        axes[1][0].imshow(np.squeeze(res_a_nm))
        axes[1][1].imshow(np.squeeze(res_b_nm))
        axes[1][0].set_title("masked descriptor image a")
        axes[1][1].set_title("masked descriptor image b")
    for row in axes:
        for ax in row:
            ax.set_axis_off()
    return fig


def single_image_pair_qualitative_analysis(dcn, dataset, rgb_a, rgb_b,
                                           mask_a, mask_b, num_matches: int = 10,
                                           rng_key=None):
    """Sampled-pixel best-match panel + descriptor colormaps for one image
    pair (reference evaluation.py:1347-1430). Returns (match_fig,
    colormap_fig_or_None)."""
    plt = _plt()
    if rng_key is None:
        rng_key = jax.random.PRNGKey(1)

    res_a = dcn.forward_on_img(rgb_a)
    res_b = dcn.forward_on_img(rgb_b)

    uv_a, ok = sample_from_mask(rng_key, jnp.asarray(mask_a), num_matches)
    uv_a = np.asarray(uv_a)
    if not bool(ok):
        logger.warning("empty mask; sampling uniformly for qualitative plot")
    queries = np.asarray(res_a)[uv_a[:, 1], uv_a[:, 0], :]
    best_uv, _ = best_matches_batch(jnp.asarray(queries), res_b)
    best_uv = np.asarray(best_uv)

    fig, ax = plt.subplots(figsize=(15, 10))
    draw_correspondence_panel(rgb_a, rgb_b, uv_a, best_uv, ax=ax,
                              title="sampled pixels -> best matches")

    cfig = None
    if dcn.descriptor_dimension in (1, 3):
        try:
            stats = dcn.descriptor_image_stats
        except Exception:
            logger.info("no descriptor image stats; normalizing pair only")
            stats = None
        cfig = plot_descriptor_colormaps(
            np.asarray(res_a), np.asarray(res_b), descriptor_image_stats=stats,
            mask_a=mask_a, mask_b=mask_b, plot_masked=True,
        )
    return fig, cfig


def single_same_scene_image_pair_qualitative_analysis(dcn, dataset, scene_name,
                                                      img_a_idx, img_b_idx,
                                                      num_matches: int = 10,
                                                      rng_key=None):
    """Reference evaluation.py:1203-1227."""
    rgb_a, _, mask_a, _ = dataset.get_rgbd_mask_pose(scene_name, img_a_idx)
    rgb_b, _, mask_b, _ = dataset.get_rgbd_mask_pose(scene_name, img_b_idx)
    return single_image_pair_qualitative_analysis(
        dcn, dataset, rgb_a, rgb_b, mask_a, mask_b, num_matches, rng_key)


def single_cross_scene_image_pair_qualitative_analysis(dcn, dataset,
                                                       scene_name_a, img_a_idx,
                                                       scene_name_b, img_b_idx,
                                                       num_matches: int = 10,
                                                       rng_key=None):
    """Reference evaluation.py:1229-1254."""
    rgb_a, _, mask_a, _ = dataset.get_rgbd_mask_pose(scene_name_a, img_a_idx)
    rgb_b, _, mask_b, _ = dataset.get_rgbd_mask_pose(scene_name_b, img_b_idx)
    return single_image_pair_qualitative_analysis(
        dcn, dataset, rgb_a, rgb_b, mask_a, mask_b, num_matches, rng_key)


def single_image_pair_keypoint_qualitative_analysis(
        dcn, dataset, keypoint_data_a, keypoint_data_b,
        heatmap_kernel_variance: float = 0.25,
        blend_weight_original_image: float = 0.3,
        plot_title: str = "Keypoints"):
    """Keypoint best-match panel + Gaussian-heatmap blend (reference
    evaluation.py:1257-1345). ``keypoint_data_*`` are dicts with scene_name,
    image_idx, u, v. Returns the Figure."""
    plt = _plt()

    def clip(uv):
        return dcn.clip_pixel_to_image_size_and_round(uv)

    uv_a = clip((keypoint_data_a["u"], keypoint_data_a["v"]))
    uv_b = clip((keypoint_data_b["u"], keypoint_data_b["v"]))

    rgb_a, _, _, _ = dataset.get_rgbd_mask_pose(
        keypoint_data_a["scene_name"], keypoint_data_a["image_idx"])
    rgb_b, _, _, _ = dataset.get_rgbd_mask_pose(
        keypoint_data_b["scene_name"], keypoint_data_b["image_idx"])

    res_a = dcn.forward_on_img(rgb_a)
    res_b = dcn.forward_on_img(rgb_b)

    best_uv, best_diff, norm_diffs = dcn.find_best_match(uv_a, res_a, res_b)
    best_uv = np.asarray(best_uv)

    fig, axes = plt.subplots(nrows=2, ncols=1, figsize=(15, 10))
    draw_correspondence_panel(rgb_a, rgb_b, [uv_a], [best_uv], ax=axes[0],
                              title=plot_title)
    # annotate the human-labeled target in image b for comparison
    axes[0].scatter([uv_b[0] + np.asarray(rgb_a).shape[1]], [uv_b[1]],
                    marker="x", color="lime", s=60, label="labeled target")
    axes[0].legend(loc="lower right")

    heatmap = compute_gaussian_kernel_heatmap_from_norm_diffs(
        np.asarray(norm_diffs), heatmap_kernel_variance)
    alpha = blend_weight_original_image
    blended = (alpha * np.asarray(rgb_b, np.float32)
               + (1 - alpha) * np.asarray(heatmap, np.float32))
    axes[1].imshow(blended.astype(np.uint8))
    axes[1].set_axis_off()
    axes[1].set_title("best-match heatmap")
    return fig


def get_random_scenes_and_image_pairs(dataset, num_pairs: int = 5):
    """Random (scene, (idx_a, idx_b)) pose-separated pairs (reference
    evaluation.py:1180-1201)."""
    scene_names, img_pairs = [], []
    for _ in range(num_pairs):
        scene_name = dataset.get_random_scene_name()
        scene = dataset.get_scene(scene_name)
        idx_a = dataset.get_random_image_index(scene_name)
        idx_b = dataset.get_img_idx_with_different_pose(
            scene_name, scene.poses[scene.position(idx_a)])
        if idx_b is None:
            continue
        scene_names.append(scene_name)
        img_pairs.append((idx_a, idx_b))
    return scene_names, img_pairs


def evaluate_network_qualitative(dcn, dataset, num_image_pairs: int = 5,
                                 output_dir: Optional[str] = None,
                                 scene_image_pairs: Optional[list] = None,
                                 num_matches: int = 10, seed: int = 1):
    """Orchestrated qualitative evaluation (reference evaluation.py:1979-2070):
    for the train and test splits, sample ``num_image_pairs`` pose-separated
    pairs and write a best-match panel + descriptor colormaps for each.

    :param scene_image_pairs: optional explicit [(scene, idx_a, idx_b), ...]
        (the reference hardcodes caterpillar/drill frame ids; pass your own)
    :return: dict mode -> list of written PNG paths (or in-memory figure
        count when ``output_dir`` is None)
    """
    plt = _plt()
    written = {}
    key = jax.random.PRNGKey(seed)
    original_mode = dataset.mode
    try:
        for mode in ("train", "test"):
            dataset.mode = mode
            if scene_image_pairs is not None:
                pairs = scene_image_pairs
            else:
                names, idxs = get_random_scenes_and_image_pairs(dataset, num_image_pairs)
                pairs = [(n, a, b) for n, (a, b) in zip(names, idxs)]
            files = []
            for i, (scene_name, idx_a, idx_b) in enumerate(pairs):
                key, sub = jax.random.split(key)
                fig, cfig = single_same_scene_image_pair_qualitative_analysis(
                    dcn, dataset, scene_name, idx_a, idx_b,
                    num_matches=num_matches, rng_key=sub)
                if output_dir is not None:
                    os.makedirs(os.path.join(output_dir, mode), exist_ok=True)
                    p = os.path.join(output_dir, mode, f"qual_{i:02d}_matches.png")
                    fig.savefig(p, bbox_inches="tight")
                    files.append(p)
                    if cfig is not None:
                        p2 = os.path.join(output_dir, mode, f"qual_{i:02d}_descriptors.png")
                        cfig.savefig(p2, bbox_inches="tight")
                        files.append(p2)
                plt.close(fig)
                if cfig is not None:
                    plt.close(cfig)
            written[mode] = files
    finally:
        dataset.mode = original_mode
    return written


def make_2d_cluster_plot(dcn, dataset, num_images: int = 100,
                         num_samples_per_image: int = 100,
                         plot_background: bool = False,
                         output_dir: Optional[str] = None, seed: int = 19680801):
    """Object-labeled scatter plot of sampled descriptors (reference
    evaluation.py:2466-2620). For D=3, writes xy/yz/xz projections; for D=2 a
    single plot. Descriptor gathers are vectorized (the reference loops per
    sample).

    :return: dict object_id -> [N, D] sampled descriptors (+ 'background'
        when ``plot_background``), after writing cluster_plot_*.png
    """
    assert dcn.descriptor_dimension in (2, 3), "projection needed for D > 3"
    plt = _plt()
    key = jax.random.PRNGKey(seed)
    num_objects = max(dataset.get_number_of_unique_single_objects(), 1)

    samples = {}
    background = []
    for _ in range(num_images):
        object_id, _ = dataset.get_random_object_id_and_int()
        scene_name = dataset.get_random_single_object_scene_name(object_id)
        img_idx = dataset.get_random_image_index(scene_name)
        rgb, _, mask, _ = dataset.get_rgbd_mask_pose(scene_name, img_idx)
        res = np.asarray(dcn.forward_on_img(rgb))

        key, k1, k2 = jax.random.split(key, 3)
        mask = jnp.asarray(mask)
        uv_obj, ok_obj = sample_from_mask(k1, mask, num_samples_per_image)
        uv_bg, ok_bg = sample_from_mask(
            k2, 1 - (mask != 0).astype(jnp.uint8),
            max(num_samples_per_image // num_objects, 1))
        if bool(ok_obj):
            uv = np.asarray(uv_obj)
            d = res[uv[:, 1], uv[:, 0], :]
            samples.setdefault(object_id, []).append(d)
        if plot_background and bool(ok_bg):
            uv = np.asarray(uv_bg)
            background.append(res[uv[:, 1], uv[:, 0], :])

    samples = {k: np.concatenate(v, axis=0) for k, v in samples.items()}
    if plot_background and background:
        samples["background"] = np.concatenate(background, axis=0)

    if dcn.descriptor_dimension == 2:
        projections = [((0, 1), "xy")]
    else:
        projections = [((0, 1), "xy"), ((1, 2), "yz"), ((0, 2), "xz")]

    files = []
    for (i, j), tag in projections:
        fig, ax = plt.subplots(figsize=(8, 8))
        for object_id, d in samples.items():
            ax.scatter(d[:, i], d[:, j], alpha=0.5, label=object_id, s=8)
        ax.legend()
        ax.set_xlabel(f"descriptor[{i}]")
        ax.set_ylabel(f"descriptor[{j}]")
        ax.set_title(f"descriptor clusters ({tag})")
        if output_dir is not None:
            os.makedirs(output_dir, exist_ok=True)
            p = os.path.join(output_dir, f"cluster_plot_{tag}.png")
            fig.savefig(p, bbox_inches="tight")
            files.append(p)
        plt.close(fig)
    return samples
