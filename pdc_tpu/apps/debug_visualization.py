"""Annotation-QA replay viewer + dataset sampling debug panels.

Two eyeball-verification tools the reference treats as first-class
workflows:

* :func:`visualize_saved_correspondences` — replays a saved
  ``new_annotated_pairs.yaml`` with per-pair colored reticles, the companion
  reviewer of the annotation labeler
  (``modules/.../simple_pixel_correspondence_labeler/
  visualize_saved_correspondences.py:1-71``; n = next pair, q/ESC = quit).
* :func:`debug_batch_panels` — renders what the REAL device assembler
  sampled for a batch: matches, masked/background non-matches, blind
  non-matches, and the four mask panels — the reference's
  ``SpartanDataset(debug=True)`` mode (``spartan_dataset_masked.py:73-84``
  and ``:772-835``), which ``doc/testing.md:1-9`` recommends as the first
  check when training misbehaves.

Both run headless (PNG artifacts) by default so they work over SSH and in
CI; the replay viewer also has an interactive cv2 loop.
"""

from __future__ import annotations

import os
from typing import List, Optional, Union

import numpy as np

from pdc_tpu.apps.annotate_correspondences import LABEL_COLORS
from pdc_tpu.utils.yaml_io import load_yaml

# matplotlib color cycle for the panel overlays (reference debug mode uses
# g/r/b/k circles, spartan_dataset_masked.py:790-835)
_MATCH_COLOR = "g"
_MASKED_NM_COLOR = "r"
_BACKGROUND_NM_COLOR = "b"
_BLIND_NM_COLOR = "k"


def _annotated_pair_images(dataset, ann: dict):
    """(img_a, img_b) uint8 RGB copies with reticles drawn for one saved
    annotation entry."""
    from pdc_tpu.utils.visualization import draw_reticle

    out = []
    for side in ("image_a", "image_b"):
        e = ann[side]
        rgb = np.array(
            dataset.get_rgbd_mask_pose(e["scene_name"], int(e["image_idx"]))[0],
            dtype=np.uint8, copy=True)
        for i, px in enumerate(e["pixels"]):
            rgb = draw_reticle(rgb, int(px["u"]), int(px["v"]),
                               LABEL_COLORS[i % len(LABEL_COLORS)])
        out.append(rgb)
    return out[0], out[1]


def visualize_saved_correspondences(
        dataset, annotations: Union[str, List[dict]],
        output_dir: Optional[str] = None, interactive: bool = False):
    """Replay saved annotated pairs with colored reticles.

    :param annotations: path to ``new_annotated_pairs.yaml`` or the loaded
        list (the labeler's on-disk format)
    :param output_dir: directory for the ``pair_%03d_{a,b}.png`` artifacts
        (headless mode; defaults to the current directory)
    :param interactive: cv2 windows with the reference's keyboard protocol
        (n = next pair, wrapping; q/ESC = quit) — nothing is written
    :return: list of written file paths (headless mode)
    """
    if isinstance(annotations, str):
        annotations = load_yaml(annotations)
    if not annotations:
        return []

    if interactive:  # pragma: no cover - interactive cv2 UI
        import cv2

        idx = 0
        while True:
            img_a, img_b = _annotated_pair_images(dataset, annotations[idx])
            cv2.imshow("image1", cv2.cvtColor(img_a, cv2.COLOR_RGB2BGR))
            cv2.imshow("image2", cv2.cvtColor(img_b, cv2.COLOR_RGB2BGR))
            k = cv2.waitKey(0) & 0xFF
            if k in (27, ord("q")):
                break
            if k == ord("n"):
                idx = (idx + 1) % len(annotations)
        cv2.destroyAllWindows()
        return []

    from PIL import Image

    paths = []
    if output_dir is None:
        output_dir = "."
    os.makedirs(output_dir, exist_ok=True)
    for j, ann in enumerate(annotations):
        img_a, img_b = _annotated_pair_images(dataset, ann)
        for tag, img in (("a", img_a), ("b", img_b)):
            path = os.path.join(output_dir, f"pair_{j:03d}_{tag}.png")
            Image.fromarray(img).save(path)
            paths.append(path)
    return paths


def _subsample(uv_a, uv_b, valid, n, rng):
    """Random subset of valid rows (reference subsample_tuple_pair,
    spartan_dataset_masked.py:1285-1302)."""
    idx = np.where(np.asarray(valid))[0]
    if idx.size == 0:
        return np.zeros((0, 2)), np.zeros((0, 2))
    pick = rng.choice(idx, size=min(n, idx.size), replace=False)
    return np.asarray(uv_a)[pick], np.asarray(uv_b)[pick]


def _flat_to_uv(flat, W):
    flat = np.asarray(flat)
    return np.stack([flat % W, flat // W], axis=-1)


def detect_flip(flat_idx, valid, mask):
    """Was this image 180-flipped by augmentation after ``mask`` was read?
    Matches are sampled on the object, so the orientation whose mask covers
    more matched pixels is the indices' frame (a flat 180 flip is index
    reversal)."""
    valid = np.asarray(valid)
    if not valid.any():
        return False
    m = np.asarray(mask).reshape(-1) != 0
    hit = np.zeros(m.size, bool)
    hit[np.asarray(flat_idx)[valid]] = True
    return bool((hit & m[::-1]).sum() > (hit & m).sum())


def debug_batch_panels(dataset, num_pairs: int, output_dir: str,
                       seed: int = 0, cfg=None,
                       num_matches_to_plot: int = 10,
                       match_type: Optional[int] = None):
    """Render the assembler's actual sampling for ``num_pairs`` pairs.

    Per pair, four correspondence panels (PNG) mirroring the reference's
    debug plots (spartan_dataset_masked.py:790-835): ground-truth matches
    (green), masked non-matches (red) and background non-matches (blue) each
    overlaid on the matches, blind non-matches (black) — plus a mask figure
    (object mask, background mask, matched-pixel mask, unmatched-pixel
    mask). Runs the REAL device assembler (`assemble_sample`), so what you
    see is exactly what the loss consumes, flips and all.

    :return: list of (match_type, [png paths]) per pair
    """
    import jax

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pdc_tpu.data.assembler import AssemblerConfig, assemble_sample
    from pdc_tpu.ops.plotter import plot_correspondences_direct

    if cfg is None:
        # small counts: these are eyeball plots, not training samples
        cfg = AssemblerConfig(num_matching_attempts=500,
                              num_masked_non_matches_per_match=3,
                              num_background_non_matches_per_match=3,
                              num_blind_samples=200)
    os.makedirs(output_dir, exist_ok=True)
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)

    from pdc_tpu.data.assembler import assemble_synthetic_multi_object_sample

    def pair_dict(p):
        return {"rgb_a": p.rgb_a, "depth_a": p.depth_a, "mask_a": p.mask_a,
                "pose_a": p.pose_a, "rgb_b": p.rgb_b, "depth_b": p.depth_b,
                "mask_b": p.mask_b, "pose_b": p.pose_b, "K": p.K}

    results = []
    for p in range(num_pairs):
        pair = dataset.sample_pair(match_type)
        key, sub = jax.random.split(key)
        if pair.second is not None:  # SYNTHETIC_MULTI_OBJECT compositing
            img_a, img_b, s = assemble_synthetic_multi_object_sample(
                sub, pair_dict(pair), pair_dict(pair.second), cfg)
        else:
            img_a, img_b, s = assemble_sample(
                sub, pair.rgb_a, pair.depth_a, pair.mask_a, pair.pose_a,
                pair.rgb_b, pair.depth_b, pair.mask_b, pair.pose_b,
                pair.K, np.int32(pair.match_type), cfg)
        H, W = np.asarray(pair.depth_a).shape

        # de-normalize for display (the assembler may have flipped/domain-
        # randomized the images; indices refer to THESE pixels)
        mean = np.asarray(cfg.image_mean, np.float32)
        std = np.asarray(cfg.image_std, np.float32)
        disp_a = np.clip((np.asarray(img_a) * std + mean) * 255, 0, 255
                         ).astype(np.uint8)
        disp_b = np.clip((np.asarray(img_b) * std + mean) * 255, 0, 255
                         ).astype(np.uint8)
        depth_a = np.asarray(pair.depth_a)
        depth_b = np.asarray(pair.depth_b)

        uv_m_a = _flat_to_uv(s.matches_a, W)
        uv_m_b = _flat_to_uv(s.matches_b, W)
        m_valid = np.asarray(s.matches_valid)

        # the assembler may have 180-flipped either image AFTER the raw
        # frames were read: indices (and disp_*) are post-flip, the raw
        # depth/mask arrays pre-flip — align the displayed arrays to the
        # indices' frame. Match indices carry the flip signal for
        # within-scene types; match-less types (across-scene/different-
        # object) fall back to the blind sets, which are sampled on the
        # masks too.
        def side_flip(primary, primary_valid, fallback, fallback_valid, mask):
            if np.asarray(primary_valid).any():
                return detect_flip(primary, primary_valid, mask)
            return detect_flip(fallback, fallback_valid, mask)

        flip_a = side_flip(s.matches_a, m_valid,
                           s.blind_nm_a, s.blind_nm_valid, pair.mask_a)
        flip_b = side_flip(s.matches_b, m_valid,
                           s.blind_nm_b, s.blind_nm_valid, pair.mask_b)
        if flip_a:
            depth_a = depth_a[::-1, ::-1]
        if flip_b:
            depth_b = depth_b[::-1, ::-1]

        paths = []

        def panel(name, uv2_a, uv2_b, color):
            fig, axes = plot_correspondences_direct(
                disp_a, depth_a, disp_b, depth_b,
                *_subsample(uv_m_a, uv_m_b, m_valid, num_matches_to_plot,
                            rng),
                show=False)
            plot_correspondences_direct(
                disp_a, depth_a, disp_b, depth_b, uv2_a, uv2_b,
                use_previous_plot=(fig, axes), circ_color=color, show=False)
            path = os.path.join(output_dir, f"pair_{p:03d}_{name}.png")
            fig.savefig(path)
            plt.close(fig)
            paths.append(path)

        panel("matches", np.zeros((0, 2)), np.zeros((0, 2)), _MATCH_COLOR)
        panel("masked_non_matches",
              *_subsample(_flat_to_uv(s.masked_nm_a, W),
                          _flat_to_uv(s.masked_nm_b, W),
                          s.masked_nm_valid, num_matches_to_plot * 3, rng),
              _MASKED_NM_COLOR)
        panel("background_non_matches",
              *_subsample(_flat_to_uv(s.background_nm_a, W),
                          _flat_to_uv(s.background_nm_b, W),
                          s.background_nm_valid, num_matches_to_plot * 3,
                          rng),
              _BACKGROUND_NM_COLOR)
        panel("blind_non_matches",
              *_subsample(_flat_to_uv(s.blind_nm_a, W),
                          _flat_to_uv(s.blind_nm_b, W),
                          s.blind_nm_valid, num_matches_to_plot * 10, rng),
              _BLIND_NM_COLOR)

        # mask panels (spartan_dataset_masked.py:817-835), in the indices'
        # (post-flip) frame
        matched = np.zeros(H * W, bool)
        matched[np.asarray(s.matches_a)[m_valid]] = True
        mask_a = np.asarray(pair.mask_a) != 0
        if flip_a:
            mask_a = mask_a[::-1, ::-1]
        fig, axes = plt.subplots(2, 2, figsize=(10, 8))
        axes[0, 0].imshow(mask_a)
        axes[0, 0].set_title("mask of img a object pixels")
        axes[0, 1].imshow(~mask_a)
        axes[0, 1].set_title("mask of img a background")
        axes[1, 0].imshow(matched.reshape(H, W))
        axes[1, 0].set_title("img a pixels with a match")
        axes[1, 1].imshow(matched.reshape(H, W) ^ (matched.reshape(H, W) |
                                                   mask_a))
        axes[1, 1].set_title("img a object pixels with NO match")
        for ax in axes.flat:
            ax.axis("off")
        path = os.path.join(output_dir, f"pair_{p:03d}_masks.png")
        fig.savefig(path)
        plt.close(fig)
        paths.append(path)

        results.append((int(pair.match_type), paths))
    return results


def main():  # pragma: no cover - CLI
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    v = sub.add_parser("view", help="replay saved annotated pairs")
    v.add_argument("--config", required=True, help="composite dataset yaml")
    v.add_argument("--annotations", default="new_annotated_pairs.yaml")
    v.add_argument("--out", default=None, help="write PNGs here (headless)")
    v.add_argument("--interactive", action="store_true")
    d = sub.add_parser("debug", help="render assembler debug panels")
    d.add_argument("--config", required=True)
    d.add_argument("--num_pairs", type=int, default=4)
    d.add_argument("--out", default="debug_panels")
    d.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.utils.yaml_io import load_yaml as _load

    dataset = SpartanDataset(config=_load(args.config))
    if args.cmd == "view":
        visualize_saved_correspondences(dataset, args.annotations,
                                        output_dir=args.out,
                                        interactive=args.interactive)
    else:
        debug_batch_panels(dataset, args.num_pairs, args.out, seed=args.seed)


if __name__ == "__main__":  # pragma: no cover
    main()
