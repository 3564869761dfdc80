"""Live correspondence heatmap explorer.

Rebuild of ``modules/user-interaction-heatmap-visualization/
live_heatmap_visualization.py:38-371``: load one or more trained networks,
show a random image pair, and on mouse-move find the best match for the pixel
under the cursor in the other image, blending a Gaussian descriptor-distance
heatmap over it. Keyboard: n = new pair, s = swap source/target, q = quit.

TPU-first difference: descriptor images AND per-query norm-diff/heatmap/argmin
all stay on device; the host only receives the final [H, W] heatmap and the
best-match pixel per event (the reference round-trips full descriptor images
to numpy per frame, dense_correspondence_network.py:488-525).

The cv2 UI is host-side and optional; :class:`HeatmapEngine` (pure compute)
is importable headless for tests.
"""

from __future__ import annotations

import logging
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


class HeatmapEngine:
    """Headless core: precomputed descriptor images + per-pixel queries."""

    def __init__(self, dcns: List, variance: float = 0.03):
        self._dcns = dcns
        self._variance = variance
        self._res_a = None
        self._res_b = None

        @jax.jit
        def query(res_a, res_b, u, v, variance):
            d = res_a[v, u]
            nd = jnp.sqrt(jnp.maximum(
                jnp.sum(jnp.square(res_b - d), axis=-1), 0.0))
            flat = jnp.argmin(nd.reshape(-1))
            W = res_b.shape[1]
            best_uv = jnp.stack([flat % W, flat // W])
            heat = jnp.exp(-nd / variance)
            return best_uv, nd.reshape(-1)[flat], heat

        self._query = query

    def set_images(self, rgb_a, rgb_b):
        """Forward both images through every network (stays on device)."""
        self._res_a = [dcn.forward_on_img(rgb_a) for dcn in self._dcns]
        self._res_b = [dcn.forward_on_img(rgb_b) for dcn in self._dcns]

    def swap(self):
        self._res_a, self._res_b = self._res_b, self._res_a

    def find_best_match(self, u: int, v: int, reverse: bool = False):
        """Best match + heatmap for the pixel (u, v) per network.

        :return: list of (best_uv [2] np, best_diff float, heatmap [H,W] np)
        """
        src = self._res_b if reverse else self._res_a
        dst = self._res_a if reverse else self._res_b
        out = []
        for res_a, res_b in zip(src, dst):
            best_uv, diff, heat = self._query(res_a, res_b, u, v, self._variance)
            out.append((np.asarray(best_uv), float(diff), np.asarray(heat)))
        return out


def compose_target_panel(tgt_bgr, heat, best_uv):
    """The target-window composite the interactive loop shows: 50/50 blend
    of the target frame with the grayscale heat image, red reticle on the
    best match (reference live_heatmap_visualization.py:254-331). Split out
    of the cv2 event loop so the visual output is golden-testable headless
    (tests/test_qualitative_goldens.py).

    :param tgt_bgr: [H, W, 3] uint8 target frame (BGR)
    :param heat: [H, W] float heat in [0, 1] (HeatmapEngine query output)
    :return: [H, W, 3] uint8 BGR panel
    """
    from pdc_tpu.utils.visualization import draw_reticle

    heat = np.asarray(heat, np.float64)
    heat_color = (np.stack([heat] * 3, -1) * 255).astype(np.uint8)
    try:
        import cv2

        blended = cv2.addWeighted(np.asarray(tgt_bgr), 0.5, heat_color,
                                  0.5, 0)
    except ImportError:
        # addWeighted rounds half away from zero; match it exactly
        blended = np.floor(
            0.5 * np.asarray(tgt_bgr, np.float64)
            + 0.5 * heat_color.astype(np.float64) + 0.5).astype(np.uint8)
    return draw_reticle(blended, int(best_uv[0]), int(best_uv[1]),
                        (0, 0, 255))


class HeatmapVisualization:
    """cv2 UI wrapper (reference HeatmapVisualization)."""

    def __init__(self, dataset, model_folders: List[str], variance: float = 0.03,
                 quantize: bool = False):
        from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

        self._dataset = dataset
        self._dcns = [DenseCorrespondenceNetwork.from_model_folder(f) for f in model_folders]
        if quantize:  # int8 PTQ serving forwards (DCN.quantized)
            self._dcns = [d.quantized() for d in self._dcns]
        self._engine = HeatmapEngine(self._dcns, variance)
        self._rgb_a = self._rgb_b = None

    @staticmethod
    def from_config(dataset, config: dict, networks_root: str = "trained_models"):
        """Build from a heatmap_vis config (configs/heatmap_vis.yaml, same
        schema as the reference's heatmap.yaml: 'networks' name list +
        'kernel_variance'; pdc_tpu extra: 'quantize_int8' serves the int8
        PTQ forward)."""
        import os

        folders = [os.path.join(networks_root, n) for n in config["networks"]]
        return HeatmapVisualization(
            dataset, folders, variance=float(config.get("kernel_variance", 0.25)),
            quantize=bool(config.get("quantize_int8", False)),
        )

    def _get_new_images(self):
        pair = self._dataset.sample_pair()
        self._rgb_a, self._rgb_b = pair.rgb_a, pair.rgb_b
        self._engine.set_images(self._rgb_a, self._rgb_b)

    def run(self):  # pragma: no cover - interactive
        import cv2

        from pdc_tpu.utils.visualization import (
            compute_gaussian_kernel_heatmap_from_norm_diffs,
            draw_reticle,
        )

        self._get_new_images()
        cv2.namedWindow("source")
        cv2.namedWindow("target")

        state = {"uv": (0, 0)}

        def on_mouse(event, u, v, flags, param):
            state["uv"] = (u, v)
            results = self._engine.find_best_match(u, v)
            src = cv2.cvtColor(self._rgb_a, cv2.COLOR_RGB2BGR)
            draw_reticle(src, u, v)
            cv2.imshow("source", src)
            best_uv, _, heat = results[0]
            tgt = cv2.cvtColor(self._rgb_b, cv2.COLOR_RGB2BGR)
            blended = compose_target_panel(tgt, heat, best_uv)
            cv2.imshow("target", blended)

        cv2.setMouseCallback("source", on_mouse)
        while True:
            k = cv2.waitKey(20) & 0xFF
            if k == ord("q"):
                break
            if k == ord("n"):
                self._get_new_images()
            if k == ord("s"):
                self._engine.swap()
                self._rgb_a, self._rgb_b = self._rgb_b, self._rgb_a
        cv2.destroyAllWindows()


class GraspPointStream:
    """Batched manipulation inference (BASELINE config 5): track a set of
    stored grasp-point descriptors over a stream of frames.

    Generalizes the reference's ``find_best_match_for_descriptor``
    (dense_correspondence_network.py:527-550) to Q stored descriptors x one
    jitted matmul-argmin per frame.
    """

    def __init__(self, dcn, grasp_descriptors):
        self._dcn = dcn
        self._queries = jnp.asarray(grasp_descriptors, jnp.float32)  # [Q, D]
        mean = jnp.asarray(dcn.image_mean, jnp.float32)
        std = jnp.asarray(dcn.image_std_dev, jnp.float32)

        @jax.jit
        def process(variables, rgb_u8, queries):
            x = (rgb_u8.astype(jnp.float32) / 255.0 - mean) / std
            res = dcn.module.apply(variables, x[None], train=False)[0]
            H, W, D = res.shape
            flat = res.reshape(H * W, D)
            rnorm = jnp.sum(jnp.square(flat), axis=1)
            cross = jnp.dot(flat, queries.T, preferred_element_type=jnp.float32)
            d2 = rnorm[:, None] - 2 * cross + jnp.sum(jnp.square(queries), axis=1)
            idx = jnp.argmin(d2, axis=0)
            best = jnp.sqrt(jnp.maximum(
                jnp.take_along_axis(d2, idx[None], axis=0)[0], 0.0))
            uv = jnp.stack([idx % W, idx // W], axis=-1)
            return uv, best

        self._process = process

    def process_frame(self, rgb_u8):
        """:return: (uv [Q, 2] np.int32, dist [Q] np.float32)"""
        uv, dist = self._process(self._dcn.variables, jnp.asarray(rgb_u8), self._queries)
        return np.asarray(uv), np.asarray(dist)
