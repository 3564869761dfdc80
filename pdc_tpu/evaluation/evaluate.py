"""Quantitative evaluation engine.

Rebuild of ``evaluation.py:89-2620`` (DenseCorrespondenceEvaluation). The
reference computes per-match statistics one pixel at a time in numpy after
pulling descriptor images off the GPU; here ALL matches of an image pair are
evaluated in one on-device program built around a [HW, N] distance matrix
(one MXU matmul), then dumped to a pandas DataFrame with the reference's
exact 23-column schema (``evaluation.py:37-61``) so downstream CSV/plot
tooling is drop-in compatible.
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pdc_tpu.geom.camera import unproject_to_camera
from pdc_tpu.geom.transforms import transform_points
from pdc_tpu.ops.correspondence import find_pixel_correspondences
from pdc_tpu.utils.constants import DEPTH_IM_SCALE
from pdc_tpu.utils.yaml_io import save_yaml

logger = logging.getLogger(__name__)

# the reference's 23-column per-match schema (evaluation.py:37-61)
EVAL_COLUMNS = [
    "scene_name", "scene_name_a", "scene_name_b", "object_id_a", "object_id_b",
    "img_a_idx", "img_b_idx", "is_valid", "is_valid_masked",
    "norm_diff_descriptor_ground_truth", "norm_diff_descriptor",
    "norm_diff_descriptor_masked", "norm_diff_ground_truth_3d",
    "norm_diff_pred_3d", "norm_diff_pred_3d_masked",
    "pixel_match_error_l2", "pixel_match_error_l2_masked",
    "pixel_match_error_l1", "fraction_pixels_closer_than_ground_truth",
    "fraction_pixels_closer_than_ground_truth_masked",
    "average_l2_distance_for_false_positives",
    "average_l2_distance_for_false_positives_masked", "keypoint_name",
]

ACROSS_OBJECT_COLUMNS = [
    "scene_name_a", "scene_name_b", "img_a_idx", "img_b_idx",
    "object_id_a", "object_id_b", "norm_diff_descriptor_best_match",
]


@jax.jit
def _match_statistics_device(depth_a, depth_b, mask_b, uv_a, uv_b,
                             pose_a, pose_b, res_a, res_b, K, K_b=None):
    """All per-match statistics for one image pair, vectorized over N matches.

    Mirrors ``compute_descriptor_match_statistics`` (evaluation.py:1006-1178)
    exactly, including the masked-argmin trick (norm_diffs + (1-mask)*1e6)
    and the Schmidt et al. fraction-closer-than-ground-truth metric — but as
    one [HW, N] distance-matrix program instead of a python loop.

    :param uv_a, uv_b: [N, 2] int32 ground-truth correspondences
    :param K: intrinsics of camera a (and of camera b when ``K_b`` is None —
        the same-scene case). Cross-scene pairs from cameras with different
        intrinsics pass ``K_b`` so side-b unprojections are exact.
    :return: dict of [N] arrays
    """
    if K_b is None:
        K_b = K
    H, W, D = res_a.shape
    N = uv_a.shape[0]
    HW = H * W

    res_b_flat = res_b.reshape(HW, D).astype(jnp.float32)
    queries = res_a[uv_a[:, 1], uv_a[:, 0], :].astype(jnp.float32)  # [N, D]

    rnorm = jnp.sum(jnp.square(res_b_flat), axis=1)  # [HW]
    qnorm = jnp.sum(jnp.square(queries), axis=1)  # [N]
    # precision=HIGHEST: eval distances must be fp32-true — the default
    # bf16 MXU pass loses ~1e-1 near zero through the norm-expansion
    # cancellation (see ops/matching.py best_matches_batch)
    cross = jnp.dot(res_b_flat, queries.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    dist2 = jnp.maximum(rnorm[:, None] - 2.0 * cross + qnorm[None, :], 0.0)  # [HW, N]
    dist = jnp.sqrt(dist2)

    mask_b_flat = (mask_b.reshape(HW) != 0)
    blocked = (~mask_b_flat).astype(jnp.float32) * 1e6
    dist_masked = dist + blocked[:, None]

    # best matches
    flat_best = jnp.argmin(dist, axis=0)  # [N]
    best_diff = jnp.take_along_axis(dist, flat_best[None, :], axis=0)[0]
    flat_best_masked = jnp.argmin(dist_masked, axis=0)
    best_diff_masked = jnp.take_along_axis(dist_masked, flat_best_masked[None, :], axis=0)[0]

    uv_pred = jnp.stack([flat_best % W, flat_best // W], axis=-1)
    uv_pred_masked = jnp.stack([flat_best_masked % W, flat_best_masked // W], axis=-1)

    # pixel errors vs GT uv_b
    uv_b_f = uv_b.astype(jnp.float32)
    err = uv_b_f - uv_pred.astype(jnp.float32)
    err_masked = uv_b_f - uv_pred_masked.astype(jnp.float32)
    pixel_match_error_l2 = jnp.linalg.norm(err, axis=1)
    pixel_match_error_l2_masked = jnp.linalg.norm(err_masked, axis=1)
    pixel_match_error_l1 = jnp.sum(jnp.abs(err), axis=1)

    # GT descriptor distance
    des_b_gt = res_b[uv_b[:, 1], uv_b[:, 0], :].astype(jnp.float32)
    norm_diff_gt = jnp.linalg.norm(queries - des_b_gt, axis=1)

    # Schmidt metric: fraction of pixels closer than the GT match
    closer = dist < norm_diff_gt[None, :]  # [HW, N]
    n_closer = jnp.sum(closer, axis=0)
    fraction_closer = n_closer / HW
    closer_masked = (dist_masked < norm_diff_gt[None, :])
    n_closer_masked = jnp.sum(closer_masked, axis=0)
    n_mask_px = jnp.maximum(jnp.sum(mask_b_flat), 1)
    fraction_closer_masked = n_closer_masked / n_mask_px

    # average pixel distance of the false positives
    px_u = (jnp.arange(HW) % W).astype(jnp.float32)
    px_v = (jnp.arange(HW) // W).astype(jnp.float32)
    d_to_gt = jnp.sqrt(
        (px_u[:, None] - uv_b_f[None, :, 0]) ** 2
        + (px_v[:, None] - uv_b_f[None, :, 1]) ** 2
    )  # [HW, N]
    avg_fp = jnp.sum(jnp.where(closer, d_to_gt, 0.0), axis=0) / jnp.maximum(n_closer, 1)
    avg_fp = jnp.where(n_closer == 0, 0.0, avg_fp)
    avg_fp_masked = jnp.sum(jnp.where(closer_masked, d_to_gt, 0.0), axis=0) / jnp.maximum(
        n_closer_masked, 1
    )
    avg_fp_masked = jnp.where(n_closer_masked == 0, 0.0, avg_fp_masked)

    # 3D positions via depth unprojection (evaluation.py:1102-1135)
    def depth_at(depth, uv):
        d = depth.reshape(-1).astype(jnp.float32)
        idx = uv[:, 1].astype(jnp.int32) * W + uv[:, 0].astype(jnp.int32)
        return jnp.take(d, idx) / DEPTH_IM_SCALE

    z_a = depth_at(depth_a, uv_a)
    z_b = depth_at(depth_b, uv_b)
    z_pred = depth_at(depth_b, uv_pred)
    z_pred_masked = depth_at(depth_b, uv_pred_masked)

    def pos3d(uv, z, pose, Kside):
        cam = unproject_to_camera(uv.astype(jnp.float32), z, Kside)
        return transform_points(pose, cam)

    p_a = pos3d(uv_a, z_a, pose_a, K)
    p_b = pos3d(uv_b, z_b, pose_b, K_b)
    p_pred = pos3d(uv_pred, z_pred, pose_b, K_b)
    p_pred_masked = pos3d(uv_pred_masked, z_pred_masked, pose_b, K_b)

    is_valid = z_pred > 0
    is_valid_masked = z_pred_masked > 0
    gt_depth_valid = z_b > 0

    nan = jnp.nan
    norm_diff_gt_3d = jnp.where(gt_depth_valid, jnp.linalg.norm(p_b - p_a, axis=1), nan)
    norm_diff_pred_3d = jnp.where(
        gt_depth_valid & is_valid, jnp.linalg.norm(p_b - p_pred, axis=1), nan
    )
    norm_diff_pred_3d_masked = jnp.where(
        gt_depth_valid & is_valid_masked,
        jnp.linalg.norm(p_b - p_pred_masked, axis=1), nan,
    )

    return {
        "is_valid": is_valid,
        "is_valid_masked": is_valid_masked,
        "norm_diff_descriptor_ground_truth": norm_diff_gt,
        "norm_diff_descriptor": best_diff,
        "norm_diff_descriptor_masked": best_diff_masked,
        "norm_diff_ground_truth_3d": norm_diff_gt_3d,
        "norm_diff_pred_3d": norm_diff_pred_3d,
        "norm_diff_pred_3d_masked": norm_diff_pred_3d_masked,
        "pixel_match_error_l2": pixel_match_error_l2,
        "pixel_match_error_l2_masked": pixel_match_error_l2_masked,
        "pixel_match_error_l1": pixel_match_error_l1,
        "fraction_pixels_closer_than_ground_truth": fraction_closer,
        "fraction_pixels_closer_than_ground_truth_masked": fraction_closer_masked,
        "average_l2_distance_for_false_positives": avg_fp,
        "average_l2_distance_for_false_positives_masked": avg_fp_masked,
        "uv_b_pred": uv_pred,
        "uv_b_pred_masked": uv_pred_masked,
    }


# pairs processed together per scan iteration of the fused sweep (vmapped
# body): >1 lifts TPU utilization of the bandwidth-bound [HW, N] statistics
# chains; memory per iteration grows linearly. Row results are per-pair
# (each pair carries its own key), so the value only affects speed.
SWEEP_VMAP_CHUNK = 4


@functools.lru_cache(maxsize=8)
def _fused_sweep_program(num_matches: int, padded_num_attempts: int,
                         vmap_chunk: int = 1):
    """Jitted scan-over-pairs program for the quantitative sweep: per pair,
    correspondence generation -> stable-argsort compaction of the first
    ``num_matches`` valid candidates -> the [HW, N] match statistics. With
    ``vmap_chunk`` > 1 the scan advances ``vmap_chunk`` pairs per iteration
    (vmapped body; the pairs axis must be a multiple of it). Cached per
    signature so repeated sweeps reuse the executable."""

    def body_one(res_stack, x):
        H, W = x["depth_a"].shape
        uv_a, uv_b, valid = find_pixel_correspondences(
            x["depth_a"], x["pose_a"], x["depth_b"], x["pose_b"],
            x["K"], x["key"], num_attempts=padded_num_attempts,
            mask_a=x["mask_a"])
        # first `num_matches` valid candidates, original order (the
        # device analog of np.where(valid)[0][:num_matches])
        order = jnp.argsort(jnp.logical_not(valid), stable=True)
        keep = order[:num_matches]
        gt_valid = jnp.take(valid, keep)
        uv_a_k = jnp.take(uv_a, keep, axis=0)
        uv_a_k = jnp.stack([jnp.clip(uv_a_k[:, 0], 0, W - 1),
                            jnp.clip(uv_a_k[:, 1], 0, H - 1)],
                           axis=-1).astype(jnp.int32)
        uv_b_k = jnp.take(uv_b, keep, axis=0)
        uv_b_int = jnp.stack([
            jnp.clip(jnp.round(uv_b_k[:, 0]), 0, W - 1),
            jnp.clip(jnp.round(uv_b_k[:, 1]), 0, H - 1),
        ], axis=-1).astype(jnp.int32)
        stats = dict(_match_statistics_device(
            x["depth_a"], x["depth_b"], x["mask_b"], uv_a_k, uv_b_int,
            x["pose_a"], x["pose_b"],
            res_stack[x["ia"]], res_stack[x["ib"]], x["K"]))
        stats.pop("uv_b_pred", None)
        stats.pop("uv_b_pred_masked", None)
        stats["gt_valid"] = gt_valid
        return stats

    @jax.jit
    def run(res_stack, xs):
        if vmap_chunk == 1:
            def body(carry, x):
                return carry, body_one(res_stack, x)

            _, ys = jax.lax.scan(body, 0, xs)
            return ys

        P = next(iter(xs.values())).shape[0]
        g = {k: v.reshape((P // vmap_chunk, vmap_chunk) + v.shape[1:])
             for k, v in xs.items()}

        def body(carry, xc):
            return carry, jax.vmap(lambda x: body_one(res_stack, x))(xc)

        _, ys = jax.lax.scan(body, 0, g)
        return {k: v.reshape((P,) + v.shape[2:]) for k, v in ys.items()}

    return run


@functools.lru_cache(maxsize=8)
def _sharded_sweep_program(num_matches: int, padded_num_attempts: int,
                           mesh, data_axis: str):
    """Mesh-parallel fused sweep: the pairs axis is sharded over
    ``data_axis`` and every chip scans its own slice (the sweep is
    embarrassingly parallel across pairs — SURVEY §2c's sharded-eval row).
    Row-identical to the single-device program because each pair carries its
    own RNG key; verified in ``dryrun_multichip`` and
    tests/test_sharded_eval.py."""
    from jax.sharding import PartitionSpec as P

    from pdc_tpu.parallel.mesh import get_shard_map

    inner = _fused_sweep_program(num_matches, padded_num_attempts)
    mapped = get_shard_map()(inner, mesh=mesh,
                             in_specs=(P(), P(data_axis)),
                             out_specs=P(data_axis))
    return jax.jit(mapped)


@functools.lru_cache(maxsize=8)
def _fused_across_object_program(num_queries: int):
    """Jitted scan-over-pairs program for the across-object sweep: sample
    ``num_queries`` on-object pixels of image a, masked best-match distances
    in image b."""
    from pdc_tpu.ops.matching import best_matches_batch
    from pdc_tpu.ops.sampling import sample_from_mask

    @jax.jit
    def run(res_stack, xs):
        def body(carry, x):
            uv_a, ok = sample_from_mask(x["key"], x["mask_a"], num_queries)
            res_a = res_stack[x["ia"]].astype(jnp.float32)
            queries = res_a[uv_a[:, 1], uv_a[:, 0], :]
            _, best = best_matches_batch(
                queries, res_stack[x["ib"]].astype(jnp.float32),
                mask=x["mask_b"])
            return carry, {"best": best, "ok": ok}

        _, ys = jax.lax.scan(body, 0, xs)
        return ys

    return run


class DenseCorrespondenceEvaluation:
    """Top-level evaluation orchestrator (reference evaluation.py:89).

    Instance methods drive the network registry
    (``config/evaluation/evaluation.yaml`` format: a ``networks`` dict of
    name -> {path_to_network_params}, plus ``output_dir`` and ``params``);
    static methods are the per-network building blocks.
    """

    def __init__(self, config: Optional[dict] = None, dataset=None):
        # config: network registry, as in config/evaluation/evaluation.yaml
        self._config = config or {}
        self._dataset = dataset

    @property
    def config(self):
        return self._config

    # -- network registry (reference evaluation.py:96-170) ---------------------

    def network_names(self):
        return sorted(self._config.get("networks", {}).keys())

    def _network_model_folder(self, name: str) -> str:
        if name not in self._config.get("networks", {}):
            raise ValueError(f"Network {name} is not in config file")
        entry = self._config["networks"][name]
        if "model_folder" in entry:
            return entry["model_folder"]
        # reference format: path to a specific params file inside the folder
        return os.path.dirname(entry["path_to_network_params"])

    def load_network_from_config(self, name: str):
        """Load a registered network (reference evaluation.py:104-123)."""
        from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

        entry = self._config["networks"][name] if name in self._config.get(
            "networks", {}) else None
        if entry is None:
            raise ValueError(f"Network {name} is not in config file")
        model_folder = self._network_model_folder(name)
        param_file = entry.get("path_to_network_params")
        return DenseCorrespondenceNetwork.from_model_folder(
            model_folder, model_param_file=param_file)

    @staticmethod
    def load_dataset_from_model_folder(model_folder: str, mode: str = "train"):
        """Reconstruct the training dataset from the folder's dataset.yaml
        snapshot (reference evaluation.py:125-141 load_dataset_for_network)."""
        from pdc_tpu.data.dataset import SpartanDataset
        from pdc_tpu.utils.yaml_io import load_yaml

        dataset_config = load_yaml(os.path.join(model_folder, "dataset.yaml"))
        return SpartanDataset.from_dataset_config(dataset_config, mode=mode)

    def load_dataset_for_network(self, network_name: str):
        return self.load_dataset_from_model_folder(
            self._network_model_folder(network_name))

    @property
    def dataset(self):
        return self._dataset

    @dataset.setter
    def dataset(self, value):
        self._dataset = value

    def get_output_dir(self):
        return self._config["output_dir"]

    def evaluate_single_network(self, network_name: str, mode: str = "train",
                                save: bool = True):
        """Registry-driven evaluation of one network in one dataset mode
        (reference evaluation.py:206-241). Writes
        ``<output_dir>/<network>/<mode>/data.csv`` when ``save``."""
        dcn = self.load_network_from_config(network_name)
        dataset = self._dataset or self.load_dataset_for_network(network_name)
        if mode == "train":
            dataset.set_train_mode()
        elif mode == "test":
            dataset.set_test_mode()
        else:
            raise ValueError(f"mode must be train or test, got {mode}")

        params = self._config.get("params", {})
        df = self.evaluate_network_quantitative(
            dcn, dataset,
            num_image_pairs=int(params.get("num_image_pairs", 100)),
            num_matches_per_image_pair=int(
                params.get("num_matches_per_image_pair", 100)),
        )
        if save:
            output_dir = os.path.join(self.get_output_dir(), network_name, mode)
            os.makedirs(output_dir, exist_ok=True)
            df.to_csv(os.path.join(output_dir, "data.csv"))
        return df

    def compare_networks(self, network_names=None, mode: str = "test",
                         save: bool = True, tag: str = None):
        """Multi-network CDF overlay: evaluate each registered network and
        plot all curves in one figure via the plotter's ``previous_fig_axes``
        mechanics (the multi-curve comparison the reference's evaluation
        notebooks build by hand). Returns {name: stats} and writes
        ``comparison_<mode>[_<tag>].png`` under output_dir (``tag``
        disambiguates overlays when networks are grouped by their own train
        composite rather than pooled on one dataset)."""
        from pdc_tpu.evaluation.plotting import DenseCorrespondenceEvaluationPlotter

        if network_names is None:
            network_names = self.network_names()
        fig_axes = None
        all_stats = {}
        for name in network_names:
            df = self.evaluate_single_network(name, mode=mode, save=save)
            stats, fig_axes = DenseCorrespondenceEvaluationPlotter.run_on_single_dataframe(
                None, label=name, dataframe=df, save=False,
                previous_fig_axes=fig_axes, return_fig_axes=True)
            all_stats[name] = stats
        if fig_axes is not None and fig_axes[0] is not None:
            if save:
                output_dir = self.get_output_dir()
                os.makedirs(output_dir, exist_ok=True)
                stem = f"comparison_{mode}" + (f"_{tag}" if tag else "")
                fig_axes[0].savefig(os.path.join(output_dir, stem + ".png"))
                from pdc_tpu.utils.yaml_io import save_yaml

                save_yaml(all_stats,
                          os.path.join(output_dir, stem + ".yaml"))
            import matplotlib.pyplot as plt

            plt.close(fig_axes[0])  # saved or not — never leak the overlay
        return all_stats

    # -- core: one image pair --------------------------------------------------

    @staticmethod
    def single_same_scene_image_pair_quantitative_analysis(
        dcn, dataset, scene_name: str, img_a_idx: int, img_b_idx: int,
        num_matches: int = 100, rng_key=None, padded_num_attempts: int = 2000,
        res_a=None, res_b=None,
    ):
        """Evaluate ``num_matches`` GT correspondences of one image pair
        (reference evaluation.py:861-958). Returns list of row dicts.

        ``res_a``/``res_b`` accept precomputed descriptor images (the batched
        sweep computes forwards in batches instead of per pair)."""
        rgb_a, depth_a, mask_a, pose_a = dataset.get_rgbd_mask_pose(scene_name, img_a_idx)
        rgb_b, depth_b, mask_b, pose_b = dataset.get_rgbd_mask_pose(scene_name, img_b_idx)
        scene = dataset.get_scene(scene_name)
        K = scene.K

        if rng_key is None:
            rng_key = jax.random.PRNGKey(1)  # reference pins seed 1

        uv_a, uv_b, valid = find_pixel_correspondences(
            depth_a, pose_a, depth_b, pose_b, K, rng_key,
            num_attempts=padded_num_attempts, mask_a=mask_a,
        )
        uv_a, uv_b, valid = map(np.asarray, (uv_a, uv_b, valid))
        keep = np.where(valid)[0][:num_matches]
        if keep.size == 0:
            logger.info("no matches found for pair (%s, %d, %d)", scene_name,
                        img_a_idx, img_b_idx)
            return []
        uv_a = uv_a[keep]
        uv_b_int = np.round(uv_b[keep]).astype(np.int32)
        uv_b_int[:, 0] = np.clip(uv_b_int[:, 0], 0, depth_b.shape[1] - 1)
        uv_b_int[:, 1] = np.clip(uv_b_int[:, 1], 0, depth_b.shape[0] - 1)

        if res_a is None:
            res_a = dcn.forward_on_img(rgb_a)
        if res_b is None:
            res_b = dcn.forward_on_img(rgb_b)

        stats = _match_statistics_device(
            jnp.asarray(depth_a), jnp.asarray(depth_b), jnp.asarray(mask_b),
            jnp.asarray(uv_a), jnp.asarray(uv_b_int),
            jnp.asarray(pose_a, jnp.float32), jnp.asarray(pose_b, jnp.float32),
            res_a, res_b, jnp.asarray(K, jnp.float32),
        )
        stats = {k: np.asarray(v) for k, v in stats.items()}

        rows = []
        for i in range(uv_a.shape[0]):
            row = {c: None for c in EVAL_COLUMNS}
            row.update(
                scene_name=scene_name, img_a_idx=img_a_idx, img_b_idx=img_b_idx,
                is_valid=bool(stats["is_valid"][i]),
                is_valid_masked=bool(stats["is_valid_masked"][i]),
            )
            for c in EVAL_COLUMNS:
                if c in stats and row[c] is None:
                    row[c] = float(stats[c][i])
            rows.append(row)
        return rows

    # -- dataset-level sweeps -----------------------------------------------------

    @staticmethod
    def compute_descriptor_images_batched(dcn, dataset, image_keys,
                                          batch_size: int = 16):
        """Forward unique (scene, idx) images in batches -> dict of [H,W,D]
        descriptor images. One 640x480 forward at B=1 wastes most of the
        chip; batching the sweep's forwards is a ~5x end-to-end eval speedup
        (the reference forwards one image at a time, evaluation.py:900-901)."""
        keys = sorted(set(image_keys))
        out = {}
        if not hasattr(dcn, "forward"):  # duck-typed DCNs (tests, adapters)
            for s, idx in keys:
                out[(s, idx)] = dcn.forward_on_img(
                    dataset.get_rgbd_mask_pose(s, idx)[0])
            return out
        for i in range(0, len(keys), batch_size):
            chunk = keys[i:i + batch_size]
            imgs = np.stack([
                dataset.rgb_image_to_tensor(
                    dataset.get_rgbd_mask_pose(s, idx)[0])
                for s, idx in chunk
            ])
            res = dcn.forward(jnp.asarray(imgs))
            for j, k in enumerate(chunk):
                out[k] = res[j]
        return out

    @staticmethod
    def evaluate_network_quantitative(
        dcn, dataset, num_image_pairs: int = 100, num_matches_per_image_pair: int = 100,
        seed: int = 1, forward_batch_size: int = 16, fused: bool = True,
        mesh=None, data_axis: str = "data",
    ):
        """Sample image pairs (pose-difference rejection) and accumulate the
        per-match DataFrame (reference evaluate_network, evaluation.py:475-527
        + get_image_pair_list :174-203). Forwards run batched over the unique
        images of the sweep; with ``fused`` (default) the whole sweep's
        correspondence generation + statistics run as ONE device dispatch
        (lax.scan over pairs) and one fetch — the per-pair host loop pays
        2 dispatch round trips per pair, which dominates wall time on a
        remote TPU runtime. Pass ``mesh`` to shard the sweep's pairs axis
        over its ``data_axis`` (row-identical output; each chip scans its
        pair slice)."""
        import pandas as pd

        DCE = DenseCorrespondenceEvaluation
        dataset.reset_seed(seed)  # reference reset_random_seed at eval entry
        key = jax.random.PRNGKey(seed)
        pair_list = []
        for p in range(num_image_pairs):
            scene_name = dataset.get_random_scene_name()
            scene = dataset.get_scene(scene_name)
            idx_a = dataset.get_random_image_index(scene_name)
            idx_b = dataset.get_img_idx_with_different_pose(
                scene_name, scene.poses[scene.position(idx_a)])
            if idx_b is None:
                continue
            key, sub = jax.random.split(key)
            pair_list.append((scene_name, idx_a, idx_b, sub))

        images = DCE.compute_descriptor_images_batched(
            dcn, dataset,
            [(s, i) for s, ia, ib, _ in pair_list for i in (ia, ib)],
            batch_size=forward_batch_size)

        if fused and pair_list:
            return DCE._quantitative_sweep_fused(
                dataset, pair_list, images, num_matches_per_image_pair,
                mesh=mesh, data_axis=data_axis)

        rows = []
        for scene_name, idx_a, idx_b, sub in pair_list:
            rows.extend(
                DCE.single_same_scene_image_pair_quantitative_analysis(
                    dcn, dataset, scene_name, idx_a, idx_b,
                    num_matches=num_matches_per_image_pair, rng_key=sub,
                    res_a=images[(scene_name, idx_a)],
                    res_b=images[(scene_name, idx_b)],
                )
            )
        return pd.DataFrame(rows, columns=EVAL_COLUMNS)

    @staticmethod
    def _quantitative_sweep_fused(dataset, pair_list, images,
                                  num_matches: int,
                                  padded_num_attempts: int = 2000,
                                  pair_chunk: int = 128,
                                  mesh=None, data_axis: str = "data"):
        """Whole-sweep statistics in one device program: per pair, generate
        correspondences, compact the first ``num_matches`` valid ones with a
        stable argsort (replacing the host-side ``np.where`` between the two
        dispatches of the per-pair path), and run the [HW, N] statistics —
        all under one ``lax.scan``, fetched in one host round trip. Row
        semantics identical to the per-pair path (verified by
        tests/test_evaluation_fused.py).

        The device footprint (stacked depth/mask frames + the chunk's unique
        descriptor images) grows linearly with the number of pairs, so sweeps
        larger than ``pair_chunk`` run as sequential chunks — order and RNG
        are per-pair, so chunking does not change any row."""
        import pandas as pd

        if len(pair_list) > pair_chunk:
            frames = []
            for i in range(0, len(pair_list), pair_chunk):
                chunk = pair_list[i:i + pair_chunk]
                wanted = {(s, idx) for s, ia, ib, _ in chunk
                          for idx in (ia, ib)}
                frames.append(
                    DenseCorrespondenceEvaluation._quantitative_sweep_fused(
                        dataset, chunk,
                        {k: v for k, v in images.items() if k in wanted},
                        num_matches, padded_num_attempts, pair_chunk,
                        mesh=mesh, data_axis=data_axis))
            return pd.concat(frames, ignore_index=True)

        # stack unique descriptor images once; per-pair gathers by index
        unique = sorted({(s, i) for s, ia, ib, _ in pair_list
                         for i in (ia, ib)})
        kidx = {k: j for j, k in enumerate(unique)}
        res_stack = jnp.stack([jnp.asarray(images[k]) for k in unique])

        depths_a, masks_a, depths_b, masks_b = [], [], [], []
        poses_a, poses_b, Ks, subs, ias, ibs = [], [], [], [], [], []
        for scene_name, idx_a, idx_b, sub in pair_list:
            _, d_a, m_a, p_a = dataset.get_rgbd_mask_pose(scene_name, idx_a)
            _, d_b, m_b, p_b = dataset.get_rgbd_mask_pose(scene_name, idx_b)
            depths_a.append(np.asarray(d_a))
            masks_a.append(np.asarray(m_a))
            depths_b.append(np.asarray(d_b))
            masks_b.append(np.asarray(m_b))
            poses_a.append(np.asarray(p_a, np.float32))
            poses_b.append(np.asarray(p_b, np.float32))
            Ks.append(np.asarray(dataset.get_scene(scene_name).K, np.float32))
            subs.append(sub)
            ias.append(kidx[(scene_name, idx_a)])
            ibs.append(kidx[(scene_name, idx_b)])

        xs = {
            "depth_a": jnp.asarray(np.stack(depths_a)),
            "mask_a": jnp.asarray(np.stack(masks_a)),
            "depth_b": jnp.asarray(np.stack(depths_b)),
            "mask_b": jnp.asarray(np.stack(masks_b)),
            "pose_a": jnp.asarray(np.stack(poses_a)),
            "pose_b": jnp.asarray(np.stack(poses_b)),
            "K": jnp.asarray(np.stack(Ks)),
            "key": jnp.stack([jnp.asarray(s) for s in subs]),
            "ia": jnp.asarray(ias, jnp.int32),
            "ib": jnp.asarray(ibs, jnp.int32),
        }
        nbytes = int(res_stack.nbytes) + sum(int(v.nbytes) for v in xs.values())
        logger.debug("fused sweep chunk: %d pairs, ~%.2f GB on device",
                     len(pair_list), nbytes / 1e9)
        if mesh is None:
            # the body holds ~5 [HW, N] f32 intermediates per vmapped pair;
            # cap the chunk so large num_matches sweeps stay within HBM
            chunk = max(1, min(SWEEP_VMAP_CHUNK, 400 // max(num_matches, 1)))
            P_real = len(pair_list)
            pad = (-P_real) % chunk
            if pad:
                xs = {k: jnp.concatenate([v] + [v[-1:]] * pad, axis=0)
                      for k, v in xs.items()}
            run = _fused_sweep_program(num_matches, padded_num_attempts,
                                       chunk)
            stats_np = jax.device_get(run(res_stack, xs))
            if pad:
                stats_np = {k: v[:P_real] for k, v in stats_np.items()}
        else:
            # pad the pairs axis to a multiple of the mesh size (replicating
            # the last pair); padded rows are dropped after the fetch
            n_dev = int(np.prod([mesh.shape[a] for a in ([data_axis]
                                 if isinstance(data_axis, str) else data_axis)]))
            P_real = len(pair_list)
            pad = (-P_real) % n_dev
            if pad:
                xs = {k: jnp.concatenate(
                    [v] + [v[-1:]] * pad, axis=0) for k, v in xs.items()}
            run = _sharded_sweep_program(num_matches, padded_num_attempts,
                                         mesh, data_axis)
            stats_np = jax.device_get(run(res_stack, xs))
            if pad:
                stats_np = {k: v[:P_real] for k, v in stats_np.items()}

        rows = []
        for p, (scene_name, idx_a, idx_b, _) in enumerate(pair_list):
            valid_idx = np.where(stats_np["gt_valid"][p])[0]
            if valid_idx.size == 0:
                logger.info("no matches found for pair (%s, %d, %d)",
                            scene_name, idx_a, idx_b)
            for i in valid_idx:
                row = {c: None for c in EVAL_COLUMNS}
                row.update(
                    scene_name=scene_name, img_a_idx=idx_a, img_b_idx=idx_b,
                    is_valid=bool(stats_np["is_valid"][p, i]),
                    is_valid_masked=bool(stats_np["is_valid_masked"][p, i]),
                )
                for c in EVAL_COLUMNS:
                    if c in stats_np and row[c] is None:
                        row[c] = float(stats_np[c][p, i])
                rows.append(row)
        return pd.DataFrame(rows, columns=EVAL_COLUMNS)

    @staticmethod
    def evaluate_network_cross_scene(dcn, dataset, annotations: list,
                                     compute_3d: bool = True):
        """Evaluate on human-labeled cross-scene pixel pairs (the annotation
        YAML format of simple_pixel_correspondence_labeler, reference
        evaluation.py:252-301 + :349-472). ``annotations`` is a list of dicts
        with image_a/image_b entries holding scene_name, image_idx, pixels."""
        import pandas as pd

        # forwards once per unique image, in batches (the reference reruns
        # the forward for every annotation entry)
        images = DenseCorrespondenceEvaluation.compute_descriptor_images_batched(
            dcn, dataset,
            [(ann[side]["scene_name"], int(ann[side]["image_idx"]))
             for ann in annotations for side in ("image_a", "image_b")])

        rows = []
        for ann in annotations:
            ia, ib = ann["image_a"], ann["image_b"]
            scene_a, idx_a = ia["scene_name"], int(ia["image_idx"])
            scene_b, idx_b = ib["scene_name"], int(ib["image_idx"])
            rgb_a, depth_a, mask_a, pose_a = dataset.get_rgbd_mask_pose(scene_a, idx_a)
            rgb_b, depth_b, mask_b, pose_b = dataset.get_rgbd_mask_pose(scene_b, idx_b)
            # per-side intrinsics: cross-scene pairs can come from cameras
            # with different K (reference evaluation.py:413 uses one camera
            # matrix; per-side is exact)
            K_a = dataset.get_scene(scene_a).K
            K_b = dataset.get_scene(scene_b).K
            uv_a = np.asarray([[p["u"], p["v"]] for p in ia["pixels"]], np.int32)
            uv_b = np.asarray([[p["u"], p["v"]] for p in ib["pixels"]], np.int32)
            res_a = images[(scene_a, idx_a)]
            res_b = images[(scene_b, idx_b)]
            stats = _match_statistics_device(
                jnp.asarray(depth_a), jnp.asarray(depth_b), jnp.asarray(mask_b),
                jnp.asarray(uv_a), jnp.asarray(uv_b),
                jnp.asarray(pose_a, jnp.float32), jnp.asarray(pose_b, jnp.float32),
                res_a, res_b, jnp.asarray(K_a, jnp.float32),
                jnp.asarray(K_b, jnp.float32),
            )
            stats = {k: np.asarray(v) for k, v in stats.items()}
            for i in range(uv_a.shape[0]):
                row = {c: None for c in EVAL_COLUMNS}
                row.update(
                    scene_name_a=scene_a, scene_name_b=scene_b,
                    img_a_idx=idx_a, img_b_idx=idx_b,
                    is_valid=bool(stats["is_valid"][i]),
                    is_valid_masked=bool(stats["is_valid_masked"][i]),
                    keypoint_name=ia["pixels"][i].get("keypoint"),
                )
                for c in EVAL_COLUMNS:
                    if c in stats and row[c] is None:
                        row[c] = float(stats[c][i])
                rows.append(row)
        return pd.DataFrame(rows, columns=EVAL_COLUMNS)

    @staticmethod
    def evaluate_network_across_objects(dcn, dataset, num_image_pairs: int = 100,
                                        num_queries: int = 100, seed: int = 1,
                                        fused: bool = True):
        """Distribution of best-match descriptor distances between DIFFERENT
        objects (reference :304-337, :976-1003): for random on-object pixels
        of object A, the best masked match distance in an image of object B."""
        import pandas as pd

        from pdc_tpu.losses.composer import MATCH_TYPE_DIFFERENT_OBJECT
        from pdc_tpu.ops.matching import best_matches_batch
        from pdc_tpu.ops.sampling import sample_from_mask

        rows = []
        dataset.reset_seed(seed)  # reference reset_random_seed at eval entry
        key = jax.random.PRNGKey(seed)
        pairs, subs = [], []
        for p in range(num_image_pairs):
            pairs.append(dataset.sample_pair(match_type=MATCH_TYPE_DIFFERENT_OBJECT))
            key, sub = jax.random.split(key)
            subs.append(sub)

        if fused and hasattr(dcn, "forward") and pairs:
            # whole sweep in one scan dispatch (query sampling + masked
            # best-match per pair), one fetch — the per-pair loop pays ~4
            # host round trips per pair
            unique, rgb_of = [], {}
            for pair in pairs:
                for side in ("a", "b"):
                    k = (pair.metadata[f"scene_name_{side}"],
                         pair.metadata[f"image_{side}_idx"])
                    if k not in rgb_of:
                        rgb_of[k] = getattr(pair, f"rgb_{side}")
                        unique.append(k)
            kidx = {k: j for j, k in enumerate(unique)}
            res_chunks = []
            for start in range(0, len(unique), 16):
                chunk = unique[start:start + 16]
                imgs = np.stack([dataset.rgb_image_to_tensor(rgb_of[k])
                                 for k in chunk])
                res_chunks.append(dcn.forward(jnp.asarray(imgs)))
            res_stack = jnp.concatenate(res_chunks, axis=0)

            xs = {
                "mask_a": jnp.asarray(np.stack([np.asarray(p.mask_a) for p in pairs])),
                "mask_b": jnp.asarray(np.stack([np.asarray(p.mask_b) for p in pairs])),
                "key": jnp.stack([jnp.asarray(s) for s in subs]),
                "ia": jnp.asarray([kidx[(p.metadata["scene_name_a"],
                                         p.metadata["image_a_idx"])] for p in pairs],
                                  jnp.int32),
                "ib": jnp.asarray([kidx[(p.metadata["scene_name_b"],
                                         p.metadata["image_b_idx"])] for p in pairs],
                                  jnp.int32),
            }
            run = _fused_across_object_program(num_queries)
            out = jax.device_get(run(res_stack, xs))
            for p, pair in enumerate(pairs):
                if not bool(out["ok"][p]):
                    continue
                for b in out["best"][p]:
                    rows.append({
                        "scene_name_a": pair.metadata["scene_name_a"],
                        "scene_name_b": pair.metadata["scene_name_b"],
                        "img_a_idx": pair.metadata["image_a_idx"],
                        "img_b_idx": pair.metadata["image_b_idx"],
                        "object_id_a": pair.metadata.get("object_id_a"),
                        "object_id_b": pair.metadata.get("object_id_b"),
                        "norm_diff_descriptor_best_match": float(b),
                    })
            return pd.DataFrame(rows, columns=ACROSS_OBJECT_COLUMNS)

        for pair, sub in zip(pairs, subs):
            uv_a, ok = sample_from_mask(sub, jnp.asarray(pair.mask_a), num_queries)
            if not bool(ok):
                continue
            res_a = dcn.forward_on_img(pair.rgb_a)
            res_b = dcn.forward_on_img(pair.rgb_b)
            uv_a = np.asarray(uv_a)
            queries = np.asarray(res_a)[uv_a[:, 1], uv_a[:, 0], :]
            _, best = best_matches_batch(jnp.asarray(queries), res_b,
                                         mask=jnp.asarray(pair.mask_b))
            for b in np.asarray(best):
                rows.append({
                    "scene_name_a": pair.metadata["scene_name_a"],
                    "scene_name_b": pair.metadata["scene_name_b"],
                    "img_a_idx": pair.metadata["image_a_idx"],
                    "img_b_idx": pair.metadata["image_b_idx"],
                    "object_id_a": pair.metadata.get("object_id_a"),
                    "object_id_b": pair.metadata.get("object_id_b"),
                    "norm_diff_descriptor_best_match": float(b),
                })
        return pd.DataFrame(rows, columns=ACROSS_OBJECT_COLUMNS)

    # -- descriptor statistics ------------------------------------------------------

    @staticmethod
    def compute_descriptor_statistics_on_dataset(dcn, dataset, num_images: int = 100,
                                                 save_to_file: bool = True,
                                                 filename: Optional[str] = None,
                                                 batch_size: int = 16,
                                                 mesh=None,
                                                 data_axis: str = "data"):
        """Per-channel min/max/mean over whole images and over masks, saved
        as descriptor_statistics.yaml (reference evaluation.py:2156-2304).
        Forwards + reductions run ``batch_size`` images per dispatch (the
        per-image loop cost ~3 host round trips per image). Pass ``mesh`` to
        shard each batch's images over ``data_axis`` — forwards and
        reductions are per-image, so GSPMD partitions them batch-wise and
        the result is identical to the single-device pass."""

        @jax.jit
        def stats_batch(res, mask):
            # res [B, H, W, D], mask [B, H, W] -> per-image reductions
            B, H, W, D = res.shape
            flat = res.reshape(B, H * W, D).astype(jnp.float32)
            m = (mask.reshape(B, H * W) != 0)
            n_mask = jnp.maximum(jnp.sum(m, axis=1), 1)
            masked_sum = jnp.sum(jnp.where(m[..., None], flat, 0.0), axis=1)
            big = jnp.float32(1e9)
            masked_min = jnp.min(jnp.where(m[..., None], flat, big), axis=1)
            masked_max = jnp.max(jnp.where(m[..., None], flat, -big), axis=1)
            return (
                (jnp.min(flat, axis=1), jnp.max(flat, axis=1),
                 jnp.mean(flat, axis=1)),
                (masked_min, masked_max, masked_sum / n_mask[:, None]),
                jnp.sum(m, axis=1) > 0,
            )

        acc = {
            "entire_image": {"min": None, "max": None, "mean": None},
            "mask_image": {"min": None, "max": None, "mean": None},
        }
        count = 0
        draws = []
        for i in range(num_images):
            scene_name = dataset.get_random_scene_name()
            idx = dataset.get_random_image_index(scene_name)
            draws.append((scene_name, idx))

        batched = hasattr(dcn, "forward")
        for start in range(0, len(draws), batch_size if batched else 1):
            chunk = draws[start:start + batch_size] if batched else [draws[start]]
            rgbs, masks = [], []
            for scene_name, idx in chunk:
                rgb, _, mask, _ = dataset.get_rgbd_mask_pose(scene_name, idx)
                rgbs.append(dataset.rgb_image_to_tensor(rgb) if batched
                            else rgb)
                masks.append(np.asarray(mask))
            n_pad = 0
            if batched:
                imgs = np.stack(rgbs)
                if mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec

                    n_dev = mesh.shape[data_axis]
                    n_pad = (-len(chunk)) % n_dev
                    if n_pad:
                        imgs = np.concatenate(
                            [imgs] + [imgs[-1:]] * n_pad, axis=0)
                        masks = masks + [masks[-1]] * n_pad
                    sh = NamedSharding(mesh, PartitionSpec(data_axis))
                    imgs = jax.device_put(jnp.asarray(imgs), sh)
                res = dcn.forward(jnp.asarray(imgs))
            else:
                res = jnp.stack([jnp.asarray(dcn.forward_on_img(r))
                                 for r in rgbs])
            entire, masked, mask_ok = jax.device_get(
                stats_batch(res, jnp.asarray(np.stack(masks))))
            for j in range(len(chunk)):
                if not bool(mask_ok[j]):
                    continue
                count += 1
                for dst, (mn, mx, mean) in (("entire_image", entire),
                                            ("mask_image", masked)):
                    d = acc[dst]
                    d["min"] = mn[j] if d["min"] is None else np.minimum(d["min"], mn[j])
                    d["max"] = mx[j] if d["max"] is None else np.maximum(d["max"], mx[j])
                    d["mean"] = mean[j] if d["mean"] is None else d["mean"] + mean[j]

        stats = {}
        for k, v in acc.items():
            stats[k] = {
                "min": [float(x) for x in v["min"]],
                "max": [float(x) for x in v["max"]],
                "mean": [float(x) for x in (v["mean"] / max(count, 1))],
            }

        if save_to_file:
            if filename is None:
                folder = dcn.config["path_to_network_params_folder"]
                filename = os.path.join(folder, "descriptor_statistics.yaml")
            save_yaml(stats, filename)
        return stats

    # -- test-loss over a dataset -----------------------------------------------------

    @staticmethod
    def compute_loss_on_dataset(dcn, dataset, loss_config: dict, num_iterations: int = 50,
                                batch_size: int = 1, seed: int = 0):
        """Average composed loss over sampled batches in eval mode
        (reference evaluation.py:2072-2152)."""
        from pdc_tpu.data.assembler import AssemblerConfig, assemble_batch
        from pdc_tpu.losses.composer import compose_loss
        from pdc_tpu.losses.pixelwise_contrastive import LossConfig

        loss_cfg = LossConfig.from_dict(loss_config)
        acfg = AssemblerConfig(
            num_matching_attempts=min(dataset.num_matching_attempts, 5000),
            num_masked_non_matches_per_match=dataset.num_masked_non_matches_per_match,
            num_background_non_matches_per_match=dataset.num_background_non_matches_per_match,
        )
        W = dcn.image_shape[1]

        @jax.jit
        def eval_batch(batch, key):
            img_a, img_b, idx = assemble_batch(key, batch, acfg)
            B, H, Wd, _ = img_a.shape
            imgs = jnp.concatenate([img_a, img_b], axis=0)
            out = dcn.module.apply(dcn.variables, imgs, train=False)
            D = out.shape[-1]
            pred = out.reshape(2 * B, H * Wd, D)
            terms = jax.vmap(lambda a, b, s: compose_loss(a, b, s, loss_cfg, W))(
                pred[:B], pred[B:], idx
            )
            return jnp.mean(terms.loss), jnp.mean(terms.match_loss), jnp.mean(
                terms.masked_non_match_loss + terms.background_non_match_loss
            )

        key = jax.random.PRNGKey(seed)
        batches, subs = [], []
        for _ in range(num_iterations):
            key, sub = jax.random.split(key)
            batches.append(dataset.make_host_batch(batch_size))
            subs.append(sub)

        # all iterations in one scan dispatch, one fetch (the per-iteration
        # loop paid ~2 host round trips each)
        stacked = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *batches)
        ks = jnp.stack([jnp.asarray(s) for s in subs])

        @jax.jit
        def eval_all(stacked, ks):
            def body(tot, xk):
                b, k = xk
                return tot + jnp.stack(eval_batch(b, k)), None

            tot, _ = jax.lax.scan(body, jnp.zeros(3), (stacked, ks))
            return tot / num_iterations

        totals = np.asarray(jax.device_get(eval_all(stacked, ks)))
        return tuple(totals)  # (loss, match_loss, non_match_loss)

    # -- the full pipeline --------------------------------------------------------------

    @staticmethod
    def run_evaluation_on_network(model_folder: str, dataset=None,
                                  num_image_pairs: int = 100,
                                  num_matches_per_image_pair: int = 100,
                                  output_dir: Optional[str] = None,
                                  cross_scene_annotations: Optional[list] = None,
                                  compute_descriptor_statistics: bool = True,
                                  qualitative: bool = True,
                                  num_qualitative_pairs: int = 5,
                                  iteration: Optional[int] = None):
        """Full analysis pipeline on a model folder (reference
        evaluation.py:2307-2410): descriptor statistics; train- AND test-mode
        quantitative CSVs; overlaid CDF figure (train/test[/cross_scene]
        curves) + per-mode stats.yaml; across-object analysis when the
        dataset has >1 single object; qualitative panels + descriptor
        colormaps. When ``dataset`` is None it is reconstructed from the
        folder's dataset.yaml snapshot."""
        from pdc_tpu.evaluation.plotting import DenseCorrespondenceEvaluationPlotter
        from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

        DCE = DenseCorrespondenceEvaluation
        DCEP = DenseCorrespondenceEvaluationPlotter

        dcn = DenseCorrespondenceNetwork.from_model_folder(
            model_folder, iteration=iteration)
        if dataset is None:
            dataset = DCE.load_dataset_from_model_folder(model_folder)

        if output_dir is None:
            output_dir = os.path.join(model_folder, "analysis")
        os.makedirs(output_dir, exist_ok=True)

        if compute_descriptor_statistics:
            DCE.compute_descriptor_statistics_on_dataset(
                dcn, dataset, num_images=min(100, dataset.num_images_total),
                save_to_file=True,
                filename=os.path.join(model_folder, "descriptor_statistics.yaml"),
            )

        results = {}
        fig_axes = None
        original_mode = dataset.mode
        for mode in ("train", "test"):
            if mode == "train":
                dataset.set_train_mode()
            else:
                dataset.set_test_mode()
            mode_dir = os.path.join(output_dir, mode)
            os.makedirs(mode_dir, exist_ok=True)
            df = DCE.evaluate_network_quantitative(
                dcn, dataset, num_image_pairs=num_image_pairs,
                num_matches_per_image_pair=num_matches_per_image_pair,
            )
            csv_path = os.path.join(mode_dir, "data.csv")
            df.to_csv(csv_path)
            results[f"{mode}_csv"] = csv_path
            if len(df):
                stats, fig_axes = DCEP.run_on_single_dataframe(
                    csv_path, label=mode, output_dir=mode_dir, save=True,
                    previous_fig_axes=fig_axes, return_fig_axes=True,
                )
                results[mode] = stats
        dataset.mode = original_mode

        if cross_scene_annotations:
            df_cross = DCE.evaluate_network_cross_scene(
                dcn, dataset, cross_scene_annotations
            )
            cross_dir = os.path.join(output_dir, "cross_scene")
            os.makedirs(cross_dir, exist_ok=True)
            cross_csv = os.path.join(cross_dir, "data.csv")
            df_cross.to_csv(cross_csv)
            results["cross_scene_csv"] = cross_csv
            if len(df_cross):
                stats, fig_axes = DCEP.run_on_single_dataframe(
                    cross_csv, label="cross_scene", output_dir=cross_dir,
                    save=True, previous_fig_axes=fig_axes, return_fig_axes=True,
                )
                results["cross_scene"] = stats

        # the combined overlay figure (train/test/cross_scene in one plot,
        # reference evaluation.py:2389-2396)
        if fig_axes is not None and fig_axes[0] is not None:
            quant_path = os.path.join(output_dir, "quant_plots.png")
            fig_axes[0].savefig(quant_path)
            results["quant_plots"] = quant_path
            import matplotlib.pyplot as plt

            plt.close(fig_axes[0])

        # across-object analysis (reference :2398-2407)
        if dataset.get_number_of_unique_single_objects() > 1:
            ao_dir = os.path.join(output_dir, "across_object")
            os.makedirs(ao_dir, exist_ok=True)
            df_ao = DCE.evaluate_network_across_objects(dcn, dataset)
            ao_csv = os.path.join(ao_dir, "data.csv")
            df_ao.to_csv(ao_csv)
            results["across_object_csv"] = ao_csv
            if len(df_ao):
                results["across_object"] = (
                    DCEP.run_on_single_dataframe_across_objects(
                        ao_csv, output_dir=ao_dir, save=True))

        if qualitative:
            from pdc_tpu.evaluation.qualitative import evaluate_network_qualitative

            results["qualitative"] = evaluate_network_qualitative(
                dcn, dataset, num_image_pairs=num_qualitative_pairs,
                output_dir=os.path.join(output_dir, "qualitative"),
            )

        return results

    # -- SIFT baseline (host-side, optional cv2) ------------------------------------------

    @staticmethod
    def single_image_pair_sift_analysis(dataset, scene_name: str,
                                        img_a_idx: int, img_b_idx: int,
                                        cross_match_threshold: float = 0.75,
                                        output_path: Optional[str] = None,
                                        num_visualize: int = 10,
                                        detector: str = "sift"):
        """SIFT/ORB keypoints + matches for one image pair, with 3D
        match-error rows and an optional match-panel PNG (reference
        evaluation.py:1581-1687's qualitative SIFT figures plus the
        matching_comparisons/visual_matching_comparisons.ipynb ORB variant,
        drawn with matplotlib instead of cv2.drawMatchesKnn so it runs
        headless).

        :param detector: 'sift' (ratio-test knn matching) or 'orb'
            (Hamming-distance cross-check matching, as in the notebook)
        :return: dict with 'good' (list of (uv_a, uv_b)), 'num_keypoints_a/b',
            'rows' (3D-error dicts per good match)
        """
        try:
            import cv2
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("OpenCV not available; SIFT analysis disabled") from e

        rgb_a, depth_a, mask_a, pose_a = dataset.get_rgbd_mask_pose(scene_name, img_a_idx)
        rgb_b, depth_b, mask_b, pose_b = dataset.get_rgbd_mask_pose(scene_name, img_b_idx)
        K = dataset.get_scene(scene_name).K

        if detector == "sift":
            det = cv2.SIFT_create()
        elif detector == "orb":
            det = cv2.ORB_create()
        else:
            raise ValueError(f"detector must be sift or orb, got {detector}")
        gray_a = cv2.cvtColor(np.asarray(rgb_a), cv2.COLOR_RGB2GRAY)
        gray_b = cv2.cvtColor(np.asarray(rgb_b), cv2.COLOR_RGB2GRAY)
        kp_a, des_a = det.detectAndCompute(gray_a, np.asarray(mask_a))
        kp_b, des_b = det.detectAndCompute(gray_b, np.asarray(mask_b))
        result = {"num_keypoints_a": len(kp_a), "num_keypoints_b": len(kp_b),
                  "good": [], "rows": []}
        if des_a is None or des_b is None:
            return result

        if detector == "orb":
            bf = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
            matches = sorted(bf.match(des_a, des_b), key=lambda m: m.distance)
            good = list(matches)
        else:
            bf = cv2.BFMatcher()
            matches = bf.knnMatch(des_a, des_b, k=2)
            good = [m for m, n in matches
                    if m.distance < cross_match_threshold * n.distance]

        for m in good:
            ua, va = map(int, np.round(kp_a[m.queryIdx].pt))
            ub, vb = map(int, np.round(kp_b[m.trainIdx].pt))
            result["good"].append(((ua, va), (ub, vb)))
            za = float(depth_a[va, ua]) / DEPTH_IM_SCALE
            zb = float(depth_b[vb, ub]) / DEPTH_IM_SCALE
            err = np.nan
            if za > 0 and zb > 0:
                pa = transform_points(
                    jnp.asarray(pose_a, jnp.float32),
                    unproject_to_camera(np.array([ua, va], np.float32),
                                        np.float32(za), K))
                pb = transform_points(
                    jnp.asarray(pose_b, jnp.float32),
                    unproject_to_camera(np.array([ub, vb], np.float32),
                                        np.float32(zb), K))
                err = float(np.linalg.norm(np.asarray(pa) - np.asarray(pb)))
            result["rows"].append({
                "scene_name": scene_name, "img_a_idx": img_a_idx,
                "img_b_idx": img_b_idx, "is_valid": za > 0 and zb > 0,
                "norm_diff_pred_3d": err,
            })

        if output_path is not None and result["good"]:
            from pdc_tpu.evaluation.qualitative import draw_correspondence_panel

            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            show = result["good"][:num_visualize]
            fig, ax = plt.subplots(figsize=(15, 6))
            draw_correspondence_panel(
                rgb_a, rgb_b,
                np.asarray([g[0] for g in show]),
                np.asarray([g[1] for g in show]),
                ax=ax, title=f"{detector.upper()} matches ({len(good)} good / "
                             f"{len(matches)} total)")
            fig.savefig(output_path, bbox_inches="tight")
            plt.close(fig)
        return result

    @staticmethod
    def compare_against_sift(dataset, num_image_pairs: int = 50, seed: int = 1):
        """SIFT keypoint-match 3D-error baseline (reference
        evaluation.py:1554-1767). Host-side; requires cv2 with SIFT."""
        try:
            import cv2
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("OpenCV not available; SIFT baseline disabled") from e
        import pandas as pd

        sift = cv2.SIFT_create()
        bf = cv2.BFMatcher()
        rows = []
        dataset.reset_seed(seed)  # reference reset_random_seed at eval entry
        for _ in range(num_image_pairs):
            scene_name = dataset.get_random_scene_name()
            scene = dataset.get_scene(scene_name)
            idx_a = dataset.get_random_image_index(scene_name)
            idx_b = dataset.get_img_idx_with_different_pose(
                scene_name, scene.poses[scene.position(idx_a)])
            if idx_b is None:
                continue
            pos_a, pos_b = scene.position(idx_a), scene.position(idx_b)
            gray_a = cv2.cvtColor(scene.rgb[pos_a], cv2.COLOR_RGB2GRAY)
            gray_b = cv2.cvtColor(scene.rgb[pos_b], cv2.COLOR_RGB2GRAY)
            kp_a, des_a = sift.detectAndCompute(gray_a, None)
            kp_b, des_b = sift.detectAndCompute(gray_b, None)
            if des_a is None or des_b is None:
                continue
            matches = bf.knnMatch(des_a, des_b, k=2)
            good = [m for m, n in matches if m.distance < 0.75 * n.distance]
            for m in good:
                ua, va = map(int, np.round(kp_a[m.queryIdx].pt))
                ub, vb = map(int, np.round(kp_b[m.trainIdx].pt))
                za = scene.depth[pos_a][va, ua] / DEPTH_IM_SCALE
                zb = scene.depth[pos_b][vb, ub] / DEPTH_IM_SCALE
                valid = za > 0 and zb > 0
                err = np.nan
                if valid:
                    pa = transform_points(
                        jnp.asarray(scene.poses[pos_a], jnp.float32),
                        unproject_to_camera(np.array([ua, va], np.float32), np.float32(za), scene.K),
                    )
                    pb = transform_points(
                        jnp.asarray(scene.poses[pos_b], jnp.float32),
                        unproject_to_camera(np.array([ub, vb], np.float32), np.float32(zb), scene.K),
                    )
                    err = float(np.linalg.norm(np.asarray(pa) - np.asarray(pb)))
                rows.append({
                    "scene_name": scene_name, "img_a_idx": idx_a, "img_b_idx": idx_b,
                    "is_valid": bool(valid), "norm_diff_pred_3d": err,
                })
        return pd.DataFrame(
            rows, columns=["scene_name", "img_a_idx", "img_b_idx", "is_valid", "norm_diff_pred_3d"]
        )
