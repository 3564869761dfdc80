"""Cross-instance keypoint evaluation — the class-consistency benchmark.

Rebuild of the reference's keypoint flow
(``evaluation.py:407-472`` evaluate_network_cross_scene_keypoints,
``:1433-1552`` single_image_pair_cross_scene_keypoints_quantitative_analysis,
``:2413-2463`` run_cross_instance_keypoint_evaluation_on_network) used for
the shoes/class-consistent experiments: human-labeled keypoints on images of
*different object instances* are matched through descriptor space, and
per-keypoint pixel/3D/descriptor errors are aggregated.

TPU-first differences from the reference:

  * all keypoints of an image pair (both orderings) are evaluated in ONE
    on-device [HW, N] distance-matrix program
    (:func:`pdc_tpu.evaluation.evaluate._match_statistics_device`) instead of
    a python loop of per-keypoint numpy argmins;
  * descriptor images are computed once per (scene, image) and cached, as in
    the reference, but stay on device until the statistics are done;
  * the reference's coordinate-mixing bug at evaluation.py:1524 (uv_1 is
    built from data[idx_1]['u'] but data[idx_2]['v']) is NOT reproduced —
    uv_1 uses idx_1's u and v.

Label format (same YAML the reference consumes): a list of entries
``{scene_name, object_id, image_idx, keypoints: {name: {u, v}}}``.
"""

from __future__ import annotations

import itertools
import logging
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from pdc_tpu.evaluation.evaluate import (
    EVAL_COLUMNS,
    DenseCorrespondenceEvaluation,
    _match_statistics_device,
)
from pdc_tpu.utils.yaml_io import load_yaml, save_yaml

logger = logging.getLogger(__name__)

KEYPOINT_STAT_COLUMNS = [
    "keypoint_name", "num_pairs", "pixel_match_error_l2_mean",
    "pixel_match_error_l2_median", "norm_diff_descriptor_mean",
    "norm_diff_pred_3d_mean", "norm_diff_pred_3d_median",
    "fraction_pixels_closer_than_ground_truth_mean",
]


def single_image_pair_cross_scene_keypoints_quantitative_analysis(
        dcn, dataset, keypoint_data_a: dict, keypoint_data_b: dict,
        res_a=None, res_b=None):
    """Per-keypoint match statistics for one cross-instance image pair, both
    orderings (reference evaluation.py:1433-1552). Returns a list of row
    dicts in the 23-column schema."""
    scene_a, scene_b = keypoint_data_a["scene_name"], keypoint_data_b["scene_name"]
    idx_a, idx_b = int(keypoint_data_a["image_idx"]), int(keypoint_data_b["image_idx"])

    rgb_a, depth_a, mask_a, pose_a = dataset.get_rgbd_mask_pose(scene_a, idx_a)
    rgb_b, depth_b, mask_b, pose_b = dataset.get_rgbd_mask_pose(scene_b, idx_b)

    if res_a is None:
        res_a = dcn.forward_on_img(rgb_a)
    if res_b is None:
        res_b = dcn.forward_on_img(rgb_b)

    # per-side intrinsics: each side unprojects with its own scene's K
    K_a = dataset.get_scene(scene_a).K
    K_b = dataset.get_scene(scene_b).K

    kps_a = keypoint_data_a["keypoints"]
    kps_b = keypoint_data_b["keypoints"]
    kp_names = sorted(kps_a.keys())
    for name in kp_names:
        if name not in kps_b:
            raise ValueError(
                f"keypoint {name} appears in one list of annotated data but not the other")

    def clip_uv(kp):
        return dcn.clip_pixel_to_image_size_and_round((kp["u"], kp["v"]))

    uv_a_list = np.asarray([clip_uv(kps_a[n]) for n in kp_names], np.int32)
    uv_b_list = np.asarray([clip_uv(kps_b[n]) for n in kp_names], np.int32)

    # both orderings in one device call: rows [std..., rev...]
    orderings = [
        ("standard", depth_a, depth_b, mask_b, pose_a, pose_b, res_a, res_b,
         uv_a_list, uv_b_list, scene_a, scene_b, idx_a, idx_b,
         keypoint_data_a.get("object_id"), keypoint_data_b.get("object_id"),
         K_a, K_b),
        ("reverse", depth_b, depth_a, mask_a, pose_b, pose_a, res_b, res_a,
         uv_b_list, uv_a_list, scene_b, scene_a, idx_b, idx_a,
         keypoint_data_b.get("object_id"), keypoint_data_a.get("object_id"),
         K_b, K_a),
    ]

    rows = []
    for (order, d1, d2, m2, p1, p2, r1, r2, uv1, uv2,
         sn1, sn2, i1, i2, oid1, oid2, K1, K2) in orderings:
        stats = _match_statistics_device(
            jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(m2),
            jnp.asarray(uv1), jnp.asarray(uv2),
            jnp.asarray(p1, jnp.float32), jnp.asarray(p2, jnp.float32),
            r1, r2, jnp.asarray(K1, jnp.float32), jnp.asarray(K2, jnp.float32),
        )
        stats = {k: np.asarray(v) for k, v in stats.items()}
        for i, name in enumerate(kp_names):
            row = {c: None for c in EVAL_COLUMNS}
            row.update(
                scene_name_a=sn1, scene_name_b=sn2,
                img_a_idx=i1, img_b_idx=i2,
                object_id_a=oid1, object_id_b=oid2,
                keypoint_name=name,
                is_valid=bool(stats["is_valid"][i]),
                is_valid_masked=bool(stats["is_valid_masked"][i]),
            )
            for c in EVAL_COLUMNS:
                if c in stats and row[c] is None:
                    row[c] = float(stats[c][i])
            rows.append(row)
    return rows


def evaluate_network_cross_scene_keypoints(dcn, dataset, keypoint_labels,
                                           fused: bool = True):
    """All-pairs keypoint evaluation (reference evaluation.py:407-472).

    With ``fused`` (default, real DCNs only) descriptor images are computed
    in batched forwards and every pair-ordering's statistics run in one
    ``lax.scan`` dispatch with keypoints padded to the max count — the
    per-pair loop pays ~2 dispatch round trips per pair.

    :param keypoint_labels: list of label entries, or a path to the YAML file
    :return: pandas DataFrame in the 23-column schema
    """
    import pandas as pd

    if isinstance(keypoint_labels, str):
        keypoint_labels = load_yaml(keypoint_labels)
    logger.info("num cross instance labels: %d", len(keypoint_labels))

    if fused and hasattr(dcn, "forward") and len(keypoint_labels) >= 2:
        return _evaluate_keypoints_fused(dcn, dataset, keypoint_labels)

    # (scene_name, image_idx) -> descriptor image, computed once
    descriptor_images = DenseCorrespondenceEvaluation.compute_descriptor_images_batched(
        dcn, dataset,
        [(e["scene_name"], int(e["image_idx"])) for e in keypoint_labels])

    rows = []
    num_pairs = 0
    for a, b in itertools.combinations(keypoint_labels, 2):
        num_pairs += 1
        rows.extend(single_image_pair_cross_scene_keypoints_quantitative_analysis(
            dcn, dataset, a, b,
            res_a=descriptor_images[(a["scene_name"], int(a["image_idx"]))],
            res_b=descriptor_images[(b["scene_name"], int(b["image_idx"]))],
        ))
    logger.info("num_pairs considered: %d", num_pairs)
    return pd.DataFrame(rows, columns=EVAL_COLUMNS)


def _evaluate_keypoints_fused(dcn, dataset, labels):
    """All pair-orderings' keypoint statistics in one device dispatch."""
    import jax
    import pandas as pd

    # unique images: descriptor images (batched forwards) + raw frames
    keys = []
    for e in labels:
        k = (e["scene_name"], int(e["image_idx"]))
        if k not in keys:
            keys.append(k)
    res_map = DenseCorrespondenceEvaluation.compute_descriptor_images_batched(
        dcn, dataset, keys)
    kidx = {k: j for j, k in enumerate(keys)}
    res_stack = jnp.stack([jnp.asarray(res_map[k]) for k in keys])
    depths, masks, poses, Ks = [], [], [], []
    for s, i in keys:
        _, d, m, p = dataset.get_rgbd_mask_pose(s, i)
        depths.append(np.asarray(d))
        masks.append(np.asarray(m))
        poses.append(np.asarray(p, np.float32))
        Ks.append(np.asarray(dataset.get_scene(s).K, np.float32))
    depths, masks = np.stack(depths), np.stack(masks)
    poses, Ks = np.stack(poses), np.stack(Ks)

    # one entry per pair-ordering; keypoints padded to the max count
    def clip_uv(kp):
        return dcn.clip_pixel_to_image_size_and_round((kp["u"], kp["v"]))

    entries = []  # (i1, i2, uv1, uv2, meta, ordering)
    num_pairs = 0
    for a, b in itertools.combinations(labels, 2):
        num_pairs += 1
        kp_names = sorted(a["keypoints"].keys())
        for name in kp_names:
            if name not in b["keypoints"]:
                raise ValueError(f"keypoint {name} appears in one list of "
                                 "annotated data but not the other")
        ia = kidx[(a["scene_name"], int(a["image_idx"]))]
        ib = kidx[(b["scene_name"], int(b["image_idx"]))]
        uv_a = np.asarray([clip_uv(a["keypoints"][n]) for n in kp_names], np.int32)
        uv_b = np.asarray([clip_uv(b["keypoints"][n]) for n in kp_names], np.int32)
        meta = (a, b, kp_names)
        entries.append((ia, ib, uv_a, uv_b, meta, "standard"))
        entries.append((ib, ia, uv_b, uv_a, meta, "reverse"))

    km = max(len(e[2]) for e in entries)
    if km == 0:
        return pd.DataFrame([], columns=EVAL_COLUMNS)
    uv1 = np.zeros((len(entries), km, 2), np.int32)
    uv2 = np.zeros((len(entries), km, 2), np.int32)
    for j, (_, _, a1, a2, _, _) in enumerate(entries):
        uv1[j, : len(a1)] = a1
        uv2[j, : len(a2)] = a2

    xs = {
        "i1": jnp.asarray([e[0] for e in entries], jnp.int32),
        "i2": jnp.asarray([e[1] for e in entries], jnp.int32),
        "uv1": jnp.asarray(uv1),
        "uv2": jnp.asarray(uv2),
    }
    d_depths, d_masks = jnp.asarray(depths), jnp.asarray(masks)
    d_poses, d_Ks = jnp.asarray(poses), jnp.asarray(Ks)

    @jax.jit
    def run(res_stack, depths, masks, poses, Ks, xs):
        def body(carry, x):
            # per-side intrinsics: each image unprojects with its own K
            stats = dict(_match_statistics_device(
                depths[x["i1"]], depths[x["i2"]], masks[x["i2"]],
                x["uv1"], x["uv2"],
                poses[x["i1"]], poses[x["i2"]],
                res_stack[x["i1"]], res_stack[x["i2"]],
                Ks[x["i1"]], Ks[x["i2"]]))
            stats.pop("uv_b_pred", None)
            stats.pop("uv_b_pred_masked", None)
            return carry, stats

        _, ys = jax.lax.scan(body, 0, xs)
        return ys

    stats_np = jax.device_get(run(res_stack, d_depths, d_masks, d_poses,
                                  d_Ks, xs))

    rows = []
    for j, (_, _, _, _, (a, b, kp_names), order) in enumerate(entries):
        if order == "standard":
            sn1, sn2 = a["scene_name"], b["scene_name"]
            i1, i2 = int(a["image_idx"]), int(b["image_idx"])
            oid1, oid2 = a.get("object_id"), b.get("object_id")
        else:
            sn1, sn2 = b["scene_name"], a["scene_name"]
            i1, i2 = int(b["image_idx"]), int(a["image_idx"])
            oid1, oid2 = b.get("object_id"), a.get("object_id")
        for i, name in enumerate(kp_names):
            row = {c: None for c in EVAL_COLUMNS}
            row.update(
                scene_name_a=sn1, scene_name_b=sn2,
                img_a_idx=i1, img_b_idx=i2,
                object_id_a=oid1, object_id_b=oid2,
                keypoint_name=name,
                is_valid=bool(stats_np["is_valid"][j, i]),
                is_valid_masked=bool(stats_np["is_valid_masked"][j, i]),
            )
            for c in EVAL_COLUMNS:
                if c in stats_np and row[c] is None:
                    row[c] = float(stats_np[c][j, i])
            rows.append(row)
    logger.info("num_pairs considered: %d", num_pairs)
    return pd.DataFrame(rows, columns=EVAL_COLUMNS)


def keypoint_statistics(df):
    """Per-keypoint aggregate statistics (the summary the reference's
    keypoint notebooks derive from the CSV)."""
    import pandas as pd

    rows = []
    for name, g in df.groupby("keypoint_name"):
        px = g["pixel_match_error_l2"].dropna()
        d3 = g["norm_diff_pred_3d"].dropna()
        rows.append({
            "keypoint_name": name,
            "num_pairs": len(g),
            "pixel_match_error_l2_mean": float(px.mean()) if len(px) else np.nan,
            "pixel_match_error_l2_median": float(px.median()) if len(px) else np.nan,
            "norm_diff_descriptor_mean": float(g["norm_diff_descriptor"].dropna().mean()),
            "norm_diff_pred_3d_mean": float(d3.mean()) if len(d3) else np.nan,
            "norm_diff_pred_3d_median": float(d3.median()) if len(d3) else np.nan,
            "fraction_pixels_closer_than_ground_truth_mean": float(
                g["fraction_pixels_closer_than_ground_truth"].dropna().mean()),
        })
    return pd.DataFrame(rows, columns=KEYPOINT_STAT_COLUMNS)


def plot_keypoint_cdfs(df, output_path: Optional[str] = None):
    """Pixel-error CDF per keypoint + overall (the per-keypoint analog of the
    reference's quant plots). Returns the stats dict written alongside."""
    from pdc_tpu.evaluation.plotting import cdf_at_threshold, empirical_cdf

    stats = {}
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(10, 6))
    except ImportError:  # pragma: no cover
        fig = ax = None

    for name, g in df.groupby("keypoint_name"):
        px = g["pixel_match_error_l2"].dropna().to_numpy()
        stats[str(name)] = {
            "pck_at_5px": cdf_at_threshold(px, 5),
            "pck_at_10px": cdf_at_threshold(px, 10),
            "pck_at_25px": cdf_at_threshold(px, 25),
        }
        if ax is not None and px.size:
            x, cum = empirical_cdf(px)
            ax.plot(x, cum, label=str(name))
    overall = df["pixel_match_error_l2"].dropna().to_numpy()
    stats["overall"] = {
        "pck_at_5px": cdf_at_threshold(overall, 5),
        "pck_at_10px": cdf_at_threshold(overall, 10),
        "pck_at_25px": cdf_at_threshold(overall, 25),
    }
    if ax is not None:
        if overall.size:
            x, cum = empirical_cdf(overall)
            ax.plot(x, cum, "k--", label="overall", linewidth=2)
        ax.set_xlabel("keypoint pixel match error (L2)")
        ax.set_ylabel("fraction of pairs")
        ax.legend()
        if output_path is not None:
            fig.savefig(output_path, bbox_inches="tight")
        import matplotlib.pyplot as plt

        plt.close(fig)
    return stats


def run_cross_instance_keypoint_evaluation_on_network(
        model_folder: str, path_to_cross_instance_labels,
        save_folder_name: str = "analysis/cross_scene_keypoints",
        dataset=None, save: bool = True, num_qualitative_pairs: int = 0):
    """One call on a model folder -> the keypoint analysis artifact set
    (reference evaluation.py:2413-2463): data.csv + keypoint_statistics.csv +
    keypoint_cdf.png + keypoint_stats.yaml (+ optional qualitative keypoint
    heatmap panels for the first label pairs).

    :param dataset: optional; reconstructed from the folder's dataset.yaml
        when omitted (as the reference's dcn.load_training_dataset does)
    :return: the per-match DataFrame
    """
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

    dcn = DenseCorrespondenceNetwork.from_model_folder(model_folder)
    if dataset is None:
        dataset = DenseCorrespondenceEvaluation.load_dataset_from_model_folder(
            model_folder)

    labels = path_to_cross_instance_labels
    if isinstance(labels, str):
        labels = load_yaml(labels)
    df = evaluate_network_cross_scene_keypoints(dcn, dataset, labels)

    if save:
        output_dir = os.path.join(model_folder, save_folder_name)
        os.makedirs(output_dir, exist_ok=True)
        df.to_csv(os.path.join(output_dir, "data.csv"))
        keypoint_statistics(df).to_csv(
            os.path.join(output_dir, "keypoint_statistics.csv"))
        stats = plot_keypoint_cdfs(
            df, output_path=os.path.join(output_dir, "keypoint_cdf.png"))
        save_yaml(stats, os.path.join(output_dir, "keypoint_stats.yaml"))
        if num_qualitative_pairs > 0:
            _write_keypoint_qualitative(dcn, dataset, labels, output_dir,
                                        num_qualitative_pairs)
    logger.info("finished cross-scene keypoint evaluation")
    return df


def _write_keypoint_qualitative(dcn, dataset, labels, output_dir: str,
                                num_pairs: int):
    """Keypoint heatmap panels for the first label pairs (reference
    evaluation.py:1257-1345 rendered headlessly per pair/keypoint)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pdc_tpu.evaluation.qualitative import (
        single_image_pair_keypoint_qualitative_analysis,
    )

    written = 0
    for a, b in itertools.combinations(labels, 2):
        if written >= num_pairs:
            break
        for name in sorted(a["keypoints"]):
            if name not in b["keypoints"]:
                continue
            kd_a = dict(scene_name=a["scene_name"],
                        image_idx=a["image_idx"], **a["keypoints"][name])
            kd_b = dict(scene_name=b["scene_name"],
                        image_idx=b["image_idx"], **b["keypoints"][name])
            fig = single_image_pair_keypoint_qualitative_analysis(
                dcn, dataset, kd_a, kd_b,
                plot_title=f"keypoint {name}")
            fig.savefig(os.path.join(
                output_dir, f"keypoint_qual_{written:02d}_{name}.png"),
                bbox_inches="tight")
            plt.close(fig)
        written += 1
