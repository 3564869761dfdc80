"""Fused quantitative sweep (one lax.scan dispatch over all pairs) must
produce exactly the rows of the per-pair host-loop path."""

import numpy as np
import pandas as pd
import pytest

from pdc_tpu.data.dataset import SpartanDataset
from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation as DCE
from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

W, H = 64, 48


@pytest.fixture(scope="module")
def setup():
    ds = SpartanDataset.make_synthetic(num_scenes=2, width=W, height=H,
                                       num_frames=4, object_radius=0.3)
    dcn = DenseCorrespondenceNetwork.from_config({
        "backbone": {"model_class": "Resnet", "resnet_name": "Resnet18_8s"},
        "descriptor_dimension": 3, "image_width": W, "image_height": H})
    return ds, dcn


def test_fused_matches_per_pair_loop(setup):
    ds, dcn = setup
    kwargs = dict(num_image_pairs=4, num_matches_per_image_pair=20, seed=1)
    df_loop = DCE.evaluate_network_quantitative(dcn, ds, fused=False, **kwargs)
    df_fused = DCE.evaluate_network_quantitative(dcn, ds, fused=True, **kwargs)

    assert len(df_fused) == len(df_loop) > 0
    assert list(df_fused.columns) == list(df_loop.columns)
    # identical pair bookkeeping and row order
    for c in ("scene_name", "img_a_idx", "img_b_idx", "is_valid",
              "is_valid_masked"):
        assert (df_fused[c] == df_loop[c]).all(), c
    # numeric statistics agree (same programs, same inputs)
    num_cols = [c for c in df_loop.columns
                if df_loop[c].dtype.kind == "f" and df_loop[c].notna().any()]
    assert "pixel_match_error_l2" in num_cols
    for c in num_cols:
        np.testing.assert_allclose(
            df_fused[c].to_numpy(), df_loop[c].to_numpy(),
            rtol=1e-4, atol=1e-4, err_msg=c, equal_nan=True)


def test_fused_is_default_and_plotter_compatible(setup, tmp_path):
    ds, dcn = setup
    df = DCE.evaluate_network_quantitative(dcn, ds, num_image_pairs=2,
                                           num_matches_per_image_pair=10)
    assert isinstance(df, pd.DataFrame) and len(df)
    from pdc_tpu.evaluation.plotting import DenseCorrespondenceEvaluationPlotter

    stats = DenseCorrespondenceEvaluationPlotter.run_on_single_dataframe(
        None, dataframe=df, save=False)
    assert "pck_at_5px" in stats


def test_eval_reproducible_across_calls(setup):
    """The reference pins seeds at every quantitative entry
    (reset_random_seed, evaluation.py:259 etc.); repeated sweeps must draw
    the same pairs and produce identical CSVs."""
    ds, dcn = setup
    kwargs = dict(num_image_pairs=2, num_matches_per_image_pair=10, seed=3)
    df1 = DCE.evaluate_network_quantitative(dcn, ds, **kwargs)
    df2 = DCE.evaluate_network_quantitative(dcn, ds, **kwargs)
    pd.testing.assert_frame_equal(df1, df2)


def test_across_objects_fused_matches_loop():
    ds = SpartanDataset.make_synthetic(num_scenes=2, num_objects=2,
                                       width=W, height=H, num_frames=4,
                                       object_radius=0.3)
    dcn = DenseCorrespondenceNetwork.from_config({
        "backbone": {"model_class": "Resnet", "resnet_name": "Resnet18_8s"},
        "descriptor_dimension": 3, "image_width": W, "image_height": H})
    kwargs = dict(num_image_pairs=3, num_queries=16, seed=2)
    df_loop = DCE.evaluate_network_across_objects(dcn, ds, fused=False, **kwargs)
    df_fused = DCE.evaluate_network_across_objects(dcn, ds, fused=True, **kwargs)
    assert len(df_fused) == len(df_loop) > 0
    for c in ("scene_name_a", "scene_name_b", "object_id_a", "object_id_b"):
        assert (df_fused[c] == df_loop[c]).all(), c
    # batched vs single-image forwards reassociate conv reductions — allow
    # fp noise, not semantic drift
    np.testing.assert_allclose(
        df_fused["norm_diff_descriptor_best_match"].to_numpy(),
        df_loop["norm_diff_descriptor_best_match"].to_numpy(),
        rtol=2e-3, atol=1e-4)


def test_keypoints_fused_matches_loop():
    from pdc_tpu.evaluation.keypoints import (
        evaluate_network_cross_scene_keypoints)

    ds = SpartanDataset.make_synthetic(num_scenes=3, width=W, height=H,
                                       num_frames=2, object_radius=0.3)
    dcn = DenseCorrespondenceNetwork.from_config({
        "backbone": {"model_class": "Resnet", "resnet_name": "Resnet18_8s"},
        "descriptor_dimension": 3, "image_width": W, "image_height": H})

    labels = []
    for sname in sorted(ds.scenes):
        sc = ds.get_scene(sname)
        on = np.argwhere(np.asarray(sc.mask[0]) != 0)
        v1, u1 = on[len(on) // 3]
        v2, u2 = on[2 * len(on) // 3]
        labels.append({
            "scene_name": sname, "object_id": sc.object_id, "image_idx": 0,
            "keypoints": {"top": {"u": int(u1), "v": int(v1)},
                          "bottom": {"u": int(u2), "v": int(v2)}},
        })

    df_loop = evaluate_network_cross_scene_keypoints(dcn, ds, labels,
                                                     fused=False)
    df_fused = evaluate_network_cross_scene_keypoints(dcn, ds, labels,
                                                      fused=True)
    # 3 pairs x 2 orderings x 2 keypoints
    assert len(df_fused) == len(df_loop) == 12
    for c in ("scene_name_a", "scene_name_b", "img_a_idx", "img_b_idx",
              "keypoint_name", "is_valid", "is_valid_masked"):
        assert (df_fused[c] == df_loop[c]).all(), c
    for c in ("pixel_match_error_l2", "norm_diff_descriptor",
              "norm_diff_pred_3d", "fraction_pixels_closer_than_ground_truth"):
        np.testing.assert_allclose(
            df_fused[c].to_numpy(), df_loop[c].to_numpy(),
            rtol=2e-3, atol=1e-4, err_msg=c, equal_nan=True)
