"""Full-schedule loss-formulation parity: the evidence for use_matrix_loss.

Runs the REFERENCE training schedule — 3500 steps, one 640x480 pair per
step, Adam lr 1e-4 with x0.9 decay every 250 steps, weight decay 1e-4
(config/dense_correspondence/training/training.yaml) — in four cells:

    {matrix (pooled MXU) loss, per-pair (reference-semantics) loss}
      x {float32, bfloat16 compute}

from the SAME initialization, at EQUAL steps, then evaluates each network on
held-out scenes with the reference metric suite: pixel-match-error CDF/AUC,
3D-error AUC, descriptor-GT-error, PCK readings (evaluation.py:2677-2707,
:2843-2863) — writing data.csv + quant_plots.png + stats.yaml per cell under
trained_models/loss_parity_full/.

Training uses the scanned device-resident path (K steps per dispatch) so the
tunnel round trip does not pollute the comparison; all four cells share the
same schedule, sampler, and eval pairs.

Usage:
    python examples/full_schedule_parity.py [--steps 3500] [--cells matrix_bf16,...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

CELLS = {
    "matrix_fp32": dict(use_matrix=True, dtype="float32"),
    "matrix_bf16": dict(use_matrix=True, dtype="bfloat16"),
    "per_pair_fp32": dict(use_matrix=False, dtype="float32"),
    "per_pair_bf16": dict(use_matrix=False, dtype="bfloat16"),
}


def run_cell(name, spec, dataset, steps, W, H, out_dir, seed=0,
             steps_per_dispatch=10):
    import jax
    import numpy as np

    from pdc_tpu.data.assembler import AssemblerConfig
    from pdc_tpu.data.device_cache import DeviceCache
    from pdc_tpu.losses.pixelwise_contrastive import LossConfig
    from pdc_tpu.models.dcn import build_backbone
    from pdc_tpu.training.scanned import make_scanned_train_step
    from pdc_tpu.training.train import create_train_state

    dataset.set_train_mode()
    cache = DeviceCache.from_dataset(dataset)
    config = {
        "training": {"learning_rate": 1e-4, "learning_rate_decay": 0.9,
                     "steps_between_learning_rate_decay": 250,
                     "weight_decay": 1e-4},
        "dense_correspondence_network": {
            "descriptor_dimension": 3,
            "backbone": {"model_class": "Resnet", "resnet_name": "Resnet34_8s"},
            "compute_dtype": spec["dtype"],
        },
    }
    model = build_backbone(config["dense_correspondence_network"])
    # SAME init across cells: the param init key is fixed, independent of spec
    state, tx = create_train_state(model, config, jax.random.PRNGKey(seed), (H, W))

    # reference sampling magnitudes (training.yaml): 10000 match attempts,
    # 150 non-matches/match split 50/50 masked/background
    acfg = AssemblerConfig(
        num_matching_attempts=10000,
        num_masked_non_matches_per_match=75,
        num_background_non_matches_per_match=75,
        use_matrix_loss=spec["use_matrix"],
    )
    step = make_scanned_train_step(
        model, tx, LossConfig(), acfg, W, cache,
        batch_size=1, steps_per_dispatch=steps_per_dispatch,
    )

    key = jax.random.PRNGKey(seed + 1)
    losses = []
    t_compile0 = time.perf_counter()
    key, sub = jax.random.split(key)
    state, m = step(state, sub)
    losses.extend(np.asarray(m["loss"]).tolist())
    compile_s = time.perf_counter() - t_compile0
    print(f"[{name}] first dispatch (compile): {compile_s:.1f}s", flush=True)

    n_dispatch = steps // steps_per_dispatch - 1
    t0 = time.perf_counter()
    for i in range(n_dispatch):
        key, sub = jax.random.split(key)
        state, m = step(state, sub)
        if i % 50 == 0:
            # sync + progress (metric fetch is the scan-amortized sync point)
            print(f"[{name}] step {(i + 2) * steps_per_dispatch}: "
                  f"loss {float(np.asarray(m['loss'])[-1]):.4f}", flush=True)
        losses.extend(np.asarray(m["loss"]).tolist())
    train_s = time.perf_counter() - t0
    steps_done = (n_dispatch + 1) * steps_per_dispatch

    # ---- held-out evaluation with the reference metric suite -------------
    from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation
    from pdc_tpu.evaluation.plotting import (
        DenseCorrespondenceEvaluationPlotter,
        cdf_at_threshold,
        compute_area_above_curve,
    )
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

    dcn = DenseCorrespondenceNetwork(
        model, {"params": state.params, "batch_stats": state.batch_stats},
        descriptor_dimension=3, image_width=W, image_height=H,
    )
    dataset.set_test_mode()
    df = DenseCorrespondenceEvaluation.evaluate_network_quantitative(
        dcn, dataset, num_image_pairs=20, num_matches_per_image_pair=100,
        seed=1,
    )
    dataset.set_train_mode()

    cell_dir = os.path.join(out_dir, name)
    os.makedirs(cell_dir, exist_ok=True)
    csv_path = os.path.join(cell_dir, "data.csv")
    df.to_csv(csv_path)
    stats = DenseCorrespondenceEvaluationPlotter.run_on_single_dataframe(
        csv_path, label=name, output_dir=cell_dir, save=True)

    px = df["pixel_match_error_l2"].dropna().to_numpy()
    d3 = df["norm_diff_pred_3d"].dropna().to_numpy()
    gt_desc = df["norm_diff_descriptor_ground_truth"].dropna().to_numpy()
    result = {
        "steps": steps_done,
        "train_seconds": round(train_s, 1),
        "compile_seconds": round(compile_s, 1),
        "ms_per_step": round(1e3 * train_s / max(steps_done - steps_per_dispatch, 1), 1),
        "final_loss_mean_last_100": round(float(np.mean(losses[-100:])), 4),
        "pixel_error_auc": round(compute_area_above_curve(px), 3),
        "norm_diff_3d_auc": stats.get("norm_diff_3d_area_above_curve"),
        "gt_descriptor_error_median": round(float(np.median(gt_desc)), 4),
        "median_px_error": round(float(np.median(px)), 2),
        "pck_at_3px": round(cdf_at_threshold(px, 3), 4),
        "pck_at_5px": round(cdf_at_threshold(px, 5), 4),
        "pck_at_10px": round(cdf_at_threshold(px, 10), 4),
        "pck_at_25px": round(cdf_at_threshold(px, 25), 4),
        "n_eval_matches": int(px.size),
    }
    with open(os.path.join(cell_dir, "result.json"), "w") as f:
        json.dump(result, f, indent=2)
    np.save(os.path.join(cell_dir, "loss_history.npy"), np.asarray(losses))
    return result


def main():
    from pdc_tpu.utils.compilation_cache import enable
    enable()

    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3500)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=480)
    p.add_argument("--cells", default=",".join(CELLS),
                   help="comma-separated subset of " + ",".join(CELLS))
    p.add_argument("--out", default="trained_models/loss_parity_full")
    p.add_argument("--num_frames", type=int, default=12)
    args = p.parse_args()

    from pdc_tpu.data.dataset import SpartanDataset

    dataset = SpartanDataset.make_synthetic(
        num_scenes=2, num_objects=1, num_test_scenes=1,
        width=args.width, height=args.height, num_frames=args.num_frames,
        object_radius=0.3,
    )
    os.makedirs(args.out, exist_ok=True)
    results = {}
    for name in args.cells.split(","):
        print(f"=== cell {name} ===", flush=True)
        results[name] = run_cell(name, CELLS[name], dataset, args.steps,
                                 args.width, args.height, args.out)
        print(json.dumps({name: results[name]}), flush=True)
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
