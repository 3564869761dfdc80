"""TPU probe: the zero-to-trained-network walkthrough, end to end.

Reference baseline: "you can go from zero to a trained dense descriptor
network in 30 minutes or less" (doc/tutorial_getting_started.md:3) — the
3500-iteration training tutorial (12-15 min on a GTX 1080 Ti) plus the
~5-minute quantitative evaluation.

This runs the same journey on one chip: build a 640x480 dataset, train the
reference schedule (3500 steps, batch 1, Adam 1e-4 x0.9/250, matrix bf16 —
the shipped defaults) through the real trainer (device cache + lax.scan
steps), then the full fused quantitative evaluation (100 pairs x 100
matches) on the trained folder. Reports wall-clock per phase.
"""

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import copy

    import jax

    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation as DCE
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork
    from pdc_tpu.training.train import DenseCorrespondenceTraining

    assert jax.devices()[0].platform == "tpu"
    results = {"device": str(jax.devices()[0])}

    H, W = 480, 640
    t_all = time.perf_counter()

    t0 = time.perf_counter()
    ds = SpartanDataset.make_synthetic(num_scenes=2, width=W, height=H,
                                       num_frames=12, object_radius=0.3)
    results["dataset_build_s"] = round(time.perf_counter() - t0, 1)
    log(f"dataset: {results['dataset_build_s']}s")

    cfg = copy.deepcopy(DenseCorrespondenceTraining.load_default_config())
    t = cfg["training"]
    t.update(num_iterations=3500, batch_size=1, logging_dir="trained_models",
             logging_dir_name="tpu_journey", save_rate=3500,
             logging_rate=500, compute_test_loss_rate=0,
             # 50 steps/dispatch: at 23 ms/step the default K=10 leaves the
             # schedule bound by the tunnel's ~0.3 s dispatch round trip
             steps_per_dispatch=50)
    net = cfg["dense_correspondence_network"]
    net.update(image_width=W, image_height=H)

    t0 = time.perf_counter()
    trainer = DenseCorrespondenceTraining(config=cfg, dataset=ds)
    folder = trainer.run()
    results["train_3500_s"] = round(time.perf_counter() - t0, 1)
    log(f"train 3500 steps: {results['train_3500_s']}s -> {folder}")

    t0 = time.perf_counter()
    dcn = DenseCorrespondenceNetwork.from_model_folder(folder)
    df = DCE.evaluate_network_quantitative(dcn, ds, num_image_pairs=100,
                                           num_matches_per_image_pair=100)
    results["eval_100x100_s"] = round(time.perf_counter() - t0, 1)

    from pdc_tpu.evaluation.plotting import DenseCorrespondenceEvaluationPlotter

    stats = DenseCorrespondenceEvaluationPlotter.run_on_single_dataframe(
        None, dataframe=df, save=False)
    results["pck_at_5px"] = round(float(stats["pck_at_5px"]), 3)
    results["pck_at_10px"] = round(float(stats["pck_at_10px"]), 3)
    results["median_pixel_error"] = round(
        float(df["pixel_match_error_l2"].median()), 2)
    results["total_s"] = round(time.perf_counter() - t_all, 1)
    results["vs_reference_30min"] = round(1800.0 / results["total_s"], 1)
    log(f"eval: {results['eval_100x100_s']}s; total {results['total_s']}s")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
