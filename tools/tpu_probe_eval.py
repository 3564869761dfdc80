"""TPU probe 3: full quantitative-evaluation sweep wall-clock.

Reference baseline: "quantitative eval, 100 image pairs x 100 matches each,
~5 minutes" on a GTX 1080 Ti (training_tutorial.ipynb markdown; BASELINE.md).
This measures the same sweep end to end — pair sampling, batched bf16
forwards, GT correspondence generation, the [HW, N] per-pair statistics
program, DataFrame assembly — on one v5e through the axon tunnel (which adds
~0.3 s per host round trip, so real hosts are faster than this number).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.evaluation.evaluate import DenseCorrespondenceEvaluation as DCE
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork, build_backbone
    import jax.numpy as jnp

    assert jax.devices()[0].platform == "tpu"
    H, W = 480, 640
    ds = SpartanDataset.make_synthetic(num_scenes=2, width=W, height=H,
                                       num_frames=12, object_radius=0.3)
    model = build_backbone({"descriptor_dimension": 3,
                            "backbone": {"model_class": "Resnet",
                                         "resnet_name": "Resnet34_8s"},
                            "compute_dtype": "bfloat16"})
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3), jnp.float32), train=False)
    dcn = DenseCorrespondenceNetwork(model, variables, descriptor_dimension=3,
                                     image_width=W, image_height=H)

    # warm-up (compiles: batched forward, correspondence finder, stats program)
    t0 = time.perf_counter()
    df = DCE.evaluate_network_quantitative(ds, None) if False else None
    df = DCE.evaluate_network_quantitative(dcn, ds, num_image_pairs=2,
                                           num_matches_per_image_pair=100)
    print(f"warmup (compiles): {time.perf_counter()-t0:.1f}s, rows={len(df)}",
          file=sys.stderr, flush=True)

    # first 100-pair sweep includes the P=100 fused-program compile; the
    # second is the steady-state number
    walls = []
    for _ in range(2):
        t0 = time.perf_counter()
        df = DCE.evaluate_network_quantitative(dcn, ds, num_image_pairs=100,
                                               num_matches_per_image_pair=100)
        walls.append(time.perf_counter() - t0)
        print(f"sweep: {walls[-1]:.1f}s", file=sys.stderr, flush=True)
    wall = walls[-1]
    print(json.dumps({
        "eval_100x100_seconds": round(wall, 1),
        "eval_100x100_first_incl_compile_seconds": round(walls[0], 1),
        "rows": int(len(df)),
        "valid_fraction": round(float(np.mean(df["is_valid"])), 3),
        "vs_reference_5min": round(300.0 / wall, 1),
    }, indent=1))


if __name__ == "__main__":
    main()
