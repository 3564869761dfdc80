"""TPU probe 2: larger inference batches + refreshed train-step timing."""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pdc_tpu.models.dcn import build_backbone

    assert jax.devices()[0].platform == "tpu"
    results = {}
    H, W, D = 480, 640, 3

    model = build_backbone(
        {"descriptor_dimension": D,
         "backbone": {"model_class": "Resnet", "resnet_name": "Resnet34_8s"}},
        dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    for B in (160, 192, 256):
        @jax.jit
        def fwd_sum(variables, imgs):
            out = model.apply(variables, imgs, train=False)
            return jnp.sum(out.astype(jnp.float32))

        try:
            imgs = jax.device_put(np.random.rand(B, H, W, 3).astype(np.float32))
            t0 = time.perf_counter()
            float(fwd_sum(variables, imgs))
            log(f"B={B} compile+first: {time.perf_counter()-t0:.1f}s")
            times = []
            for _ in range(4):
                t0 = time.perf_counter()
                float(fwd_sum(variables, imgs))
                times.append(time.perf_counter() - t0)
            ips = B / min(times)
            results[f"fwd_b{B}_images_per_sec"] = round(ips, 1)
            log(f"B={B}: {ips:.1f} img/s")
        except Exception as e:  # OOM guard
            log(f"B={B} failed: {type(e).__name__}")
            results[f"fwd_b{B}_images_per_sec"] = None
            break

    # refreshed scanned train step, 640x480 B=8 bf16, K=10
    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.data.device_cache import DeviceCache
    from pdc_tpu.data.assembler import AssemblerConfig
    from pdc_tpu.losses.pixelwise_contrastive import LossConfig
    from pdc_tpu.training.scanned import make_scanned_train_step
    from pdc_tpu.training.train import create_train_state

    ds = SpartanDataset.make_synthetic(num_scenes=2, width=W, height=H,
                                       num_frames=8, object_radius=0.3)
    cache = DeviceCache.from_dataset(ds)
    config = {
        "training": {"learning_rate": 1e-4, "learning_rate_decay": 0.9,
                     "steps_between_learning_rate_decay": 250,
                     "weight_decay": 1e-4},
        "dense_correspondence_network": {
            "descriptor_dimension": 3,
            "backbone": {"model_class": "Resnet", "resnet_name": "Resnet34_8s"},
            "compute_dtype": "bfloat16",
        },
    }
    model2 = build_backbone(config["dense_correspondence_network"])
    state, tx = create_train_state(model2, config, jax.random.PRNGKey(0), (H, W))
    acfg = AssemblerConfig(num_matching_attempts=10000,
                           num_masked_non_matches_per_match=75,
                           num_background_non_matches_per_match=75,
                           use_matrix_loss=True)
    B, K = 8, 10
    step = make_scanned_train_step(model2, tx, LossConfig(), acfg, W, cache,
                                   batch_size=B, steps_per_dispatch=K)
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    key, sub = jax.random.split(key)
    state, m = step(state, sub)
    float(np.asarray(m["loss"])[-1])
    log(f"train compile+first: {time.perf_counter()-t0:.1f}s")
    times = []
    for _ in range(4):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, m = step(state, sub)
        float(np.asarray(m["loss"])[-1])
        times.append(time.perf_counter() - t0)
    ms_per_step = min(times) / K * 1e3
    results["train_b8_bf16_ms_per_step"] = round(ms_per_step, 1)
    results["train_b8_bf16_pairs_per_sec"] = round(B * 1e3 / ms_per_step, 1)
    log(f"train: {ms_per_step:.1f} ms/step ({B*1e3/ms_per_step:.1f} pairs/s)")

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
