"""Benchmark: descriptor inference throughput at 640x480 (images/sec/chip).

Runs on whatever jax.devices() provides (the driver runs it on one real TPU
chip). Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is measured against the reference's implied single-GPU
inference path: the reference trains 3500 iterations (2 forwards + 1 backward
each) in ~12-15 min on a GTX 1080 Ti (BASELINE.md), i.e. ~4.4 steps/s ->
~13 forward-equivalents/s, and its evaluation pipeline (forward + host
round-trip + numpy argmin) sustains low-single-digit images/s. We use the
forward-only reading (13 img/s) as the baseline denominator — the most
generous interpretation for the reference.
"""

import json
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 13.0  # reference forward throughput, GTX 1080 Ti


def main():
    import jax
    import jax.numpy as jnp

    from pdc_tpu.models.dcn import build_backbone

    dev = jax.devices()[0]
    platform = dev.platform

    H, W, D = 480, 640, 3
    # bfloat16 compute on TPU; float32 on CPU fallback
    dtype = jnp.bfloat16 if platform == "tpu" else jnp.float32
    config = {
        "descriptor_dimension": D,
        "backbone": {"model_class": "Resnet", "resnet_name": "Resnet34_8s"},
    }
    model = build_backbone(config, dtype=dtype)

    B = 16 if platform == "tpu" else 1
    x = jnp.zeros((B, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    @jax.jit
    def fwd(variables, imgs):
        return model.apply(variables, imgs, train=False)

    # warmup / compile
    out = fwd(variables, x)
    jax.block_until_ready(out)

    # timed runs
    n_iters = 20 if platform == "tpu" else 3
    imgs = jax.device_put(np.random.rand(B, H, W, 3).astype(np.float32))
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(variables, imgs)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    images_per_sec = B * n_iters / dt
    print(json.dumps({
        "metric": "descriptor_inference_images_per_sec_per_chip_640x480",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
