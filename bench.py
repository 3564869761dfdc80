"""Benchmark: descriptor inference throughput at 640x480 (images/sec/chip).

Runs on whatever jax.devices() provides (the driver runs it on one real TPU
chip). Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Timing notes:
  * the forward is fused with a scalar reduction and synchronized by fetching
    that scalar — ``block_until_ready`` alone does not reliably block through
    the axon TPU tunnel and reports physically-impossible numbers
  * bfloat16 compute, batch 256 (throughput-optimal on a single chip; the
    descriptor image stays bf16 through the x8 resize), 8 microbatches per
    dispatch via lax.scan — the steady-state serving shape (a per-iteration
    counter offset keeps XLA from hoisting the forward out of the loop)
  * MFU context printed to stderr: forward = 200.2 GFLOPs/image at 640x480
    (XLA cost analysis), v5e peak ~197 bf16 TFLOPS

``vs_baseline`` divides by the reference's implied forward throughput on its
own hardware: 3500 train iterations (2 forwards + 1 backward) in ~12-15 min
on a GTX 1080 Ti (BASELINE.md) => ~13 forward-equivalents/sec — the most
generous reading of the reference's single-image inference path.
"""

import json
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 13.0  # reference forward throughput, GTX 1080 Ti


def main():
    import jax
    import jax.numpy as jnp

    from pdc_tpu.models.dcn import build_backbone
    from pdc_tpu.utils.compilation_cache import enable

    enable()  # persistent compile cache: first bench run pays the ~10 min
    # tunnel compile once; later runs (and the driver's) reuse it
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"

    H, W, D = 480, 640, 3
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = build_backbone(
        {"descriptor_dimension": D,
         "backbone": {"model_class": "Resnet", "resnet_name": "Resnet34_8s"}},
        dtype=dtype,
    )

    B = 256 if on_tpu else 1
    x = jnp.zeros((B, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    # Steady-state serving shape: K microbatches per dispatch (lax.scan), so
    # the measurement reflects device throughput rather than per-call host
    # dispatch latency (which a pipelined server overlaps with compute; the
    # axon tunnel serializes it at ~0.3 s/call). The scalar fetch at the end
    # is still a hard sync across all K batches.
    K = 8 if on_tpu else 1

    @jax.jit
    def fwd_sum(variables, imgs):
        def body(c, _):
            out = model.apply(variables, imgs + c, train=False)
            return c + jnp.float32(1e-6), jnp.sum(out.astype(jnp.float32))
        _, sums = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return jnp.sum(sums)

    # warmup / compile (scalar fetch = hard sync)
    float(fwd_sum(variables, x))

    imgs = jax.device_put(np.random.rand(B, H, W, 3).astype(np.float32))
    n_reps = 5 if on_tpu else 2
    times = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        float(fwd_sum(variables, imgs))
        times.append(time.perf_counter() - t0)

    images_per_sec = B * K / min(times)
    if on_tpu:
        import sys

        mfu = images_per_sec * 200.2e9 / 197e12  # fwd GFLOPs / v5e bf16 peak
        print(f"MFU (v5e, 200.2 GFLOPs/img): {mfu:.1%}", file=sys.stderr)
    print(json.dumps({
        "metric": "descriptor_inference_images_per_sec_per_chip_640x480",
        "value": round(images_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(images_per_sec / BASELINE_IMAGES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
