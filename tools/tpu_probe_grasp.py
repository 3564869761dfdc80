"""TPU probe 4: grasp-point streaming latency (BASELINE config 5 analog).

A manipulation controller streams camera frames and asks, per frame, where
its stored grasp-point descriptors are (the reference does this with a CPU
numpy argmin after pulling the descriptor image off the GPU —
live_heatmap_visualization.py:254-331). Measures the fused
frame -> normalize -> forward -> matmul-argmin program per frame at 640x480,
single frame (latency) and small batches (throughput), bf16.

Timing: K frames inside one lax.scan dispatch (tunnel RTT would otherwise
dominate single-frame numbers).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pdc_tpu.models.dcn import build_backbone

    assert jax.devices()[0].platform == "tpu"
    H, W, D, Q = 480, 640, 3, 16
    model = build_backbone({"descriptor_dimension": D,
                            "backbone": {"model_class": "Resnet",
                                         "resnet_name": "Resnet34_8s"}},
                           dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, H, W, 3), jnp.float32), train=False)
    queries = jax.device_put(np.random.rand(Q, D).astype(np.float32))
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])
    results = {}

    import dataclasses

    for mode in ("bf16", "int8", "int8s"):
      quant = mode != "bf16"
      net = dataclasses.replace(model, quant_int8=True,
                                quant_static=(mode == "int8s")) \
          if quant else model
      if mode == "int8s":
          # calibrate static scales with one mutable pass
          calib = jnp.asarray(
              np.random.RandomState(1).randn(1, H, W, 3), jnp.float32)
          _, mut = net.apply({**variables, "quant_scales": {}}, calib,
                             train=False, mutable=["quant_scales"])
          variables = {**variables, "quant_scales": mut["quant_scales"]}
      tag = "" if mode == "bf16" else mode + "_"
      for B in (1, 4, 8):
        K = 20

        @jax.jit
        def stream(variables, frames, queries):
            def body(c, _):
                x = (frames.astype(jnp.float32) / 255.0 - mean) / std + c
                res = net.apply(variables, x, train=False)
                HW = H * W
                flat = res.reshape(B, HW, D).astype(jnp.float32)
                rnorm = jnp.sum(jnp.square(flat), axis=-1)  # [B, HW]
                cross = jnp.einsum("bpd,qd->bpq", flat, queries,
                                   preferred_element_type=jnp.float32)
                d2 = (rnorm[..., None] - 2 * cross
                      + jnp.sum(jnp.square(queries), axis=-1))
                idx = jnp.argmin(d2, axis=1)  # [B, Q]
                return c + 1e-6, jnp.sum(idx)
            _, s = jax.lax.scan(body, 0.0, None, length=K)
            return jnp.sum(s)

        frames = jax.device_put(
            np.random.randint(0, 255, (B, H, W, 3), np.uint8))
        t0 = time.perf_counter()
        float(stream(variables, frames, queries))
        print(f"{tag}B={B} compile+first: {time.perf_counter()-t0:.1f}s",
              file=sys.stderr, flush=True)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(stream(variables, frames, queries))
            times.append(time.perf_counter() - t0)
        ms = min(times) / K * 1e3
        results[f"grasp_stream_{tag}b{B}_ms_per_frame_batch"] = round(ms, 2)
        results[f"grasp_stream_{tag}b{B}_fps"] = round(B * K / min(times), 1)
        print(f"{tag}B={B}: {ms:.2f} ms/call, {B*K/min(times):.1f} frames/s",
              file=sys.stderr, flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
