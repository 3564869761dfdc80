"""TPU probe: int8 ACTIVATION STORAGE between layers.

Hypothesis: the thin early stages (stage1/stage2) convert poorly to int8
(1.11-1.16x measured, tools/tpu_probe_int8_stages.py) because they are
HBM-bandwidth-bound on their large activations — and the current Int8Conv
formulation quantizes at the CONSUMER, so inter-layer tensors still
materialize in bf16. With static scales, the quantize is pure elementwise
and can instead ride the PRODUCER's epilogue: conv -> s32 -> dequant ->
bias/BN/ReLU -> quantize -> int8 materialized. That halves both the write
and the next conv's read.

Measures a stage1-shaped conv chain (7x [3x3, 64ch] at 120x160) and a
stage2-shaped one, B=256, three ways:
  A. bf16 chain (baseline)
  B. int8 convs, quantize-at-consumer (current Int8Conv static semantics:
     bf16 tensors between layers)
  C. int8 convs, quantize-at-producer (int8 tensors between layers)

All three end by summing the output (fused fetch). If C meaningfully beats
B at these shapes, the block modules get an int8-storage serving mode;
otherwise this documents the negative result.

  PYTHONPATH=/root/repo:/root/.axon_site timeout 2500 python tools/tpu_probe_int8_act.py
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    assert jax.devices()[0].platform == "tpu"
    B = 256
    results = {}

    def conv(x, w, preferred=None):
        dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=preferred)

    def quant(x, s):
        return jnp.clip(jnp.round(x / s), -127, 127).astype(jnp.int8)

    for name, (H, W, C, n_layers) in (
            ("stage1", (120, 160, 64, 7)),
            ("stage2", (60, 80, 128, 8))):
        rng = np.random.RandomState(0)
        ws = [jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.bfloat16)
              for _ in range(n_layers)]
        wqs = [quant(w.astype(jnp.float32), 0.05 / 127.0) for w in ws]
        x0 = jnp.asarray(rng.rand(B, H, W, C), jnp.bfloat16)
        s_act = jnp.float32(4.0 / 127.0)  # static per-layer scale stand-in
        s_w = jnp.float32(0.05 / 127.0)

        def chain_bf16(x, ws):
            for w in ws:
                x = jax.nn.relu(conv(x, w))
            return jnp.sum(x.astype(jnp.float32))

        def chain_consumer(x, wqs):
            # current semantics: bf16 between layers, quantize before conv
            for wq in wqs:
                xq = quant(x.astype(jnp.float32), s_act)
                y = conv(xq, wq, preferred=jnp.int32)
                x = jax.nn.relu(y.astype(jnp.float32) * (s_act * s_w)
                                ).astype(jnp.bfloat16)
            return jnp.sum(x.astype(jnp.float32))

        def chain_producer(x, wqs):
            # int8 between layers: quantize rides the producer epilogue
            xq = quant(x.astype(jnp.float32), s_act)
            for wq in wqs:
                y = conv(xq, wq, preferred=jnp.int32)
                f = jax.nn.relu(y.astype(jnp.float32) * (s_act * s_w))
                xq = quant(f, s_act)
            return jnp.sum(xq.astype(jnp.float32))

        for label, fn, arg in (("bf16", chain_bf16, ws),
                               ("int8_consumer", chain_consumer, wqs),
                               ("int8_producer", chain_producer, wqs)):
            if label == "bf16":
                run = functools.partial(fn, ws=arg)
            else:
                run = functools.partial(fn, wqs=arg)
            K = 10

            def scan_run(x):
                # fold each iteration's output back into the carry so the
                # chain cannot be hoisted out of the loop (keeps the scan
                # honest — same guard as tpu_probe_int8_forward.py)
                def body(c, _):
                    s = run(c)
                    c2 = c + (0.0 * s).astype(c.dtype)
                    return c2, s

                _, vals = lax.scan(body, x, None, length=K)
                return jnp.sum(vals)

            scan_jit = jax.jit(scan_run)
            float(scan_jit(x0))  # compile + warm
            t0 = time.perf_counter()
            float(scan_jit(x0))
            dt = (time.perf_counter() - t0) / K * 1000
            results[f"{name}_{label}"] = round(dt, 2)
            print(f"{name} {label}: {dt:.2f} ms", flush=True)

        a, b, c = (results[f"{name}_bf16"], results[f"{name}_int8_consumer"],
                   results[f"{name}_int8_producer"])
        print(f"{name}: consumer {a/b:.2f}x, producer {a/c:.2f}x vs bf16; "
              f"producer vs consumer {b/c:.2f}x", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
