"""TPU probe: full-network fwd+bwd MFU vs batch size (VERDICT r4 task 7 —
close or certify the remaining train-MFU headroom).

The per-stage study (tpu_probe_train_stages.py) showed the dilated stages'
backward runs at 74-78% of peak at the shipped B=8-pair (16-image) shape
and that layout reformulations are measured-neutral. The remaining lever is
TILE OCCUPANCY: more images give the dgrad/wgrad contractions more MXU
tiles per layer. This sweep measures the whole fwd+bwd (train-mode BN,
value_and_grad, K iterations per dispatch, fused scalar fetch) at 16/32/64
images and reports XLA-cost-analysis MFU for each, plus the implied
images/s. Prints one JSON dict.
"""

import json
import sys
import time

import numpy as np

V5E_PEAK_BF16_TFLOPS = 197.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from pdc_tpu.utils.compilation_cache import enable as _cc
    _cc()
    import jax
    import jax.numpy as jnp

    from pdc_tpu.models.resnet import ResNet34_8s

    assert jax.devices()[0].platform == "tpu", jax.devices()
    results = {"device": str(jax.devices()[0])}
    H, W, D = 480, 640, 3
    model = ResNet34_8s(D, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def lf(params, stats, x):
        out, mut = model.apply(
            {"params": params, "batch_stats": stats}, x, train=True,
            mutable=["batch_stats"])
        return jnp.mean(out.astype(jnp.float32)), mut["batch_stats"]

    grad_fn = jax.value_and_grad(lf, has_aux=True)

    for NB in (16, 32, 64):
        K = 10
        imgs = jax.device_put(np.random.rand(NB, H, W, 3).astype(np.float32))

        @jax.jit
        def loop(params, stats, x):
            def body(c, _):
                (v, _new), grads = grad_fn(params, stats, x + c)
                gsum = sum(jnp.sum(g.astype(jnp.float32))
                           for g in jax.tree_util.tree_leaves(grads))
                return c + 1e-9, v + 0.0 * gsum
            _, vs = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return jnp.sum(vs)

        cost = jax.jit(lambda p, s, xx: grad_fn(p, s, xx)).lower(
            params, stats, imgs).compile().cost_analysis()
        flops = float((cost or {}).get("flops", 0.0))

        float(loop(params, stats, imgs))  # compile + warm
        # sanity: trivial dispatch must return promptly or the tunnel window
        # is polluted (CLAUDE.md gotcha)
        t0 = time.perf_counter()
        float(jnp.float32(1.0) + 1.0)
        triv = time.perf_counter() - t0
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            float(loop(params, stats, imgs))
            times.append(time.perf_counter() - t0)
        ms = min(times) / K * 1e3
        pct = flops / (ms / 1e3) / 1e12 / V5E_PEAK_BF16_TFLOPS
        results[f"fwd_bwd_{NB}img"] = {
            "ms": round(ms, 2), "gflops": round(flops / 1e9, 1),
            "pct_peak": round(100 * pct, 1),
            "images_per_sec": round(NB / (ms / 1e3), 1),
            "trivial_dispatch_s": round(triv, 3)}
        log(f"NB={NB}: {ms:.1f} ms, {flops/1e9:.0f} GFLOPs, "
            f"{pct:.1%} of peak, trivial={triv:.2f}s")

    print(json.dumps(results))


if __name__ == "__main__":
    sys.exit(main())
