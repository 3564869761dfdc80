"""TPU hardware probe: inference MFU + Pallas-vs-XLA best match.

Run on the real chip (takes several minutes; compiles are slow through the
axon tunnel). Timing uses fused-scalar fetches — block_until_ready does not
block through the tunnel. Small ops are timed as K iterations inside one
lax.scan dispatch to amortize the ~0.3 s tunnel round trip.

Prints one JSON dict at the end (stdout); progress on stderr.
"""

import json
import sys
import time

import numpy as np

FWD_GFLOPS_PER_IMAGE = 200.2  # XLA cost analysis @ 640x480 (VERDICT round 1)
V5E_PEAK_BF16_TFLOPS = 197.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pdc_tpu.models.dcn import build_backbone

    assert jax.devices()[0].platform == "tpu", jax.devices()
    results = {"device": str(jax.devices()[0])}

    H, W, D = 480, 640, 3

    # ---- inference throughput sweep (new bf16-through-resize path) -------
    model = build_backbone(
        {"descriptor_dimension": D,
         "backbone": {"model_class": "Resnet", "resnet_name": "Resnet34_8s"}},
        dtype=jnp.bfloat16,
    )
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    for B in (64, 96, 128):
        @jax.jit
        def fwd_sum(variables, imgs):
            out = model.apply(variables, imgs, train=False)
            return jnp.sum(out.astype(jnp.float32))

        imgs = jax.device_put(np.random.rand(B, H, W, 3).astype(np.float32))
        t0 = time.perf_counter()
        float(fwd_sum(variables, imgs))
        log(f"B={B} compile+first: {time.perf_counter()-t0:.1f}s")
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(fwd_sum(variables, imgs))
            times.append(time.perf_counter() - t0)
        ips = B / min(times)
        mfu = ips * FWD_GFLOPS_PER_IMAGE / 1e3 / V5E_PEAK_BF16_TFLOPS
        results[f"fwd_b{B}_images_per_sec"] = round(ips, 1)
        results[f"fwd_b{B}_mfu_v5e"] = round(mfu, 3)
        log(f"B={B}: {ips:.1f} img/s, MFU {mfu:.1%}, times {['%.3f'%t for t in times]}")

    # ---- pallas vs XLA best match (640x480 image, Q queries) --------------
    from pdc_tpu.ops.matching import best_matches_batch
    from pdc_tpu.ops.pallas_kernels import pallas_best_match

    HW = H * W
    res_flat = jax.device_put(
        np.random.rand(HW, D).astype(np.float32))
    res_img = res_flat.reshape(H, W, D)

    for Q in (128, 1024):
        queries = jax.device_put(np.random.rand(Q, D).astype(np.float32))
        K = 20

        @jax.jit
        def xla_loop(res_img, queries):
            def body(c, _):
                uv, dist = best_matches_batch(queries + c, res_img)
                return c + 1e-6, jnp.sum(dist)
            _, ds = jax.lax.scan(body, 0.0, None, length=K)
            return jnp.sum(ds)

        @jax.jit
        def pallas_loop(res_flat, queries):
            def body(c, _):
                idx, dist = pallas_best_match(res_flat, queries + c)
                return c + 1e-6, jnp.sum(dist)
            _, ds = jax.lax.scan(body, 0.0, None, length=K)
            return jnp.sum(ds)

        for name, fn, arg in (("xla", xla_loop, res_img),
                              ("pallas", pallas_loop, res_flat)):
            t0 = time.perf_counter()
            float(fn(arg, queries))
            log(f"Q={Q} {name} compile+first: {time.perf_counter()-t0:.1f}s")
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(arg, queries))
                times.append(time.perf_counter() - t0)
            ms = min(times) / K * 1e3
            results[f"best_match_q{Q}_{name}_ms"] = round(ms, 3)
            log(f"Q={Q} {name}: {ms:.3f} ms/call")

        # agreement check (once per Q)
        uv, dist_x = best_matches_batch(queries, res_img)
        idx_p, dist_p = pallas_best_match(res_flat, queries)
        flat_x = np.asarray(uv[:, 1]) * W + np.asarray(uv[:, 0])
        agree = float(np.mean(flat_x == np.asarray(idx_p)))
        results[f"best_match_q{Q}_agreement"] = agree
        log(f"Q={Q} agreement: {agree:.4f}")

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
