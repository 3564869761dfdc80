"""Probe: im2col (patches-matmul) stem vs lax conv, fwd+bwd at train shape.

The per-stage fwd+bwd table (BENCHMARKS.md) shows the 7x7/s2 stem costing
10.1 ms of the 72.6 ms B=16 train-mode fwd+bwd for 0.5% of the FLOPs —
the conv7x7 weight gradient is a 3-input-channel contraction that wastes
125/128 MXU lanes. Reformulating the stem as
    patches = conv_general_dilated_patches(x)   # [B, Ho, Wo, 147]
    y = patches @ W.reshape(147, 64)
turns the wgrad into a [147, N] x [N, 64] tall-skinny matmul (N = B*Ho*Wo)
with full lane utilization, at the cost of materializing the 147-wide patch
tensor in HBM (~361 MB bf16 at B=16, ~0.9 ms of bandwidth).

Measures both formulations under value_and_grad (wrt W; the image is not a
differentiable input in training, so dx is DCE'd in both) and checks
numerics. K=10 calls per dispatch; tunnel-stall guard.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    assert jax.devices()[0].platform == "tpu"
    from pdc_tpu.utils.compilation_cache import enable
    enable()

    B, H, W = 16, 480, 640
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, 3), jnp.bfloat16)
    w = jnp.asarray(rng.randn(7, 7, 3, 64) * 0.05, jnp.bfloat16)
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    K = 10

    # tunnel-stall guard
    t0 = time.time()
    float(jnp.ones((8, 8)).sum())
    print(f"tunnel rtt {time.time() - t0:.1f} s", file=sys.stderr, flush=True)

    def conv_stem(w, x):
        return lax.conv_general_dilated(
            x, w, (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn)

    def im2col_stem(w, x):
        p = lax.conv_general_dilated_patches(
            x, (7, 7), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=dn)  # [B, Ho, Wo, 147] (feature-major C,kh,kw)
        # conv_general_dilated_patches orders features as (C, kh, kw); match
        # the HWIO kernel by transposing to (kh, kw, C) before flattening.
        wm = jnp.transpose(w, (2, 0, 1, 3)).reshape(147, 64)
        return jax.lax.dot_general(
            p, wm, (((3,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(x.dtype)

    # numerics check (fwd + wgrad) in f32
    xf = x[:1].astype(jnp.float32)
    wf = w.astype(jnp.float32)
    y1 = conv_stem(wf, xf)
    y2 = im2col_stem(wf, xf)
    print("fwd max|diff|:", float(jnp.max(jnp.abs(y1 - y2))), flush=True)
    g1 = jax.grad(lambda w: jnp.sum(jnp.square(conv_stem(w, xf))))(wf)
    g2 = jax.grad(lambda w: jnp.sum(jnp.square(im2col_stem(w, xf))))(wf)
    print("wgrad max rel diff:",
          float(jnp.max(jnp.abs(g1 - g2) / (jnp.abs(g1) + 1e-3))), flush=True)

    def measure(fn, label):
        @jax.jit
        def bench(w, x):
            def body(c, _):
                def loss(w):
                    return jnp.sum(jnp.square(fn(w, x + c).astype(jnp.float32)))
                v, g = jax.value_and_grad(loss)(w)
                return c + jnp.bfloat16(1e-6), v + jnp.sum(g.astype(jnp.float32))
            _, s = lax.scan(body, jnp.bfloat16(0.0), None, length=K)
            return jnp.sum(s)

        t0 = time.time()
        float(bench(w, x))
        compile_s = time.time() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            float(bench(w, x))
            best = min(best, (time.time() - t0) / K)
        print(f"{label}: {best * 1e3:.2f} ms fwd+bwd (compile {compile_s:.0f} s)",
              flush=True)
        return best

    tc = measure(conv_stem, "lax conv stem")
    ti = measure(im2col_stem, "im2col stem  ")
    print(f"im2col speedup fwd+bwd: {tc / ti:.2f}x", flush=True)


if __name__ == "__main__":
    main()
