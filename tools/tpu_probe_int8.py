"""Probe: does XLA:TPU lower int8 convolutions to the MXU's 2x int8 path?

v5e peak is ~197 bf16 TFLOPS vs ~394 int8 TOPS. If s8 x s8 -> s32 convs hit
the int8 MXU path, a post-training-quantized serving forward could ~2x the
829 img/s bf16 headline. This probe times a stage3/stage4-shaped dilated
conv in bf16 vs int8 before we invest in a quantized serving path.

Run (background, long timeout — tunnel compiles are slow):
  PYTHONPATH=/root/repo:/root/.axon_site timeout 1500 python tools/tpu_probe_int8.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pdc_tpu.utils.compilation_cache import enable as enable_cache

enable_cache()

K_ITERS = 20


def time_conv(x, w, dil, label):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    acc_t = jnp.int32 if x.dtype == jnp.int8 else None

    def body(c, _):
        y = jax.lax.conv_general_dilated(
            c, w, (1, 1), "SAME", rhs_dilation=(dil, dil),
            dimension_numbers=dn, preferred_element_type=acc_t)
        # keep the carry dtype stable so the loop chains convolutions
        c2 = y.astype(x.dtype) if acc_t else y
        # renormalize to avoid int overflow driving zeros
        if acc_t:
            c2 = jnp.clip(y // 256, -127, 127).astype(jnp.int8)
        return c2, ()

    @jax.jit
    def run(x):
        c, _ = jax.lax.scan(body, x, None, length=K_ITERS)
        return c.astype(jnp.float32).sum()

    # warm up (compile) then time with a scalar fetch (tunnel-safe sync)
    t0 = time.time()
    float(run(x))
    compile_s = time.time() - t0
    t0 = time.time()
    float(run(x))
    per_iter_ms = (time.time() - t0) / K_ITERS * 1e3
    flops = 2 * np.prod(x.shape) * w.shape[0] * w.shape[1] * w.shape[3]
    print(f"{label}: {per_iter_ms:.2f} ms/conv  (compile {compile_s:.1f} s, "
          f"{flops / per_iter_ms / 1e9:.1f} TFLOP/s-equiv)", flush=True)
    return per_iter_ms


def main():
    rng = np.random.RandomState(0)
    # stage4-like: [16, 60, 80, 512] x [3,3,512,512] dil 4
    for (B, H, W, C, dil) in [(16, 60, 80, 256, 2), (16, 60, 80, 512, 4)]:
        xb = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
        wb = jnp.asarray(rng.randn(3, 3, C, C) * 0.01, jnp.bfloat16)
        xi = jnp.asarray(rng.randint(-127, 127, (B, H, W, C)), jnp.int8)
        wi = jnp.asarray(rng.randint(-127, 127, (3, 3, C, C)), jnp.int8)
        tb = time_conv(xb, wb, dil, f"bf16 conv {C}ch dil{dil}")
        ti = time_conv(xi, wi, dil, f"int8 conv {C}ch dil{dil}")
        print(f"  -> int8/bf16 speed ratio: {tb / ti:.2f}x", flush=True)


if __name__ == "__main__":
    main()
