"""Probe: int8 serving with STATIC (calibrated) activation scales.

The shipped ``Int8Conv`` computes the activation scale dynamically
(abs-max over the tensor) before every conv — an extra full HBM pass per
layer that cannot fuse into the conv's producer (two-phase: reduce, then
quantize). With calibrated per-layer scales the quantize becomes a pure
elementwise op. This probe monkeypatches a constant scale in to measure the
ceiling of a calibration pass before building one.

  PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python tools/tpu_probe_int8_static.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import pdc_tpu.models.resnet as R
from pdc_tpu.utils.compilation_cache import enable as enable_cache

enable_cache()

B, H, W, D, K = 256, 480, 640, 3, 8


def patch_static_scale():
    """Rebind resnet.Int8Conv to a variant whose activation scale is a
    constant (perf-equivalent to a calibrated per-layer scale; numerics
    irrelevant for this probe)."""
    import flax.linen as nn
    from jax import lax

    class StaticInt8Conv(nn.Conv):
        quant_int8: bool = False

        @nn.compact
        def __call__(self, x):
            if not self.quant_int8:
                return super().__call__(x)
            kh, kw = self.kernel_size
            kernel = self.param("kernel", self.kernel_init,
                                (kh, kw, x.shape[-1], self.features),
                                self.param_dtype)
            bias = (self.param("bias", self.bias_init, (self.features,),
                               self.param_dtype) if self.use_bias else None)
            s_x = jnp.float32(0.05)  # static calibrated scale stand-in
            xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                          -127, 127).astype(jnp.int8)
            kf = kernel.astype(jnp.float32)
            s_w = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)),
                              1e-8) / 127.0
            wq = jnp.clip(jnp.round(kf / s_w), -127, 127).astype(jnp.int8)

            def _pair(v):
                if v is None:
                    return (1, 1)
                return (v, v) if isinstance(v, int) else tuple(v)

            dn = lax.conv_dimension_numbers(x.shape, wq.shape,
                                            ("NHWC", "HWIO", "NHWC"))
            y = lax.conv_general_dilated(
                xq, wq, _pair(self.strides), self.padding,
                rhs_dilation=_pair(self.kernel_dilation),
                dimension_numbers=dn, preferred_element_type=jnp.int32)
            out = y.astype(jnp.float32) * (s_x * s_w)
            if bias is not None:
                out = out + bias.astype(jnp.float32)
            return out.astype(self.dtype or x.dtype)

    R.Int8Conv = StaticInt8Conv


def measure(label, quant):
    import dataclasses

    m = R.ResNet34_8s(D, dtype=jnp.bfloat16)
    if quant:
        m = dataclasses.replace(m, quant_int8=True)
    x_small = jnp.zeros((1, H, W, 3), jnp.bfloat16)
    variables = m.init(jax.random.PRNGKey(0), x_small, train=False)
    x = jnp.asarray(np.random.RandomState(0).randn(B, H, W, 3), jnp.bfloat16)

    def body(c, _):
        y = m.apply(variables, c, train=False)
        c2 = c + 0.0 * y[..., :1].astype(c.dtype).mean()
        return c2, y.mean()

    @jax.jit
    def run(x):
        _, ys = jax.lax.scan(body, x, None, length=K)
        return ys.sum()

    t0 = time.time()
    float(run(x))
    compile_s = time.time() - t0
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        float(run(x))
        best = min(best, (time.time() - t0) / K)
    print(f"{label}: {best * 1e3:.1f} ms/batch = {B / best:.0f} img/s "
          f"(compile {compile_s:.0f} s)", flush=True)
    return best


def main():
    assert jax.devices()[0].platform == "tpu"
    t0 = time.time()
    float(jnp.ones((8, 8)).sum())
    print(f"tunnel rtt {time.time() - t0:.1f} s", flush=True)

    t_dyn = measure("int8 dynamic scales", True)
    patch_static_scale()
    t_sta = measure("int8 static scales ", True)
    print(f"static/dynamic speedup: {t_dyn / t_sta:.2f}x", flush=True)


if __name__ == "__main__":
    main()
