"""int8-PTQ serving forward vs bf16 at the headline benchmark shape.

Times the full ResNet-34-8s descriptor forward (640x480, D=3) at B=256 with
K=8 scan iterations per dispatch — the exact shape of bench.py's 829 img/s
bf16 headline — with and without ``quant_int8``.

  PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python tools/tpu_probe_int8_forward.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from pdc_tpu.models.resnet import ResNet34_8s
from pdc_tpu.utils.compilation_cache import enable as enable_cache

enable_cache()

B, H, W, D, K = 256, 480, 640, 3, 8


def measure(quant: bool, variables, x, static: bool = False):
    import dataclasses

    m = ResNet34_8s(D, dtype=jnp.bfloat16)
    if quant:
        m = dataclasses.replace(m, quant_int8=True, quant_static=static)

    def body(c, _):
        y = m.apply(variables, c, train=False)
        # fold the output back into the carry so iterations chain (keeps the
        # scan honest) while staying shape-stable
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
    label = ("int8s" if static else "int8") if quant else "bf16"
    print(f"{label}: {best * 1e3:.1f} ms/batch = {B / best:.0f} img/s "
          f"(compile {compile_s:.0f} s)", flush=True)
    return best


def main():
    rng = np.random.RandomState(0)
    m = ResNet34_8s(D, dtype=jnp.bfloat16)
    x_small = jnp.zeros((1, H, W, 3), jnp.bfloat16)
    variables = m.init(jax.random.PRNGKey(0), x_small, train=False)
    x = jnp.asarray(rng.randn(B, H, W, 3), jnp.bfloat16)
    # time a trivial dispatch first: if the tunnel is stalled, abort
    t0 = time.time()
    float(jnp.ones((8, 8)).sum())
    tunnel = time.time() - t0
    print(f"tunnel round-trip {tunnel:.1f} s", flush=True)
    tb = measure(False, variables, x)
    ti = measure(True, variables, x)
    print(f"int8/bf16 end-to-end forward speedup: {tb / ti:.2f}x", flush=True)

    # static calibrated scales (real implementation: populate quant_scales
    # with one mutable pass, then time the static serving program)
    import dataclasses
    ms = dataclasses.replace(ResNet34_8s(D, dtype=jnp.bfloat16),
                             quant_int8=True, quant_static=True)
    _, mutated = ms.apply({**variables, "quant_scales": {}},
                          x[:8], train=False, mutable=["quant_scales"])
    vs = {**variables, "quant_scales": mutated["quant_scales"]}
    ts = measure(True, vs, x, static=True)
    print(f"int8-static/bf16 speedup: {tb / ts:.2f}x "
          f"(vs dynamic int8: {ti / ts:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
