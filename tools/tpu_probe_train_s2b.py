"""TPU probe: space-to-batch dilated stages (dilated_s2b=True) vs plain
dilated convs, full-model fwd+bwd at the train shape AND inference at the
serving shape. The per-stage breakdown showed the dilated stages' backward
at 74-78% of peak (forward 90-94%); in s2b layout every dilated 3x3 is a
dense 3x3 on d^2 subgrids, so dgrad/wgrad tile as standard convolutions.
Numerically exact (tests/test_models.py::test_dilated_s2b_exact_equality).
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from pdc_tpu.utils.compilation_cache import enable as _cc
    _cc()
    import jax
    import jax.numpy as jnp

    from pdc_tpu.models.resnet import ResNet34_8s

    assert jax.devices()[0].platform == "tpu", jax.devices()
    H, W, D = 480, 640, 3
    dt = jnp.bfloat16
    results = {}

    def timed_grad(model, variables, x, K=10, reps=4):
        def lf(params, stats, x):
            out, mut = model.apply({"params": params, "batch_stats": stats},
                                   x, train=True, mutable=["batch_stats"])
            return jnp.mean(out.astype(jnp.float32)), mut["batch_stats"]

        grad_fn = jax.value_and_grad(lf, has_aux=True)

        @jax.jit
        def loop(params, stats, x):
            def body(c, _):
                (v, _), grads = grad_fn(params, stats, x + c)
                gsum = sum(jnp.sum(g.astype(jnp.float32))
                           for g in jax.tree_util.tree_leaves(grads))
                return c + 1e-9, v + 0.0 * gsum
            _, vs = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return jnp.sum(vs)

        params, stats = variables["params"], variables.get("batch_stats", {})
        float(loop(params, stats, x))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(params, stats, x))
            times.append(time.perf_counter() - t0)
        return min(times) / K * 1e3

    def timed_fwd(model, variables, x, K=8, reps=4):
        @jax.jit
        def loop(v, x):
            def body(c, _):
                out = model.apply(v, x + c, train=False)
                return c + 1e-9, jnp.sum(out.astype(jnp.float32))
            _, s = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return jnp.sum(s)

        float(loop(variables, x))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(variables, x))
            times.append(time.perf_counter() - t0)
        return min(times) / K * 1e3

    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    plain = ResNet34_8s(D, dtype=dt)
    s2b = ResNet34_8s(D, dtype=dt, dilated_s2b=True)
    v = plain.init(jax.random.PRNGKey(0), x0, train=False)

    # train shape: 16 images = 8 pairs
    imgs = jax.device_put(np.random.rand(16, H, W, 3).astype(np.float32))
    ms_p = timed_grad(plain, v, imgs)
    results["train_plain_ms"] = round(ms_p, 2)
    log(f"fwd+bwd plain:  {ms_p:.2f} ms")
    ms_s = timed_grad(s2b, v, imgs)
    results["train_s2b_ms"] = round(ms_s, 2)
    log(f"fwd+bwd s2b:    {ms_s:.2f} ms ({ms_p / ms_s:.2f}x)")

    # serving shape: B=256, scan K=8 (the bench.py point)
    imgs2 = jax.device_put(np.random.rand(256, H, W, 3).astype(np.float32))
    ms_pf = timed_fwd(plain, v, imgs2)
    results["infer_b256_plain_ms"] = round(ms_pf, 2)
    log(f"infer B=256 plain: {ms_pf:.2f} ms ({256 / ms_pf * 1e3:.0f} img/s)")
    ms_sf = timed_fwd(s2b, v, imgs2)
    results["infer_b256_s2b_ms"] = round(ms_sf, 2)
    log(f"infer B=256 s2b:   {ms_sf:.2f} ms ({256 / ms_sf * 1e3:.0f} img/s)")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
