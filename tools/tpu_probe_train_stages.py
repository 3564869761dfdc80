"""TPU probe: per-stage FWD+BWD timing of the ResNet-34-8s train step
(round-3 directive #6 — locate the train-MFU gap the aggregate number
hides). Methodology matches tpu_probe_stages.py (K iterations per lax.scan
dispatch, fused scalar fetch through the tunnel), but each piece runs under
``jax.value_and_grad`` with train-mode BN, at the training batch shape
(2B images for B pairs).

FLOPs per piece come from XLA's own cost analysis of the compiled
grad program, so the %-of-peak column is exact for what actually ran.

Prints one JSON dict (stdout); progress on stderr.
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
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from pdc_tpu.models.resnet import BasicBlock, ResNet34_8s

    assert jax.devices()[0].platform == "tpu", jax.devices()
    results = {"device": str(jax.devices()[0])}

    B_PAIRS = 8
    NB = 2 * B_PAIRS  # images per train step
    H, W, D = 480, 640, 3
    dt = jnp.bfloat16

    def timed_grad_scan(module, variables, x, K=10, reps=4):
        """ms/iter + XLA-reported TFLOPs of one fwd+bwd of ``module``."""

        def lf(params, stats, x):
            out, mut = module.apply(
                {"params": params, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"])
            return jnp.mean(out.astype(jnp.float32)), mut["batch_stats"]

        grad_fn = jax.value_and_grad(lf, has_aux=True)

        @jax.jit
        def loop(params, stats, x):
            def body(c, _):
                (v, new_stats), grads = grad_fn(params, stats, x + c)
                gsum = sum(jnp.sum(g.astype(jnp.float32))
                           for g in jax.tree_util.tree_leaves(grads))
                return c + 1e-9, v + 0.0 * gsum
            _, vs = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return jnp.sum(vs)

        params = variables["params"]
        stats = variables.get("batch_stats", {})
        lowered = jax.jit(lambda p, s, xx: grad_fn(p, s, xx)).lower(
            params, stats, x)
        cost = lowered.compile().cost_analysis()
        flops = float((cost or {}).get("flops", 0.0))

        float(loop(params, stats, x))  # compile + warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(loop(params, stats, x))
            times.append(time.perf_counter() - t0)
        ms = min(times) / K * 1e3
        return ms, flops

    def report(name, ms, flops):
        tflops_s = flops / (ms / 1e3) / 1e12
        pct = tflops_s / V5E_PEAK_BF16_TFLOPS
        results[name] = {"ms": round(ms, 2),
                         "gflops": round(flops / 1e9, 1),
                         "pct_peak": round(100 * pct, 1)}
        log(f"{name}: {ms:.2f} ms, {flops/1e9:.0f} GFLOPs fwd+bwd, "
            f"{pct:.0%} of v5e bf16 peak")

    # ---- full model fwd+bwd ------------------------------------------------
    model = ResNet34_8s(D, dtype=dt)
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    imgs = jax.device_put(np.random.rand(NB, H, W, 3).astype(np.float32))
    ms, fl = timed_grad_scan(model, variables, imgs)
    report("full_fwd_bwd", ms, fl)

    # ---- stem --------------------------------------------------------------
    class Stem(nn.Module):
        dtype: object = dt

        @nn.compact
        def __call__(self, x, train=False):
            x = x.astype(self.dtype)
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                        use_bias=False, dtype=self.dtype, name="stem_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name="stem_bn")(x)
            x = nn.relu(x)
            return nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding=[(1, 1), (1, 1)])

    stem = Stem()
    sv = stem.init(jax.random.PRNGKey(0), x0, train=False)
    ms, fl = timed_grad_scan(stem, sv, imgs)
    report("stem", ms, fl)

    # ---- stages on their real input shapes ---------------------------------
    stage_cfg = [  # (blocks, feats, stride, dilation, in_ch, in_h, in_w)
        (3, 64, 1, 1, 64, H // 4, W // 4),
        (4, 128, 2, 1, 64, H // 4, W // 4),
        (6, 256, 1, 2, 128, H // 8, W // 8),
        (3, 512, 1, 4, 256, H // 8, W // 8),
    ]

    class Stage(nn.Module):
        blocks: int
        feats: int
        stride: int
        dilation: int
        dtype: object = dt

        @nn.compact
        def __call__(self, x, train=False):
            for i in range(self.blocks):
                x = BasicBlock(self.feats, self.stride if i == 0 else 1,
                               self.dilation, dtype=self.dtype,
                               name=f"b{i}")(x, train)
            return x

    for si, (blocks, feats, stride, dil, in_ch, in_h, in_w) in enumerate(
            stage_cfg, start=1):
        stg = Stage(blocks, feats, stride, dil)
        xin = jax.device_put(
            np.random.rand(NB, in_h, in_w, in_ch).astype(np.float32))
        v = stg.init(jax.random.PRNGKey(si), xin[:1], train=False)
        ms, fl = timed_grad_scan(stg, v, xin)
        report(f"stage{si}", ms, fl)

    # ---- head + resize -----------------------------------------------------
    class HeadResize(nn.Module):
        dtype: object = dt

        @nn.compact
        def __call__(self, x, train=False):
            import jax as _jax

            x = nn.Conv(D, (1, 1), dtype=self.dtype, name="head")(x)
            return _jax.image.resize(
                x, (x.shape[0], H, W, x.shape[-1]), method="linear")

    hr = HeadResize()
    xin = jax.device_put(
        np.random.rand(NB, H // 8, W // 8, 512).astype(np.float32))
    hv = hr.init(jax.random.PRNGKey(9), xin[:1], train=False)
    ms, fl = timed_grad_scan(hr, hv, xin)
    report("head_resize", ms, fl)

    pieces = sum(results[k]["ms"] for k in results
                 if isinstance(results.get(k), dict) and k != "full_fwd_bwd")
    results["pieces_sum_ms"] = round(pieces, 2)
    log(f"sum of pieces: {pieces:.1f} ms vs full {results['full_fwd_bwd']['ms']} ms")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
