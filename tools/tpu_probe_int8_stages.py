"""Per-stage int8-static vs bf16 timing — where the remaining int8
speed-of-light gap lives.

The static int8 serving forward runs at 1406 img/s = ~71% of the int8
speed-of-light (~1970 img/s at 394 TOPS). This probe times each ResNet
stage standalone at the B=256 serving shapes in bf16 and int8-static to
show which stages convert their 2x arithmetic into wall-clock (the dilated
FLOP-heavy stages) and which don't (thin early layers are lane/bandwidth
bound — quantization adds elementwise passes on the largest activations).

  PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python tools/tpu_probe_int8_stages.py
"""

import dataclasses
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from pdc_tpu.models.resnet import BasicBlock
    from pdc_tpu.utils.compilation_cache import enable
    enable()
    assert jax.devices()[0].platform == "tpu"

    B = 256
    dt = jnp.bfloat16
    K = 8

    t0 = time.time()
    float(jnp.ones((8, 8)).sum())
    log(f"tunnel rtt {time.time() - t0:.1f} s")

    class Stage(nn.Module):
        feats: int
        blocks: int
        dilation: int = 1
        stride: int = 1
        quant: bool = False

        @nn.compact
        def __call__(self, x, train=False):
            for i in range(self.blocks):
                x = BasicBlock(
                    features=self.feats,
                    stride=self.stride if i == 0 else 1,
                    dilation=self.dilation, dtype=dt,
                    quant_int8=self.quant, quant_static=self.quant,
                    name=f"block{i}")(x, train)
            return x

    def timed(m, variables, x):
        @jax.jit
        def loop(v, x):
            def body(c, _):
                y = m.apply(v, c, train=False)
                c2 = c + 0.0 * y[..., :1].astype(c.dtype).mean() \
                    if y.shape == c.shape else c + 0.0 * y.astype(c.dtype).mean()
                return c2, jnp.sum(y.astype(jnp.float32))
            _, s = jax.lax.scan(body, x, None, length=K)
            return jnp.sum(s)

        t0 = time.time()
        float(loop(variables, x))
        compile_s = time.time() - t0
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            float(loop(variables, x))
            best = min(best, (time.time() - t0) / K)
        return best * 1e3, compile_s

    # (name, feats, blocks, dilation, stride, input HxWxC)
    stages = [
        ("stage1", 64, 3, 1, 1, (120, 160, 64)),
        ("stage2", 128, 4, 1, 2, (120, 160, 64)),
        ("stage3", 256, 6, 2, 1, (60, 80, 128)),
        ("stage4", 512, 3, 4, 1, (60, 80, 256)),
    ]
    results = {}
    rng = np.random.RandomState(0)
    for name, feats, blocks, dil, stride, (h, w, c) in stages:
        x = jnp.asarray(rng.randn(B, h, w, c) * 0.5, dt)
        m = Stage(feats=feats, blocks=blocks, dilation=dil, stride=stride)
        v = m.init(jax.random.PRNGKey(0), x[:1])
        t_b, cs = timed(m, v, x)
        mq = dataclasses.replace(m, quant=True)
        _, mut = mq.apply({**v, "quant_scales": {}}, x[:1], train=False,
                          mutable=["quant_scales"])
        vq = {**v, "quant_scales": mut["quant_scales"]}
        t_q, cs2 = timed(mq, vq, x)
        results[name] = {"bf16_ms": round(t_b, 2), "int8s_ms": round(t_q, 2),
                         "speedup": round(t_b / t_q, 2)}
        log(f"{name}: bf16 {t_b:.1f} ms, int8-static {t_q:.1f} ms "
            f"({t_b / t_q:.2f}x) [compiles {cs:.0f}/{cs2:.0f}s]")

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
