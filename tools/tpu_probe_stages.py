"""TPU hardware probe: per-stage timing of the ResNet-34-8s inference
forward, to locate the remaining MFU gap (stem lane waste, dilated stages,
head/resize bandwidth).

Times each piece as K iterations inside one lax.scan dispatch (the axon
tunnel adds ~0.3 s per host round trip and ignores block_until_ready, so
all timing uses fused scalar fetches).

Prints one JSON dict at the end (stdout); progress on stderr.
"""

import json
import sys
import time

import numpy as np

V5E_PEAK_BF16_TFLOPS = 197.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_scan(fn, args, K=10, reps=3):
    """Time fn(*args) as K scan iterations in one dispatch; returns ms/call."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop(*args):
        def body(c, _):
            out = fn(*args, c)
            return c + 1e-6, jnp.sum(out.astype(jnp.float32))
        _, s = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return jnp.sum(s)

    t0 = time.perf_counter()
    float(loop(*args))
    compile_s = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / K * 1e3, compile_s


def main():
    from pdc_tpu.utils.compilation_cache import enable as _cc
    _cc()
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from pdc_tpu.models.resnet import BasicBlock, ResNet34_8s

    assert jax.devices()[0].platform == "tpu", jax.devices()
    results = {"device": str(jax.devices()[0])}

    B, H, W, D = 128, 480, 640, 3
    dt = jnp.bfloat16

    # ---- full model reference point --------------------------------------
    model = ResNet34_8s(D, dtype=dt)
    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    imgs = jax.device_put(np.random.rand(B, H, W, 3).astype(np.float32))

    ms, cs = timed_scan(
        lambda v, im, c: model.apply(v, im + c, train=False), (variables, imgs))
    results["full_ms"] = round(ms, 2)
    log(f"full model B={B}: {ms:.2f} ms ({B/ms*1e3:.0f} img/s) [compile {cs:.0f}s]")

    # scan-amortized full model at larger batch (the steady-state serving
    # shape: K microbatches per dispatch, no per-call host round trip)
    for B2 in (192, 256):
        imgs2 = jax.device_put(np.random.rand(B2, H, W, 3).astype(np.float32))
        ms2, _ = timed_scan(
            lambda v, im, c: model.apply(v, im + c, train=False),
            (variables, imgs2), K=8)
        results[f"full_b{B2}_ms"] = round(ms2, 2)
        mfu = (B2 / ms2 * 1e3) * 200.2 / 1e3 / V5E_PEAK_BF16_TFLOPS
        log(f"full model B={B2} (scan K=8): {ms2:.2f} ms "
            f"({B2/ms2*1e3:.0f} img/s, {mfu:.0%} MFU)")

    # ---- stem: conv7x7/s2 + bn + relu + maxpool --------------------------
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
    sv = stem.init(jax.random.PRNGKey(0), x0)
    ms, _ = timed_scan(lambda v, im, c: stem.apply(v, im + c), (sv, imgs))
    results["stem_ms"] = round(ms, 2)
    log(f"stem: {ms:.2f} ms")

    # ---- stem, space-to-depth formulation --------------------------------
    # conv 7x7/s2 on (H,W,3) == conv 4x4/s1 on the 2x2 space-to-depth input
    # with an 8x8 zero-padded kernel rearranged to (4,4,12,64). 12 input
    # channels -> 4x the MXU lane utilization of 3.
    class StemS2D(nn.Module):
        dtype: object = dt

        @nn.compact
        def __call__(self, x, train=False):
            x = x.astype(self.dtype)
            b, h, w, ch = x.shape
            # pad left/top so the 8x8 kernel aligns with the 7x7 padding=3:
            # 7x7 pad 3 == 8x8 pad (4,3) with a zero first row/col; pad to
            # (4,4) so the size stays even and slice the spurious output.
            x = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
            # space-to-depth 2x2
            x = x.reshape(b, (h + 8) // 2, 2, (w + 8) // 2, 2, ch)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, (h + 8) // 2, (w + 8) // 2, 4 * ch)
            x = nn.Conv(64, (4, 4), strides=(1, 1), padding="VALID",
                        use_bias=False, dtype=self.dtype, name="stem_conv")(x)
            x = x[:, : h // 2, : w // 2, :]
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name="stem_bn")(x)
            x = nn.relu(x)
            return nn.max_pool(x, (3, 3), strides=(2, 2),
                               padding=[(1, 1), (1, 1)])

    s2d = StemS2D()
    s2v = s2d.init(jax.random.PRNGKey(0), x0)
    ms, _ = timed_scan(lambda v, im, c: s2d.apply(v, im + c), (s2v, imgs))
    results["stem_s2d_ms"] = round(ms, 2)
    log(f"stem space-to-depth: {ms:.2f} ms")

    # ---- stages on their real input shapes -------------------------------
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

    stage_total = 0.0
    for si, (blocks, feats, stride, dil, cin, hh, ww) in enumerate(stage_cfg):
        st = Stage(blocks, feats, stride, dil)
        xin = jax.device_put(np.random.rand(B, hh, ww, cin).astype(np.float32))
        vin = st.init(jax.random.PRNGKey(0), jnp.zeros((1, hh, ww, cin)))
        ms, _ = timed_scan(
            lambda v, im, c, _st=st: _st.apply(v, im + c), (vin, xin))
        results[f"stage{si+1}_ms"] = round(ms, 2)
        stage_total += ms
        # bf16 FLOPs of the stage
        gflops = 0.0
        ch_in = cin
        for i in range(blocks):
            s = stride if i == 0 else 1
            oh, ow = hh // s, ww // s
            gflops += 2 * 9 * ch_in * feats * oh * ow / 1e9
            gflops += 2 * 9 * feats * feats * oh * ow / 1e9
            if ch_in != feats or s != 1:
                gflops += 2 * ch_in * feats * oh * ow / 1e9
            ch_in = feats
            hh, ww = oh, ow
        eff = gflops * B / (ms / 1e3) / 1e3 / V5E_PEAK_BF16_TFLOPS
        log(f"stage{si+1}: {ms:.2f} ms  ({gflops:.1f} GF/img, {eff:.0%} of peak)")

    # ---- head + resize ---------------------------------------------------
    class HeadResize(nn.Module):
        dtype: object = dt

        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(D, (1, 1), dtype=self.dtype, name="head")(x)
            return jax.image.resize(x, (x.shape[0], H, W, D), method="linear")

    hr = HeadResize()
    xin = jax.device_put(
        np.random.rand(B, H // 8, W // 8, 512).astype(np.float32)
    ).astype(jnp.bfloat16)
    hv = hr.init(jax.random.PRNGKey(0), jnp.zeros((1, H // 8, W // 8, 512), dt))
    ms, _ = timed_scan(lambda v, im, c: hr.apply(v, im + c), (hv, xin))
    results["head_resize_ms"] = round(ms, 2)
    stage_total += ms
    log(f"head+resize: {ms:.2f} ms")
    log(f"sum of parts: {results['stem_ms'] + stage_total:.2f} ms "
        f"vs full {results['full_ms']:.2f} ms")

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
