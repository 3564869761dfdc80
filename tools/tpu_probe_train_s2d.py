"""TPU probe: does a space-to-depth stem help the TRAIN step?

Round-2 measured s2d SLOWER for inference (8.6 -> 10.3 ms at B=128: the
pad/reshape traffic outweighs the lane gain). The round-3 per-stage fwd+bwd
breakdown (tpu_probe_train_stages.py) shows the stem costs ~10 ms of the
72 ms train fwd+bwd — dominated by the conv7x7 WEIGHT gradient, whose
3-input-channel contraction wastes MXU lanes. s2d turns that into a
12-channel contraction (4x the lanes), so the training trade may go the
other way. This probe measures full-model fwd+bwd both ways at the train
shape (NB=16 images), numerically-equivalent architectures.
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
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from pdc_tpu.models.resnet import BasicBlock, ResNet34_8s, _resize_bilinear

    assert jax.devices()[0].platform == "tpu", jax.devices()
    NB, H, W, D = 16, 480, 640, 3
    dt = jnp.bfloat16
    results = {}

    class S2DResNet(nn.Module):
        """ResNet34-8s with the stem conv7x7/s2 rewritten as s2d + conv4x4/s1
        (numerically equivalent under kernel zero-pad + rearrangement)."""
        num_classes: int
        dtype: object = dt

        @nn.compact
        def __call__(self, x, train=False):
            in_h, in_w = x.shape[1], x.shape[2]
            x = x.astype(self.dtype)
            b, h, w, ch = x.shape
            x = jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0)))
            x = x.reshape(b, (h + 8) // 2, 2, (w + 8) // 2, 2, ch)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                b, (h + 8) // 2, (w + 8) // 2, 4 * ch)
            x = nn.Conv(64, (4, 4), strides=(1, 1), padding="VALID",
                        use_bias=False, dtype=self.dtype, name="stem_conv")(x)
            x = x[:, : h // 2, : w // 2, :]
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             dtype=self.dtype, name="stem_bn")(x)
            x = nn.relu(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
            strides, dils = (1, 2, 1, 1), (1, 1, 2, 4)
            for st, (blocks, feats) in enumerate(
                    zip((3, 4, 6, 3), (64, 128, 256, 512))):
                for blk in range(blocks):
                    x = BasicBlock(feats, strides[st] if blk == 0 else 1,
                                   dils[st], dtype=self.dtype,
                                   name=f"stage{st + 1}_block{blk}")(x, train)
            x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                        name="head")(x)
            return _resize_bilinear(x, in_h, in_w)

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

    x0 = jnp.zeros((1, H, W, 3), jnp.float32)
    imgs = jax.device_put(np.random.rand(NB, H, W, 3).astype(np.float32))

    plain = ResNet34_8s(D, dtype=dt)
    pv = plain.init(jax.random.PRNGKey(0), x0, train=False)
    ms = timed_grad(plain, pv, imgs)
    results["plain_ms"] = round(ms, 2)
    log(f"plain stem fwd+bwd: {ms:.2f} ms")

    s2d = S2DResNet(D)
    sv = s2d.init(jax.random.PRNGKey(0), x0, train=False)
    ms = timed_grad(s2d, sv, imgs)
    results["s2d_ms"] = round(ms, 2)
    log(f"s2d stem fwd+bwd: {ms:.2f} ms")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
