"""Split the matrix-loss 34.9 ms: gathers+scatter vs [Nm,P] hinge matrices.

D1: full compose_loss_matrix fwd+bwd on fixed preds   (expected ~35 ms)
D2: same gathers (matches, pools, blind) + match/blind losses, but the two
    pooled [Nm,P] hinge matrices replaced by a trivial reduction of the
    SAME gathered rows — isolates gather + backward scatter-add cost.
D1 - D2 ~= the pooled-matrix math cost that a fused Pallas kernel removes.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pdc_tpu.data.assembler import AssemblerConfig
    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.data.device_cache import DeviceCache
    from pdc_tpu.losses.matrix_loss import compose_loss_matrix
    from pdc_tpu.losses.pixelwise_contrastive import (
        LossConfig, match_loss, non_match_loss_descriptor_only)
    from pdc_tpu.training.scanned import device_sample_pairs
    from pdc_tpu.training.train import pick_assembly

    assert jax.devices()[0].platform == "tpu"
    H, W, D, B = 480, 640, 3, 8
    results = {}

    acfg = AssemblerConfig(num_matching_attempts=10000,
                           num_masked_non_matches_per_match=75,
                           num_background_non_matches_per_match=75,
                           use_matrix_loss=True)
    lcfg = LossConfig()
    assemble, compose = pick_assembly(acfg)

    ds = SpartanDataset.make_synthetic(num_scenes=2, width=W, height=H,
                                       num_frames=8, object_radius=0.3)
    cache = DeviceCache.from_dataset(ds)
    offsets = jnp.asarray([cache.scene_offsets[n]
                           for n in sorted(cache.scene_offsets)], jnp.int32)
    lengths = jnp.asarray([cache.scene_lengths[n]
                           for n in sorted(cache.scene_lengths)], jnp.int32)
    poses_dev = jnp.asarray(cache.poses, jnp.float32)
    Ks_dev = jnp.asarray(cache.Ks, jnp.float32)

    key = jax.random.PRNGKey(2)
    key, k_s, k_a = jax.random.split(key, 3)
    fa, fb, mt = device_sample_pairs(k_s, offsets, lengths, poses_dev, B)
    batch = {
        "match_type": mt,
        "rgb_a": jnp.take(cache.rgb, fa, axis=0),
        "depth_a": jnp.take(cache.depth, fa, axis=0),
        "mask_a": jnp.take(cache.mask, fa, axis=0),
        "pose_a": jnp.take(poses_dev, fa, axis=0),
        "rgb_b": jnp.take(cache.rgb, fb, axis=0),
        "depth_b": jnp.take(cache.depth, fb, axis=0),
        "mask_b": jnp.take(cache.mask, fb, axis=0),
        "pose_b": jnp.take(poses_dev, fb, axis=0),
        "K": jnp.take(Ks_dev, fa, axis=0),
    }
    _, _, idx = jax.jit(lambda k, b: assemble(k, b, acfg))(k_a, batch)
    pred = jax.device_put(np.random.rand(2 * B, H * W, D).astype(np.float32))

    def timed(lf, carry):
        @jax.jit
        def run(c):
            def body(c, _):
                p, acc = c
                val, g = jax.value_and_grad(lf)(p)
                return (p + 0.0 * g, acc + val), 0
            c, _ = jax.lax.scan(body, c, None, length=10)
            return c

        c = run(carry)
        float(np.asarray(c[1]))
        times = []
        for _ in range(4):
            t0 = time.perf_counter()
            c = run(c)
            float(np.asarray(c[1]))
            times.append(time.perf_counter() - t0)
        return min(times) / 10 * 1e3

    def lf_full(p):
        terms = jax.vmap(
            lambda pa, pb, s: compose(pa, pb, s, lcfg, W)
        )(p[:B], p[B:], idx)
        return jnp.mean(terms.loss)

    def cheap_pool(pa, pb, s):
        m, _ = match_loss(pa, pb, s.matches_a, s.matches_b, s.matches_valid)
        # same gathers as the pooled loss, trivial math
        da = jnp.take(pa, jnp.where(s.matches_valid, s.matches_a, 0), axis=0)
        dm = jnp.take(pb, jnp.where(s.masked_pool_valid, s.masked_pool_b, 0),
                      axis=0)
        dbg = jnp.take(pb, jnp.where(s.background_pool_valid,
                                     s.background_pool_b, 0), axis=0)
        blind, _ = non_match_loss_descriptor_only(
            pa, pb, s.blind_nm_a, s.blind_nm_b, s.blind_nm_valid, M=0.5)
        return m + jnp.sum(da) * 0.001 + jnp.sum(dm) * 0.001 + \
            jnp.sum(dbg) * 0.001 + blind * 1e-6

    def lf_cheap(p):
        vals = jax.vmap(
            lambda pa, pb, s: cheap_pool(pa, pb, s)
        )(p[:B], p[B:], idx)
        return jnp.mean(vals)

    ms = timed(lf_full, (pred, jnp.zeros(())))
    results["D1_full_matrix_loss_ms"] = round(ms, 1)
    log(f"D1 full: {ms:.1f} ms")

    ms = timed(lf_cheap, (pred, jnp.zeros(())))
    results["D2_gathers_only_ms"] = round(ms, 1)
    log(f"D2 gathers only: {ms:.1f} ms")

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
