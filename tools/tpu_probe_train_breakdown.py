"""Training-step cost breakdown on TPU: where do the 148 ms go?

Times, at 640x480 D=3 bf16 B=8 (the shipped sweet spot), each sub-program
as K=10 iterations inside one lax.scan dispatch (amortizing the tunnel
round trip, same methodology as tpu_probe2.py):

  A  fwd+bwd of the network alone (mean-of-output loss, train-mode BN)
  B  A + Adam/optax update (isolates optimizer cost)
  C  sampling + assembler alone (pairs -> images + MatrixSampleIndices)
  D  matrix loss fwd+bwd w.r.t. fixed descriptor images (loss cost alone)
  E  the full shipped scanned step (reference: ~148 ms r1)
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timed_scan(fn, carry, K=10, reps=4, fetch=None):
    """Run fn K times under lax.scan in one dispatch; return best ms/iter."""
    import jax

    @jax.jit
    def run(c):
        def body(c, _):
            return fn(c), 0
        c, _ = jax.lax.scan(body, c, None, length=K)
        return c

    c = run(carry)  # compile + first
    probe = fetch(c) if fetch else c
    jax.tree_util.tree_map(lambda x: np.asarray(x), probe)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c = run(c)
        probe = fetch(c) if fetch else c
        jax.tree_util.tree_map(lambda x: np.asarray(x), probe)
        times.append(time.perf_counter() - t0)
    return min(times) / K * 1e3


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from pdc_tpu.data.assembler import AssemblerConfig
    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.data.device_cache import DeviceCache
    from pdc_tpu.losses.pixelwise_contrastive import LossConfig
    from pdc_tpu.models.dcn import build_backbone
    from pdc_tpu.training.scanned import (
        device_sample_pairs, make_scanned_train_step)
    from pdc_tpu.training.train import (
        TrainState, build_loss_fn, create_train_state, pick_assembly)

    assert jax.devices()[0].platform == "tpu"
    H, W, D, B = 480, 640, 3, 8
    results = {}
    sections = set(sys.argv[1:]) or {"A", "B", "C", "D", "E"}

    config = {
        "training": {"learning_rate": 1e-4, "learning_rate_decay": 0.9,
                     "steps_between_learning_rate_decay": 250,
                     "weight_decay": 1e-4},
        "dense_correspondence_network": {
            "descriptor_dimension": D,
            "backbone": {"model_class": "Resnet", "resnet_name": "Resnet34_8s"},
            "compute_dtype": "bfloat16",
        },
    }
    model = build_backbone(config["dense_correspondence_network"])
    state, tx = create_train_state(model, config, jax.random.PRNGKey(0), (H, W))
    acfg = AssemblerConfig(num_matching_attempts=10000,
                           num_masked_non_matches_per_match=75,
                           num_background_non_matches_per_match=75,
                           use_matrix_loss=True)
    lcfg = LossConfig()

    imgs = jax.device_put(np.random.rand(2 * B, H, W, 3).astype(np.float32))

    # --- A: network fwd+bwd only --------------------------------------
    def net_fwd_bwd(carry):
        st = carry

        def lf(params, stats):
            out, mut = model.apply({"params": params, "batch_stats": stats},
                                   imgs, train=True, mutable=["batch_stats"])
            return jnp.mean(out.astype(jnp.float32)), mut["batch_stats"]

        (_, new_stats), grads = jax.value_and_grad(lf, has_aux=True)(
            st.params, st.batch_stats)
        leaves = jax.tree_util.tree_leaves(grads)
        eps = sum(jnp.sum(g).astype(jnp.float32) * 0 for g in leaves)
        new_params = jax.tree_util.tree_map(lambda p, g: p - 0.0 * g,
                                            st.params, grads)
        return TrainState(step=st.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=st.opt_state)

    if "A" in sections:
        ms = timed_scan(net_fwd_bwd, state, fetch=lambda s: s.step)
        results["A_net_fwd_bwd_ms"] = round(ms, 1)
        log(f"A net fwd+bwd: {ms:.1f} ms")

    # --- B: fwd+bwd + Adam update --------------------------------------
    def net_step(carry):
        st = carry

        def lf(params, stats):
            out, mut = model.apply({"params": params, "batch_stats": stats},
                                   imgs, train=True, mutable=["batch_stats"])
            return jnp.mean(out.astype(jnp.float32)), mut["batch_stats"]

        (_, new_stats), grads = jax.value_and_grad(lf, has_aux=True)(
            st.params, st.batch_stats)
        updates, new_opt = tx.update(grads, st.opt_state, st.params)
        new_params = optax.apply_updates(st.params, updates)
        return TrainState(step=st.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt)

    if "B" in sections:
        ms = timed_scan(net_step, state, fetch=lambda s: s.step)
        results["B_net_step_ms"] = round(ms, 1)
        log(f"B net fwd+bwd+adam: {ms:.1f} ms")

    # --- C: sampling + assembler ---------------------------------------
    ds = SpartanDataset.make_synthetic(num_scenes=2, width=W, height=H,
                                       num_frames=8, object_radius=0.3)
    cache = DeviceCache.from_dataset(ds)
    assemble, compose = pick_assembly(acfg)
    offsets = jnp.asarray([cache.scene_offsets[n]
                           for n in sorted(cache.scene_offsets)], jnp.int32)
    lengths = jnp.asarray([cache.scene_lengths[n]
                           for n in sorted(cache.scene_lengths)], jnp.int32)
    poses_dev = jnp.asarray(cache.poses, jnp.float32)
    Ks_dev = jnp.asarray(cache.Ks, jnp.float32)

    def sample_assemble(carry):
        key, acc = carry
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
        img_a, img_b, indices = assemble(k_a, batch, acfg)
        acc = acc + jnp.sum(img_a).astype(jnp.float32) + \
            jnp.sum(indices.matches_a).astype(jnp.float32)
        return key, acc

    if "C" in sections:
        ms = timed_scan(sample_assemble,
                        (jax.random.PRNGKey(1), jnp.zeros(())),
                        fetch=lambda c: c[1])
        results["C_sample_assemble_ms"] = round(ms, 1)
        log(f"C sample+assemble: {ms:.1f} ms")

    # --- D: matrix loss fwd+bwd on fixed descriptors --------------------
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
    _, _, indices0 = jax.jit(
        lambda k, b: assemble(k, b, acfg))(k_a, batch)
    pred = jax.device_put(np.random.rand(2 * B, H * W, D).astype(np.float32))

    def loss_only(carry):
        p, acc = carry

        def lf(p):
            terms = jax.vmap(
                lambda pa, pb, s: compose(pa, pb, s, lcfg, W)
            )(p[:B], p[B:], indices0)
            return jnp.mean(terms.loss)

        val, g = jax.value_and_grad(lf)(p)
        return p + 0.0 * g, acc + val

    if "D" in sections:
        ms = timed_scan(loss_only, (pred.astype(jnp.float32), jnp.zeros(())),
                        fetch=lambda c: c[1])
        results["D_matrix_loss_fwd_bwd_ms"] = round(ms, 1)
        log(f"D matrix loss fwd+bwd: {ms:.1f} ms")

    # --- E: full shipped scanned step -----------------------------------
    if "E" not in sections:
        print(json.dumps(results, indent=1))
        return
    step = make_scanned_train_step(model, tx, lcfg, acfg, W, cache,
                                   batch_size=B, steps_per_dispatch=10)
    key = jax.random.PRNGKey(3)
    state2, _ = create_train_state(model, config, jax.random.PRNGKey(0), (H, W))
    key, sub = jax.random.split(key)
    state2, m = step(state2, sub)
    float(np.asarray(m["loss"])[-1])
    times = []
    for _ in range(4):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state2, m = step(state2, sub)
        float(np.asarray(m["loss"])[-1])
        times.append(time.perf_counter() - t0)
    ms = min(times) / 10 * 1e3
    results["E_full_step_ms"] = round(ms, 1)
    log(f"E full step: {ms:.1f} ms")

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
