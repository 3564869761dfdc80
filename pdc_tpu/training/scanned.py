"""Fully device-resident training: K train steps per dispatch.

With the dataset cached in HBM (:mod:`pdc_tpu.data.device_cache`) the only
remaining host involvement per step is pair sampling and the dispatch itself
— which costs a full RPC round trip through a tunnel/remote runtime and
dominates small-resolution training. This module moves BOTH on device:

  * pair sampling (uniform scene -> frame a -> pose-difference rejection of
    frame b over a fixed candidate set, reference
    dense_correspondence_dataset_masked.py:260-287) runs as jnp ops over the
    pose table
  * ``lax.scan`` runs K full train steps (sample -> gather -> assemble ->
    forward -> loss -> backward -> Adam) inside ONE jitted call

One dispatch per K steps amortizes the host round trip to nothing; the loss
history still comes back per step ([K] metric arrays).

Scope: ALL five sample types run device-resident — within-scene (the default
mix), across-scene, different-object, and synthetic-multi-object (type-4 rows
sample a second within-scene pair from a different object's scene and
composite on device, reference spartan_dataset_masked.py:890-1053).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pdc_tpu.data.assembler import AssemblerConfig
from pdc_tpu.losses.pixelwise_contrastive import LossConfig
from pdc_tpu.training.train import TrainState, build_loss_fn, pick_assembly

POSE_DIST_THRESHOLD = 0.2     # metres (reference threshold)
POSE_ANGLE_THRESHOLD = 20.0   # degrees
NUM_POSE_CANDIDATES = 16      # rejection-sampling candidates per pair


def build_sampling_tables(cache):
    """Device tables for type-mixed pair sampling from a DeviceCache.

    :return: dict with scene_offsets [S], scene_lengths [S],
        scenes_by_object [O, Mmax] (scene indices, -1 padded),
        scenes_per_object [O]
    """
    names = sorted(cache.scene_offsets)
    offsets = jnp.asarray([cache.scene_offsets[n] for n in names], jnp.int32)
    lengths = jnp.asarray([cache.scene_lengths[n] for n in names], jnp.int32)

    object_scenes = {}
    for si, n in enumerate(names):
        oid = cache.dataset.scenes[n].object_id or n
        object_scenes.setdefault(oid, []).append(si)
    objs = sorted(object_scenes)
    mmax = max(len(v) for v in object_scenes.values())
    table = np.full((len(objs), mmax), -1, np.int32)
    counts = np.zeros((len(objs),), np.int32)
    for oi, o in enumerate(objs):
        for j, si in enumerate(object_scenes[o]):
            table[oi, j] = si
        counts[oi] = len(object_scenes[o])
    return {
        "scene_offsets": offsets,
        "scene_lengths": lengths,
        "scenes_by_object": jnp.asarray(table),
        "scenes_per_object": jnp.asarray(counts),
    }


def device_sample_pairs_mixed(key, tables, poses, batch_size: int,
                              type_probs: tuple, with_second: bool = False):
    """Type-mixed on-device pair sampling.

    :param type_probs: static tuple of (match_type, probability) pairs over
        {0 within-scene, 1 across-scene, 2 different-object, 4 synthetic
        multi-object}
    :param with_second: static; also return a second within-scene pair
        (frame_a_2, frame_b_2) — for SYNTHETIC_MULTI_OBJECT rows the pair
        comes from a DIFFERENT object's scene (both pairs pose-rejected,
        reference spartan_dataset_masked.py:890-925); other rows self-pair.
        Required when 4 is in ``type_probs``.
    :return: (frame_a [B], frame_b [B], match_type [B]) int32, plus
        (frame_a_2 [B], frame_b_2 [B]) before match_type when
        ``with_second``
    """
    offsets = tables["scene_offsets"]
    lengths = tables["scene_lengths"]
    by_obj = tables["scenes_by_object"]
    per_obj = tables["scenes_per_object"]
    S = offsets.shape[0]
    O = by_obj.shape[0]

    type_probs = tuple((t, p) for t, p in type_probs if p > 0)
    has_smo = any(t == 4 for t, _ in type_probs)
    if has_smo and not with_second:
        raise ValueError(
            "SYNTHETIC_MULTI_OBJECT in type_probs requires with_second=True")

    types = jnp.asarray([t for t, _ in type_probs], jnp.int32)
    weights = jnp.asarray([p for _, p in type_probs], jnp.float32)
    weights = weights / jnp.sum(weights)

    def frame_in_scene(k, s):
        return offsets[s] + jax.random.randint(k, (), 0, lengths[s])

    def within_pair(k_frame, k_cand, s):
        """Pose-difference-rejected frame pair inside scene ``s``
        (reference thresholds); ok=False when no candidate differs enough."""
        fa = frame_in_scene(k_frame, s)
        cand = offsets[s] + jax.random.randint(
            k_cand, (NUM_POSE_CANDIDATES,), 0, lengths[s])
        ok = _pose_ok(poses[fa], poses[cand])
        fb = jnp.where(ok.any(), cand[jnp.argmax(ok)], fa)
        return fa, fb, ok.any()

    def one(k):
        ks = jax.random.split(k, 12)
        mt = types[jax.random.categorical(ks[0], jnp.log(weights))]

        # -- within-scene: pose-difference rejection (reference thresholds)
        s_w = jax.random.randint(ks[1], (), 0, S)
        fa_w, fb_w, ok_w = within_pair(ks[2], ks[3], s_w)
        mt_w = jnp.where(ok_w, 0, -1).astype(jnp.int32)

        # -- across-scene: two scenes of one object (falls back to the same
        # scene when the object has only one, mirroring the host sampler)
        o_x = jax.random.randint(ks[4], (), 0, O)
        n_o = per_obj[o_x]
        i1 = jax.random.randint(ks[5], (), 0, n_o)
        i2 = jnp.where(n_o > 1, (i1 + 1 + jax.random.randint(ks[6], (), 0, jnp.maximum(n_o - 1, 1))) % n_o, i1)
        s_x1 = by_obj[o_x, i1]
        s_x2 = by_obj[o_x, i2]

        # -- different-object / SMO: two distinct objects (requires O >= 2;
        # falls back to the same object, mirroring the host sampler)
        o_d1 = o_x
        o_d2 = jnp.where(O > 1, (o_x + 1 + jax.random.randint(ks[7], (), 0, max(O - 1, 1))) % O, o_x)
        s_d1 = by_obj[o_d1, jax.random.randint(ks[5], (), 0, per_obj[o_d1])]
        s_d2 = by_obj[o_d2, jax.random.randint(ks[6], (), 0, per_obj[o_d2])]

        is_within = mt == 0
        is_across = mt == 1
        is_smo = mt == 4
        # SMO pair 1: within-scene pair in object 1's scene (s_d1)
        if has_smo:
            fa_m1, fb_m1, ok_m1 = within_pair(ks[2], ks[8], s_d1)
        s_a = jnp.where(is_within | is_smo, jnp.where(is_smo, s_d1, s_w),
                        jnp.where(is_across, s_x1, s_d1))
        s_b = jnp.where(is_within | is_smo, s_a,
                        jnp.where(is_across, s_x2, s_d2))
        fa = jnp.where(is_within, fa_w, frame_in_scene(ks[2], s_a))
        fb = jnp.where(is_within, fb_w, frame_in_scene(ks[3], s_b))
        mt_out = jnp.where(is_within, mt_w, mt)
        if has_smo:
            fa = jnp.where(is_smo, fa_m1, fa)
            fb = jnp.where(is_smo, fb_m1, fb)

        if not with_second:
            return fa.astype(jnp.int32), fb.astype(jnp.int32), mt_out

        # SMO pair 2: within-scene pair in object 2's scene (s_d2); both
        # pairs must pass pose rejection or the row is the empty sentinel
        # (reference: empty-data path when either sub-pair fails)
        fa2, fb2, ok_2 = within_pair(ks[9], ks[10], s_d2)
        if has_smo:
            mt_out = jnp.where(is_smo & ~(ok_m1 & ok_2), -1, mt_out)
        fa2 = jnp.where(mt_out == 4, fa2, fa)
        fb2 = jnp.where(mt_out == 4, fb2, fb)
        return (fa.astype(jnp.int32), fb.astype(jnp.int32),
                fa2.astype(jnp.int32), fb2.astype(jnp.int32), mt_out)

    keys = jax.random.split(key, batch_size)
    return jax.vmap(one)(keys)


def _pose_ok(pa, pc):
    """Pose-difference acceptance over candidates (reference
    dense_correspondence_dataset_masked.py:260-287 thresholds)."""
    dist = jnp.linalg.norm(pc[:, :3, 3] - pa[:3, 3], axis=1)
    rel = jnp.einsum("ij,kil->kjl", pa[:3, :3], pc[:, :3, :3])
    cos = jnp.clip((jnp.trace(rel, axis1=1, axis2=2) - 1.0) / 2.0, -1.0, 1.0)
    ang = jnp.degrees(jnp.arccos(cos))
    return (dist > POSE_DIST_THRESHOLD) | (ang > POSE_ANGLE_THRESHOLD)


def device_sample_pairs_bounded(key, scene_offsets, scene_lengths, num_scenes,
                                poses, batch_size: int):
    """Within-scene pair sampling with a TRACED scene count — the per-chip
    sampler for the sharded cache, where each chip sees only its own
    zero-padded scene table.

    :param scene_offsets, scene_lengths: [Smax] int32 (entries >= num_scenes
        are padding)
    :param num_scenes: scalar int32, number of real scenes on this chip
    :return: (frame_a [B], frame_b [B], match_type [B]) int32 (local frame
        indices into this chip's stack block)
    """
    def one(k):
        k1, k2, k3 = jax.random.split(k, 3)
        s = jax.random.randint(k1, (), 0, jnp.maximum(num_scenes, 1))
        base = scene_offsets[s]
        n = jnp.maximum(scene_lengths[s], 1)
        fa = base + jax.random.randint(k2, (), 0, n)
        cand = base + jax.random.randint(k3, (NUM_POSE_CANDIDATES,), 0, n)
        ok = _pose_ok(poses[fa], poses[cand])
        any_ok = ok.any()
        fb = jnp.where(any_ok, cand[jnp.argmax(ok)], fa)
        mt = jnp.where(any_ok, 0, -1).astype(jnp.int32)
        return fa.astype(jnp.int32), fb.astype(jnp.int32), mt

    keys = jax.random.split(key, batch_size)
    return jax.vmap(one)(keys)


def device_sample_pairs_mixed_bounded(key, offsets, lengths, num_scenes,
                                      by_obj, per_obj, num_obj, poses,
                                      batch_size: int, type_probs: tuple,
                                      with_second: bool = False):
    """Type-mixed per-chip sampler for the sharded cache — the bounded-table
    analog of :func:`device_sample_pairs_mixed`. All scene/object counts are
    TRACED (each chip sees its own zero-padded tables inside shard_map).

    Fallbacks mirror the host sampler: an across-scene draw on a
    single-scene object uses the same scene twice; a different-object draw
    on a single-object shard demotes to within-scene (type 0); a synthetic
    multi-object draw on a single-object shard composites the same object
    twice (the host sampler's AssertionError fallback).

    :param offsets, lengths: [Smax] int32; num_scenes scalar
    :param by_obj: [Omax, Mmax] int32 local scene slots (-1 padded)
    :param per_obj: [Omax] int32; num_obj scalar
    :param type_probs: static ((match_type, prob), ...) over {0, 1, 2, 4}
    :param with_second: see :func:`device_sample_pairs_mixed`
    """
    type_probs = tuple((t, p) for t, p in type_probs if p > 0)
    has_smo = any(t == 4 for t, _ in type_probs)
    if has_smo and not with_second:
        raise ValueError(
            "SYNTHETIC_MULTI_OBJECT in type_probs requires with_second=True")

    types = jnp.asarray([t for t, _ in type_probs], jnp.int32)
    weights = jnp.asarray([p for _, p in type_probs], jnp.float32)
    weights = weights / jnp.sum(weights)

    def frame_in_scene(k, s):
        return offsets[s] + jax.random.randint(
            k, (), 0, jnp.maximum(lengths[s], 1))

    def within_pair(k_frame, k_cand, s):
        fa = frame_in_scene(k_frame, s)
        cand = offsets[s] + jax.random.randint(
            k_cand, (NUM_POSE_CANDIDATES,), 0, jnp.maximum(lengths[s], 1))
        ok = _pose_ok(poses[fa], poses[cand])
        fb = jnp.where(ok.any(), cand[jnp.argmax(ok)], fa)
        return fa, fb, ok.any()

    def one(k):
        ks = jax.random.split(k, 12)
        mt = types[jax.random.categorical(ks[0], jnp.log(weights))]
        mt = jnp.where((mt == 2) & (num_obj < 2), 0, mt)

        # within-scene with pose rejection
        s_w = jax.random.randint(ks[1], (), 0, jnp.maximum(num_scenes, 1))
        fa_w, fb_w, ok_w = within_pair(ks[2], ks[3], s_w)
        mt_w = jnp.where(ok_w, 0, -1).astype(jnp.int32)

        # across-scene: two scenes of one object
        o_x = jax.random.randint(ks[4], (), 0, jnp.maximum(num_obj, 1))
        n_o = per_obj[o_x]
        i1 = jax.random.randint(ks[5], (), 0, jnp.maximum(n_o, 1))
        i2 = jnp.where(
            n_o > 1,
            (i1 + 1 + jax.random.randint(ks[6], (), 0, jnp.maximum(n_o - 1, 1)))
            % jnp.maximum(n_o, 1),
            i1)
        s_x1 = by_obj[o_x, i1]
        s_x2 = by_obj[o_x, i2]

        # different-object / SMO: two distinct objects of this shard
        o_d2 = jnp.where(
            num_obj > 1,
            (o_x + 1 + jax.random.randint(ks[7], (), 0, jnp.maximum(num_obj - 1, 1)))
            % jnp.maximum(num_obj, 1),
            o_x)
        s_d1 = by_obj[o_x, jax.random.randint(ks[5], (), 0, jnp.maximum(per_obj[o_x], 1))]
        s_d2 = by_obj[o_d2, jax.random.randint(ks[6], (), 0, jnp.maximum(per_obj[o_d2], 1))]

        is_within = mt == 0
        is_across = mt == 1
        is_smo = mt == 4
        if has_smo:
            fa_m1, fb_m1, ok_m1 = within_pair(ks[2], ks[8], s_d1)
        s_a = jnp.where(is_within | is_smo, jnp.where(is_smo, s_d1, s_w),
                        jnp.where(is_across, s_x1, s_d1))
        s_b = jnp.where(is_within | is_smo, s_a,
                        jnp.where(is_across, s_x2, s_d2))
        fa = jnp.where(is_within, fa_w, frame_in_scene(ks[2], s_a))
        fb = jnp.where(is_within, fb_w, frame_in_scene(ks[3], s_b))
        mt_out = jnp.where(is_within, mt_w, mt)
        if has_smo:
            fa = jnp.where(is_smo, fa_m1, fa)
            fb = jnp.where(is_smo, fb_m1, fb)

        if not with_second:
            return fa.astype(jnp.int32), fb.astype(jnp.int32), mt_out

        fa2, fb2, ok_2 = within_pair(ks[9], ks[10], s_d2)
        if has_smo:
            mt_out = jnp.where(is_smo & ~(ok_m1 & ok_2), -1, mt_out)
        fa2 = jnp.where(mt_out == 4, fa2, fa)
        fb2 = jnp.where(mt_out == 4, fb2, fb)
        return (fa.astype(jnp.int32), fb.astype(jnp.int32),
                fa2.astype(jnp.int32), fb2.astype(jnp.int32), mt_out)

    keys = jax.random.split(key, batch_size)
    return jax.vmap(one)(keys)


def device_sample_pairs(key, scene_offsets, scene_lengths, poses, batch_size: int):
    """Sample ``batch_size`` within-scene frame pairs on device.

    :param scene_offsets: [S] int32 start frame of each scene
    :param scene_lengths: [S] int32 frames per scene
    :param poses: [F, 4, 4] float32 camera-to-world
    :return: (frame_a [B], frame_b [B], match_type [B]) int32 — match_type is
        0 (within scene) or -1 when no sufficiently-different pose was found
    """
    S = scene_offsets.shape[0]

    def one(k):
        k1, k2, k3 = jax.random.split(k, 3)
        s = jax.random.randint(k1, (), 0, S)
        base = scene_offsets[s]
        n = scene_lengths[s]
        fa = base + jax.random.randint(k2, (), 0, n)

        cand = base + jax.random.randint(k3, (NUM_POSE_CANDIDATES,), 0, n)
        pa = poses[fa]
        pc = poses[cand]
        dist = jnp.linalg.norm(pc[:, :3, 3] - pa[:3, 3], axis=1)
        # relative rotation angle via trace(R_a^T R_c)
        rel = jnp.einsum("ij,kil->kjl", pa[:3, :3], pc[:, :3, :3])
        cos = jnp.clip((jnp.trace(rel, axis1=1, axis2=2) - 1.0) / 2.0, -1.0, 1.0)
        ang = jnp.degrees(jnp.arccos(cos))
        ok = (dist > POSE_DIST_THRESHOLD) | (ang > POSE_ANGLE_THRESHOLD)
        any_ok = ok.any()
        first = jnp.argmax(ok)
        fb = jnp.where(any_ok, cand[first], fa)
        mt = jnp.where(any_ok, 0, -1).astype(jnp.int32)
        return fa.astype(jnp.int32), fb.astype(jnp.int32), mt

    keys = jax.random.split(key, batch_size)
    return jax.vmap(one)(keys)


def make_sharded_cache_train_step(model, tx, loss_cfg: LossConfig,
                                  assembler_cfg: AssemblerConfig,
                                  image_width: int, cache,
                                  batch_size: int, steps_per_dispatch: int,
                                  type_probs=None, fsdp: bool = False):
    """Scanned DP training over a :class:`ShardedDeviceCache`.

    Unlike :func:`make_scanned_train_step`'s replicated DP path, the frame
    stacks are sharded over the mesh's data axis — per-chip HBM holds
    1/n_chips of the dataset, and every gather is chip-local: chip c samples
    within-scene pairs from ITS scene subset (per-host data sharding), runs
    ``batch_size`` pairs per step, and gradients mix via pmean over ICI.
    K global steps per host dispatch, global batch = batch_size * n_chips.

    ``type_probs`` (optional): ((match_type, prob), ...) over {0 within-scene,
    1 across-scene, 2 different-object} — build the cache with
    ``by_object=True`` so same-object scenes share a chip; shards with one
    object demote different-object draws to within-scene.

    ``fsdp=True`` additionally shards the params + optimizer moments over
    the same data axis (ZeRO — all-gather for compute, reduce-scatter for
    gradients), composing the two 1/n memory stories: per-chip HBM holds
    1/n of the dataset AND 1/n of the training state.

    Reference anchor: SURVEY §2c host-pipeline row (per-host sharded scene
    lists); the reference itself has no distributed path at all.
    """
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    has_smo = type_probs is not None and any(
        t == 4 and p > 0 for t, p in type_probs)
    if has_smo != assembler_cfg.enable_synthetic_multi_object:
        import dataclasses

        assembler_cfg = dataclasses.replace(
            assembler_cfg, enable_synthetic_multi_object=has_smo)
    assemble_batch, compose = pick_assembly(assembler_cfg)
    loss_fn = build_loss_fn(model, loss_cfg, image_width, compose)
    mesh, data_axis = cache.mesh, cache.data_axis

    mixed = type_probs is not None and any(t != 0 for t, p in type_probs if p > 0)
    if mixed:
        type_probs = tuple((t, p) for t, p in type_probs if p > 0)

    p_axes = None
    if fsdp:
        from pdc_tpu.parallel.tensor_parallel import (
            scan_fsdp_setup,
            tree_all_gather,
            tree_reduce_scatter_mean,
        )

        p_axes, fsdp_state_specs = scan_fsdp_setup(
            model, tx, mesh, data_axis, cache.rgb.shape[1:3])

    def one_step(state, key, rgb, depth, mask, poses, Ks, perm, mcount,
                 offsets, lengths, num, by_obj, per_obj, num_obj):
        key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
        k_sample, k_assemble = jax.random.split(key)
        fa2 = fb2 = None
        if mixed and has_smo:
            fa, fb, fa2, fb2, mt = device_sample_pairs_mixed_bounded(
                k_sample, offsets, lengths, num, by_obj, per_obj, num_obj,
                poses, batch_size, type_probs, with_second=True)
        elif mixed:
            fa, fb, mt = device_sample_pairs_mixed_bounded(
                k_sample, offsets, lengths, num, by_obj, per_obj, num_obj,
                poses, batch_size, type_probs)
        else:
            fa, fb, mt = device_sample_pairs_bounded(
                k_sample, offsets, lengths, num, poses, batch_size)
        batch = {
            "match_type": mt,
            "rgb_a": jnp.take(rgb, fa, axis=0),
            "depth_a": jnp.take(depth, fa, axis=0),
            "mask_a": jnp.take(mask, fa, axis=0),
            "pose_a": jnp.take(poses, fa, axis=0),
            "rgb_b": jnp.take(rgb, fb, axis=0),
            "depth_b": jnp.take(depth, fb, axis=0),
            "mask_b": jnp.take(mask, fb, axis=0),
            "pose_b": jnp.take(poses, fb, axis=0),
            "K": jnp.take(Ks, fa, axis=0),
            "perm_a": jnp.take(perm, fa, axis=0),
            "count_a": jnp.take(mcount, fa, axis=0),
            "perm_b": jnp.take(perm, fb, axis=0),
            "count_b": jnp.take(mcount, fb, axis=0),
        }
        if fa2 is not None:
            batch.update({
                "rgb_a_2": jnp.take(rgb, fa2, axis=0),
                "depth_a_2": jnp.take(depth, fa2, axis=0),
                "mask_a_2": jnp.take(mask, fa2, axis=0),
                "pose_a_2": jnp.take(poses, fa2, axis=0),
                "rgb_b_2": jnp.take(rgb, fb2, axis=0),
                "depth_b_2": jnp.take(depth, fb2, axis=0),
                "mask_b_2": jnp.take(mask, fb2, axis=0),
                "pose_b_2": jnp.take(poses, fb2, axis=0),
                "K_2": jnp.take(Ks, fa2, axis=0),
            })
        img_a, img_b, indices = assemble_batch(k_assemble, batch, assembler_cfg)
        # ZeRO: reassemble full params from the per-chip shards for compute;
        # grads reduce-scatter straight back to the shards
        params_full = (tree_all_gather(state.params, p_axes, data_axis)
                       if fsdp else state.params)
        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params_full, state.batch_stats, img_a, img_b, indices)
        if fsdp:
            grads = tree_reduce_scatter_mean(
                grads, p_axes, data_axis, mesh.shape[data_axis])
        else:
            grads = jax.lax.pmean(grads, data_axis)
        new_stats = jax.lax.pmean(new_stats, data_axis)
        metrics = jax.lax.pmean(metrics, data_axis)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_stats, opt_state=new_opt), metrics

    def multi_step(state, rgb, depth, mask, poses, Ks, perm, mcount,
                   offsets, lengths, nums, by_obj, per_obj, num_obj, key):
        # local views inside shard_map: stacks [Fmax, ...]; tables [1, ...]
        keys = jax.random.split(key, steps_per_dispatch)
        return jax.lax.scan(
            lambda c, k: one_step(c, k, rgb, depth, mask, poses, Ks,
                                  perm, mcount,
                                  offsets[0], lengths[0], nums[0, 0],
                                  by_obj[0], per_obj[0], num_obj[0, 0]),
            state, keys,
        )

    repl = P()
    sh = P(data_axis)
    state_specs = fsdp_state_specs if fsdp else repl
    specs = dict(
        in_specs=(state_specs, sh, sh, sh, sh, sh, sh, sh, sh, sh, sh, sh,
                  sh, sh, repl),
        out_specs=(state_specs, repl),
    )
    try:
        mapped = shard_map(multi_step, mesh=mesh, check_vma=False, **specs)
    except TypeError:  # older jax kwarg name
        mapped = shard_map(multi_step, mesh=mesh, check_rep=False, **specs)
    jitted = jax.jit(mapped, donate_argnums=(0,))
    repl_sharding = NamedSharding(mesh, P())

    def run(state, key):
        key = jax.device_put(key, repl_sharding)
        return jitted(state, cache.rgb, cache.depth, cache.mask, cache.poses,
                      cache.Ks, cache.pixel_perm, cache.mask_count,
                      cache.scene_offsets, cache.scene_lengths,
                      cache.num_scenes, cache.scenes_by_object,
                      cache.scenes_per_object, cache.num_objects, key)

    return run


def make_scanned_train_step(model, tx, loss_cfg: LossConfig,
                            assembler_cfg: AssemblerConfig, image_width: int,
                            cache, batch_size: int, steps_per_dispatch: int,
                            mesh=None, data_axis: str = "data",
                            type_probs=None, fsdp: bool = False):
    """Build step(state, key) -> (state, metrics dict of [K] arrays).

    ``cache`` is a :class:`pdc_tpu.data.device_cache.DeviceCache`.

    ``type_probs`` (optional): tuple of (match_type, probability) pairs over
    {0 within-scene, 1 across-scene, 2 different-object, 4 synthetic
    multi-object}; defaults to pure within-scene sampling. Type-4 rows draw
    a second within-scene pair from a different object's scene and composite
    on device (``assembler_cfg.enable_synthetic_multi_object`` is switched
    on automatically), so ALL five sample types run device-resident.

    With ``mesh`` given, the step is data-parallel over the mesh's
    ``data_axis``: every chip samples its own ``batch_size`` pairs (the
    GLOBAL batch is ``batch_size * n_chips``), computes local gradients, and
    the update uses a ``pmean`` over ICI — the scan composes with DP, so a
    pod runs K global steps per host dispatch.

    With ``fsdp=True`` (requires ``mesh``) the params and optimizer moments
    additionally live SHARDED over the data axis (ZeRO: 1/n state memory
    per chip): each scanned step all-gathers the parameters for compute and
    reduce-scatters the gradient mean back to the shards, so the Adam
    update itself runs on 1/n of the elements per chip. Batch stats stay
    replicated (they are KiB-sized and pmean-mixed every step).
    """
    has_smo = type_probs is not None and any(
        t == 4 and p > 0 for t, p in type_probs)
    if has_smo != assembler_cfg.enable_synthetic_multi_object:
        import dataclasses

        assembler_cfg = dataclasses.replace(
            assembler_cfg, enable_synthetic_multi_object=has_smo)
    assemble_batch, compose = pick_assembly(assembler_cfg)
    loss_fn = build_loss_fn(model, loss_cfg, image_width, compose)

    offsets = jnp.asarray(
        [cache.scene_offsets[n] for n in sorted(cache.scene_offsets)], jnp.int32
    )
    lengths = jnp.asarray(
        [cache.scene_lengths[n] for n in sorted(cache.scene_lengths)], jnp.int32
    )
    poses_dev = jnp.asarray(cache.poses, jnp.float32)
    Ks_dev = jnp.asarray(cache.Ks, jnp.float32)

    mixed = type_probs is not None and any(t != 0 for t, p in type_probs if p > 0)
    if mixed:
        tables = build_sampling_tables(cache)
        type_probs = tuple((t, p) for t, p in type_probs if p > 0)

    distributed = mesh is not None
    if fsdp and not distributed:
        raise ValueError("fsdp=True requires a mesh")
    p_axes = None
    if fsdp:
        from pdc_tpu.parallel.tensor_parallel import (
            scan_fsdp_setup,
            tree_all_gather,
            tree_reduce_scatter_mean,
        )

        p_axes, fsdp_state_specs = scan_fsdp_setup(
            model, tx, mesh, data_axis, cache.rgb.shape[1:3])

    def one_step(carry, key, rgb, depth, mask):
        state = carry
        if distributed:
            # decorrelate sampling across chips
            key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
        k_sample, k_assemble = jax.random.split(key)
        fa2 = fb2 = None
        if mixed and has_smo:
            fa, fb, fa2, fb2, mt = device_sample_pairs_mixed(
                k_sample, tables, poses_dev, batch_size, type_probs,
                with_second=True
            )
        elif mixed:
            fa, fb, mt = device_sample_pairs_mixed(
                k_sample, tables, poses_dev, batch_size, type_probs
            )
        else:
            fa, fb, mt = device_sample_pairs(
                k_sample, offsets, lengths, poses_dev, batch_size
            )
        batch = {
            "match_type": mt,
            "rgb_a": jnp.take(rgb, fa, axis=0),
            "depth_a": jnp.take(depth, fa, axis=0),
            "mask_a": jnp.take(mask, fa, axis=0),
            "pose_a": jnp.take(poses_dev, fa, axis=0),
            "rgb_b": jnp.take(rgb, fb, axis=0),
            "depth_b": jnp.take(depth, fb, axis=0),
            "mask_b": jnp.take(mask, fb, axis=0),
            "pose_b": jnp.take(poses_dev, fb, axis=0),
            "K": jnp.take(Ks_dev, fa, axis=0),
        }
        if fa2 is not None:
            batch.update({
                "rgb_a_2": jnp.take(rgb, fa2, axis=0),
                "depth_a_2": jnp.take(depth, fa2, axis=0),
                "mask_a_2": jnp.take(mask, fa2, axis=0),
                "pose_a_2": jnp.take(poses_dev, fa2, axis=0),
                "rgb_b_2": jnp.take(rgb, fb2, axis=0),
                "depth_b_2": jnp.take(depth, fb2, axis=0),
                "mask_b_2": jnp.take(mask, fb2, axis=0),
                "pose_b_2": jnp.take(poses_dev, fb2, axis=0),
                "K_2": jnp.take(Ks_dev, fa2, axis=0),
            })
        if cache.pixel_perm is not None:
            batch.update({
                "perm_a": jnp.take(cache.pixel_perm, fa, axis=0),
                "count_a": jnp.take(cache.mask_count, fa, axis=0),
                "perm_b": jnp.take(cache.pixel_perm, fb, axis=0),
                "count_b": jnp.take(cache.mask_count, fb, axis=0),
            })
        img_a, img_b, indices = assemble_batch(k_assemble, batch, assembler_cfg)
        # ZeRO: reassemble full params from the per-chip shards for compute;
        # grads reduce-scatter straight back to the shards
        params_full = (tree_all_gather(state.params, p_axes, data_axis)
                       if fsdp else state.params)
        (_, (new_stats, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params_full, state.batch_stats, img_a, img_b, indices)
        if fsdp:
            grads = tree_reduce_scatter_mean(
                grads, p_axes, data_axis, mesh.shape[data_axis])
            new_stats = jax.lax.pmean(new_stats, data_axis)
            metrics = jax.lax.pmean(metrics, data_axis)
        elif distributed:
            grads = jax.lax.pmean(grads, data_axis)
            new_stats = jax.lax.pmean(new_stats, data_axis)
            metrics = jax.lax.pmean(metrics, data_axis)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        return new_state, metrics

    def multi_step(state, rgb, depth, mask, key):
        keys = jax.random.split(key, steps_per_dispatch)
        return jax.lax.scan(
            lambda c, k: one_step(c, k, rgb, depth, mask), state, keys
        )

    if not distributed:
        jitted = jax.jit(multi_step, donate_argnums=(0,))

        def run(state, key):
            return jitted(state, cache.rgb, cache.depth, cache.mask, key)

        return run

    # DP: everything replicated (or, with fsdp, the train state sharded
    # per-leaf); per-chip divergence comes from the key fold-in. shard_map
    # keeps the collectives explicit and compile-checked.
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = P()
    state_specs = fsdp_state_specs if fsdp else repl
    try:
        mapped = shard_map(
            multi_step, mesh=mesh,
            in_specs=(state_specs, repl, repl, repl, repl),
            out_specs=(state_specs, repl),
            check_vma=False,
        )
    except TypeError:  # older jax kwarg name
        mapped = shard_map(
            multi_step, mesh=mesh,
            in_specs=(state_specs, repl, repl, repl, repl),
            out_specs=(state_specs, repl),
            check_rep=False,
        )
    jitted = jax.jit(mapped, donate_argnums=(0,))
    repl_sharding = NamedSharding(mesh, P())

    def run(state, key):
        key = jax.device_put(key, repl_sharding)
        return jitted(state, cache.rgb, cache.depth, cache.mask, key)

    return run
