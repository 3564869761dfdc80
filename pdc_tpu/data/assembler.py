"""Device-side training-sample assembly — one jitted XLA program per batch.

This replaces the reference's DataLoader-worker ``__getitem__`` pipeline
(``spartan_dataset_masked.py:577-839`` get_within_scene_data): from raw
(rgb, depth, mask, pose) pairs it produces normalized image tensors and all
flat index sets (matches, masked/background/blind non-matches) with validity
masks, entirely on device, vmapped over the batch.

Stage order matches the reference:
  1. find correspondences on the *unaugmented* depth/poses
  2. background domain randomization (p=0.5 per image)
  3. 180-degree flip (p=0.5 per image, indices remapped)
  4. masked + background non-matches from the (flipped) mask of image b
  5. blind non-matches from unmatched mask-a pixels
  6. flatten everything to n = v*W + u

Across-scene / different-object sample types share the same program: their
match validity is forced off and their blind sets are plain mask samples
(reference get_across_scene_data, spartan_dataset_masked.py:1056-1141), so a
mixed batch compiles to a single executable.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from pdc_tpu.losses.composer import (
    MATCH_TYPE_DIFFERENT_OBJECT,
    MATCH_TYPE_SINGLE_OBJECT_ACROSS_SCENE,
    SampleIndices,
)
from pdc_tpu.ops.augmentation import (
    merge_images_with_occlusions,
    random_domain_randomize_background,
    random_flip_180,
)
from pdc_tpu.ops.correspondence import (
    create_non_correspondences,
    find_pixel_correspondences,
    make_blind_non_matches,
)
from pdc_tpu.ops.sampling import sample_from_mask
from pdc_tpu.utils.constants import DEFAULT_IMAGE_MEAN, DEFAULT_IMAGE_STD


@dataclasses.dataclass(frozen=True)
class AssemblerConfig:
    """Static sampling configuration (sizes fix the compiled shapes).

    Defaults mirror config/dense_correspondence/training/training.yaml.
    """

    num_matching_attempts: int = 10000
    num_masked_non_matches_per_match: int = 75
    num_background_non_matches_per_match: int = 75
    num_blind_samples: int = 5000
    cross_scene_num_samples: int = 10000
    domain_randomize: bool = True
    flip_augmentation: bool = True
    sample_matches_only_off_mask: bool = True
    use_image_b_mask_inv: bool = True
    # static switch: when True the host batch carries a second image pair and
    # SYNTHETIC_MULTI_OBJECT samples are composited on device
    enable_synthetic_multi_object: bool = False
    # matrix (pooled) loss mode: emit shared non-match pools instead of
    # per-match index lists (see pdc_tpu.losses.matrix_loss) — the TPU-fast
    # training path
    use_matrix_loss: bool = True
    masked_pool_size: int = 1024
    background_pool_size: int = 1024
    image_mean: Tuple[float, float, float] = DEFAULT_IMAGE_MEAN
    image_std: Tuple[float, float, float] = DEFAULT_IMAGE_STD

    @staticmethod
    def from_training_config(tc: dict) -> "AssemblerConfig":
        t = tc["training"]
        nm = int(t["num_non_matches_per_match"])
        probs = t.get("data_type_probabilities", {})
        return AssemblerConfig(
            num_matching_attempts=int(t["num_matching_attempts"]),
            num_masked_non_matches_per_match=int(nm * float(t["fraction_masked_non_matches"])),
            num_background_non_matches_per_match=int(nm * float(t["fraction_background_non_matches"])),
            num_blind_samples=int(t.get("num_blind_samples", 5000)),
            cross_scene_num_samples=int(t.get("cross_scene_num_samples", 10000)),
            domain_randomize=bool(t.get("domain_randomize", True)),
            flip_augmentation=bool(t.get("flip_augmentation", True)),
            sample_matches_only_off_mask=bool(t.get("sample_matches_only_off_mask", True)),
            use_image_b_mask_inv=bool(t.get("use_image_b_mask_inv", True)),
            enable_synthetic_multi_object=float(
                probs.get("SYNTHETIC_MULTI_OBJECT", 0)
            ) > 0,
            use_matrix_loss=bool(t.get("use_matrix_loss", True)),
            masked_pool_size=int(t.get("masked_pool_size", 1024)),
            background_pool_size=int(t.get("background_pool_size", 1024)),
        )


def _flatten_uv(uv, W):
    return uv[..., 1].astype(jnp.int32) * W + uv[..., 0].astype(jnp.int32)


def assemble_sample(key, rgb_a, depth_a, mask_a, pose_a, rgb_b, depth_b,
                    mask_b, pose_b, K, match_type, cfg: AssemblerConfig):
    """Assemble one training sample on device.

    :param rgb_*: [H, W, 3] uint8
    :param depth_*: [H, W] uint16 (mm) or float32 (m)
    :param mask_*: [H, W]
    :param match_type: scalar int32 (may be -1 for the empty sentinel)
    :return: (img_a [H,W,3] f32, img_b [H,W,3] f32, SampleIndices)
    """
    H, W = depth_a.shape
    keys = jax.random.split(key, 10)
    is_within = (match_type != MATCH_TYPE_SINGLE_OBJECT_ACROSS_SCENE) & (
        match_type != MATCH_TYPE_DIFFERENT_OBJECT
    ) & (match_type >= 0)

    # 1. correspondences (geometry runs unconditionally; validity gates it)
    uv_a, uv_b, match_valid = find_pixel_correspondences(
        depth_a, pose_a, depth_b, pose_b, K, keys[0],
        num_attempts=cfg.num_matching_attempts,
        mask_a=mask_a if cfg.sample_matches_only_off_mask else None,
    )
    match_valid = match_valid & is_within

    # 2. domain randomization (before flip, as in the reference)
    if cfg.domain_randomize:
        rgb_a = random_domain_randomize_background(keys[1], rgb_a, mask_a)
        rgb_b = random_domain_randomize_background(keys[2], rgb_b, mask_b)

    # 3. joint 180-degree flips; uv_a with mask_a, uv_b with mask_b
    if cfg.flip_augmentation:
        rgb_a, uv_a, (mask_a,) = random_flip_180(keys[3], rgb_a, uv_a, (mask_a,))
        rgb_b, uv_b, (mask_b,) = random_flip_180(keys[4], rgb_b, uv_b, (mask_b,))

    # 4. non-matches in (flipped) image b
    masked_nm_uv = create_non_correspondences(
        keys[5], uv_b, (H, W),
        num_non_matches_per_match=cfg.num_masked_non_matches_per_match,
        mask_b=mask_b,
    )  # [N, Mm, 2]
    bg_mask = (1 - (mask_b != 0).astype(jnp.uint8)) if cfg.use_image_b_mask_inv else None
    background_nm_uv = create_non_correspondences(
        keys[6], uv_b, (H, W),
        num_non_matches_per_match=cfg.num_background_non_matches_per_match,
        mask_b=bg_mask,
    )

    matches_a_flat = _flatten_uv(uv_a, W)
    matches_b_flat = _flatten_uv(uv_b, W)

    def replicate(flat, m):
        # row-major repetition: each match index repeated m times, matching
        # the reference's create_non_matches repeat-transpose-reshape
        return jnp.repeat(flat, m)

    Mm = cfg.num_masked_non_matches_per_match
    Mb = cfg.num_background_non_matches_per_match
    masked_nm_a = replicate(matches_a_flat, Mm)
    masked_nm_b = _flatten_uv(masked_nm_uv.reshape(-1, 2), W)
    masked_nm_gt = replicate(matches_b_flat, Mm)
    masked_nm_valid = jnp.repeat(match_valid, Mm)

    background_nm_a = replicate(matches_a_flat, Mb)
    background_nm_b = _flatten_uv(background_nm_uv.reshape(-1, 2), W)
    background_nm_gt = replicate(matches_b_flat, Mb)
    background_nm_valid = jnp.repeat(match_valid, Mb)

    # 5. blind non-matches
    # within-scene: unmatched mask-a pixels vs random mask-b pixels
    blind_a_w, blind_b_w, blind_ok_w = make_blind_non_matches(
        keys[7], mask_a, matches_a_flat, match_valid, mask_b,
        cfg.num_blind_samples,
    )
    # across-scene / different-object: plain mask samples on both sides
    # (reference get_across_scene_data uses cross_scene_num_samples; we share
    # the num_blind_samples static size and weight by validity)
    uv_blind_a_x, ok_ax = sample_from_mask(keys[8], mask_a, cfg.num_blind_samples)
    uv_blind_b_x, ok_bx = sample_from_mask(keys[9], mask_b, cfg.num_blind_samples)
    blind_a_x = _flatten_uv(uv_blind_a_x, W)
    blind_b_x = _flatten_uv(uv_blind_b_x, W)

    blind_a = jnp.where(is_within, blind_a_w, blind_a_x)
    blind_b = jnp.where(is_within, blind_b_w, blind_b_x)
    blind_ok = jnp.where(is_within, blind_ok_w, ok_ax & ok_bx) & (match_type >= 0)
    n_blind = blind_a.shape[0]
    blind_valid = jnp.broadcast_to(blind_ok, (n_blind,))

    # 6. normalize images
    mean = jnp.asarray(cfg.image_mean, jnp.float32)
    std = jnp.asarray(cfg.image_std, jnp.float32)
    img_a = (rgb_a.astype(jnp.float32) / 255.0 - mean) / std
    img_b = (rgb_b.astype(jnp.float32) / 255.0 - mean) / std

    indices = SampleIndices(
        matches_a=matches_a_flat,
        matches_b=matches_b_flat,
        matches_valid=match_valid,
        masked_nm_a=masked_nm_a,
        masked_nm_b=masked_nm_b,
        masked_nm_valid=masked_nm_valid,
        masked_nm_gt_b=masked_nm_gt,
        background_nm_a=background_nm_a,
        background_nm_b=background_nm_b,
        background_nm_valid=background_nm_valid,
        background_nm_gt_b=background_nm_gt,
        blind_nm_a=blind_a,
        blind_nm_b=blind_b,
        blind_nm_valid=blind_valid,
        match_type=match_type.astype(jnp.int32),
    )
    return img_a, img_b, indices


def assemble_sample_matrix(key, rgb_a, depth_a, mask_a, pose_a, rgb_b, depth_b,
                           mask_b, pose_b, K, match_type, cfg: AssemblerConfig,
                           perm_a=None, count_a=None,
                           perm_b=None, count_b=None):
    """Matrix-loss variant of :func:`assemble_sample`: same correspondence /
    augmentation pipeline, but non-matches are emitted as shared candidate
    POOLS (uniform samples of the object mask and its complement) instead of
    1.5M per-match index lists. Consumed by
    :func:`pdc_tpu.losses.matrix_loss.compose_loss_matrix`.

    ``perm_*``/``count_*``: optional precomputed valid-first pixel
    permutations of the UNaugmented masks (DeviceCache ``pixel_perm``). When
    given, every masked sampling site becomes a single randint+gather; the
    inverse-CDF searchsorted fallback costs ~35 ms/step at 640x480 B=8
    (5 binary searches of 19 dependent HBM gathers each, measured on v5e).
    """
    from pdc_tpu.losses.matrix_loss import MatrixSampleIndices
    from pdc_tpu.ops.sampling import sample_flat_from_perm

    H, W = depth_a.shape
    HW = H * W
    keys = jax.random.split(key, 10)
    use_perm = perm_a is not None
    is_within = (match_type != MATCH_TYPE_SINGLE_OBJECT_ACROSS_SCENE) & (
        match_type != MATCH_TYPE_DIFFERENT_OBJECT
    ) & (match_type >= 0)

    uv_a, uv_b, match_valid = find_pixel_correspondences(
        depth_a, pose_a, depth_b, pose_b, K, keys[0],
        num_attempts=cfg.num_matching_attempts,
        mask_a=mask_a if cfg.sample_matches_only_off_mask else None,
        perm_a=perm_a if cfg.sample_matches_only_off_mask else None,
        mask_count_a=count_a,
    )
    match_valid = match_valid & is_within

    if cfg.domain_randomize:
        rgb_a = random_domain_randomize_background(keys[1], rgb_a, mask_a)
        rgb_b = random_domain_randomize_background(keys[2], rgb_b, mask_b)

    flip_a = flip_b = jnp.asarray(False)
    if cfg.flip_augmentation:
        rgb_a, uv_a, (mask_a,), flip_a = random_flip_180(
            keys[3], rgb_a, uv_a, (mask_a,), return_flag=True)
        rgb_b, uv_b, (mask_b,), flip_b = random_flip_180(
            keys[4], rgb_b, uv_b, (mask_b,), return_flag=True)

    matches_a_flat = _flatten_uv(uv_a, W)
    matches_b_flat = _flatten_uv(uv_b, W)

    def perm_pool(k, lo, hi, size, flip):
        raw, ok = sample_flat_from_perm(k, perm_b, lo, hi, size)
        flat = jnp.where(flip, HW - 1 - raw, raw)
        return flat, jnp.broadcast_to(ok, (size,))

    # shared non-match pools over the (flipped) image-b masks
    if use_perm:
        masked_pool, masked_pool_valid = perm_pool(
            keys[5], 0, count_b, cfg.masked_pool_size, flip_b)
    else:
        pool_m_uv, pool_m_ok = sample_from_mask(
            keys[5], mask_b, cfg.masked_pool_size)
        masked_pool = _flatten_uv(pool_m_uv, W)
        masked_pool_valid = jnp.broadcast_to(
            pool_m_ok, (cfg.masked_pool_size,))

    if cfg.use_image_b_mask_inv:
        if use_perm:
            background_pool, background_pool_valid = perm_pool(
                keys[6], count_b, HW, cfg.background_pool_size, flip_b)
        else:
            inv_mask = 1 - (mask_b != 0).astype(jnp.uint8)
            pool_b_uv, pool_b_ok = sample_from_mask(
                keys[6], inv_mask, cfg.background_pool_size
            )
            background_pool = _flatten_uv(pool_b_uv, W)
            background_pool_valid = jnp.broadcast_to(
                pool_b_ok, (cfg.background_pool_size,))
    else:
        from pdc_tpu.ops.sampling import sample_uniform_pixels

        pool_b_uv = sample_uniform_pixels(keys[6], W, H, cfg.background_pool_size)
        background_pool = _flatten_uv(pool_b_uv, W)
        background_pool_valid = jnp.broadcast_to(
            jnp.asarray(True), (cfg.background_pool_size,))

    if use_perm:
        from pdc_tpu.ops.correspondence import make_blind_non_matches_perm
        from pdc_tpu.ops.sampling import sample_flat_from_perm as _sfp

        blind_a_w, blind_b_w, blind_valid_w = make_blind_non_matches_perm(
            keys[7], perm_a, count_a, flip_a, matches_a_flat, match_valid,
            perm_b, count_b, flip_b, HW, cfg.num_blind_samples,
        )
        k8a, k8b = jax.random.split(keys[8])
        raw_ax, ok_ax = _sfp(k8a, perm_a, 0, count_a, cfg.num_blind_samples)
        raw_bx, ok_bx = _sfp(k8b, perm_b, 0, count_b, cfg.num_blind_samples)
        blind_a_x = jnp.where(flip_a, HW - 1 - raw_ax, raw_ax)
        blind_b_x = jnp.where(flip_b, HW - 1 - raw_bx, raw_bx)
        blind_a = jnp.where(is_within, blind_a_w, blind_a_x)
        blind_b = jnp.where(is_within, blind_b_w, blind_b_x)
        blind_valid = jnp.where(
            is_within, blind_valid_w,
            jnp.broadcast_to(ok_ax & ok_bx, (cfg.num_blind_samples,))
        ) & (match_type >= 0)
    else:
        blind_a_w, blind_b_w, blind_ok_w = make_blind_non_matches(
            keys[7], mask_a, matches_a_flat, match_valid, mask_b,
            cfg.num_blind_samples,
        )
        uv_blind_a_x, ok_ax = sample_from_mask(keys[8], mask_a, cfg.num_blind_samples)
        uv_blind_b_x, ok_bx = sample_from_mask(keys[9], mask_b, cfg.num_blind_samples)
        blind_a = jnp.where(is_within, blind_a_w, _flatten_uv(uv_blind_a_x, W))
        blind_b = jnp.where(is_within, blind_b_w, _flatten_uv(uv_blind_b_x, W))
        blind_ok = jnp.where(is_within, blind_ok_w, ok_ax & ok_bx) & (match_type >= 0)
        blind_valid = jnp.broadcast_to(blind_ok, (cfg.num_blind_samples,))

    mean = jnp.asarray(cfg.image_mean, jnp.float32)
    std = jnp.asarray(cfg.image_std, jnp.float32)
    img_a = (rgb_a.astype(jnp.float32) / 255.0 - mean) / std
    img_b = (rgb_b.astype(jnp.float32) / 255.0 - mean) / std

    indices = MatrixSampleIndices(
        matches_a=matches_a_flat,
        matches_b=matches_b_flat,
        matches_uv_b=uv_b.astype(jnp.float32),
        matches_valid=match_valid,
        masked_pool_b=masked_pool,
        masked_pool_valid=masked_pool_valid,
        background_pool_b=background_pool,
        background_pool_valid=background_pool_valid,
        blind_nm_a=blind_a,
        blind_nm_b=blind_b,
        blind_nm_valid=blind_valid,
        match_type=match_type.astype(jnp.int32),
    )
    return img_a, img_b, indices


def assemble_synthetic_multi_object_sample_matrix(key, p1, p2, cfg: AssemblerConfig):
    """Matrix-loss variant of the synthetic multi-object compositing path:
    same merge/occlusion semantics as
    :func:`assemble_synthetic_multi_object_sample`, but non-matches are
    emitted as pools over the merged view-2 mask (and its complement), so
    SMO samples run under the pooled MXU loss too."""
    from pdc_tpu.losses.matrix_loss import MatrixSampleIndices

    H, W = p1["depth_a"].shape
    N = cfg.num_matching_attempts
    half = N // 2
    keys = jax.random.split(key, 8)

    uv_a1, uv_a2, valid_a = find_pixel_correspondences(
        p1["depth_a"], p1["pose_a"], p1["depth_b"], p1["pose_b"], p1["K"],
        keys[0], num_attempts=half, mask_a=p1["mask_a"],
    )
    uv_b1, uv_b2, valid_b = find_pixel_correspondences(
        p2["depth_a"], p2["pose_a"], p2["depth_b"], p2["pose_b"], p2["K"],
        keys[1], num_attempts=half, mask_a=p2["mask_a"],
    )

    merged_1, merged_mask_1, (pa1, valid_a), (pb1, valid_b) = merge_images_with_occlusions(
        keys[2], p1["rgb_a"], p2["rgb_a"], p1["mask_a"], p2["mask_a"],
        (uv_a1, uv_a2), (uv_b1, uv_b2), valid_a, valid_b,
    )
    merged_2, merged_mask_2, (pa2, valid_a), (pb2, valid_b) = merge_images_with_occlusions(
        keys[3], p1["rgb_b"], p2["rgb_b"], p1["mask_b"], p2["mask_b"],
        (uv_a2, uv_a1), (uv_b2, uv_b1), valid_a, valid_b,
    )

    uv_1 = jnp.concatenate([uv_a1, uv_b1], axis=0)
    uv_2 = jnp.concatenate([uv_a2.astype(jnp.float32),
                            uv_b2.astype(jnp.float32)], axis=0)
    match_valid = jnp.concatenate([valid_a, valid_b], axis=0)

    pool_m_uv, pool_m_ok = sample_from_mask(keys[4], merged_mask_2, cfg.masked_pool_size)
    inv_mask = 1 - (merged_mask_2 != 0).astype(jnp.uint8)
    pool_b_uv, pool_b_ok = sample_from_mask(keys[5], inv_mask, cfg.background_pool_size)

    mean = jnp.asarray(cfg.image_mean, jnp.float32)
    std = jnp.asarray(cfg.image_std, jnp.float32)
    img_1 = (merged_1.astype(jnp.float32) / 255.0 - mean) / std
    img_2 = (merged_2.astype(jnp.float32) / 255.0 - mean) / std

    indices = MatrixSampleIndices(
        matches_a=_flatten_uv(uv_1, W),
        matches_b=_flatten_uv(uv_2, W),
        matches_uv_b=uv_2.astype(jnp.float32),
        matches_valid=match_valid,
        masked_pool_b=_flatten_uv(pool_m_uv, W),
        masked_pool_valid=jnp.broadcast_to(pool_m_ok, (cfg.masked_pool_size,)),
        background_pool_b=_flatten_uv(pool_b_uv, W),
        background_pool_valid=jnp.broadcast_to(pool_b_ok, (cfg.background_pool_size,)),
        blind_nm_a=jnp.zeros((cfg.num_blind_samples,), jnp.int32),
        blind_nm_b=jnp.zeros((cfg.num_blind_samples,), jnp.int32),
        blind_nm_valid=jnp.zeros((cfg.num_blind_samples,), bool),
        match_type=jnp.asarray(4, jnp.int32),
    )
    return img_1, img_2, indices


@functools.partial(jax.jit, static_argnames=("cfg",))
def assemble_batch_matrix(key, batch, cfg: AssemblerConfig):
    """vmapped :func:`assemble_sample_matrix` over a host batch dict. With
    ``cfg.enable_synthetic_multi_object``, SMO rows take the composited
    matrix path (one executable for mixed batches, as in the legacy mode)."""
    B = batch["rgb_a"].shape[0]
    keys = jax.random.split(key, B)
    has_perm = "perm_a" in batch

    def one(k, ra, da, ma, pa, rb, db, mb, pb, K, mt,
            perm_a=None, count_a=None, perm_b=None, count_b=None,
            ra2=None, da2=None, ma2=None, pa2=None,
            rb2=None, db2=None, mb2=None, pb2=None, K2=None):
        base = assemble_sample_matrix(
            k, ra, da, ma, pa, rb, db, mb, pb, K, mt, cfg,
            perm_a=perm_a, count_a=count_a, perm_b=perm_b, count_b=count_b)
        if not cfg.enable_synthetic_multi_object:
            return base
        smo = assemble_synthetic_multi_object_sample_matrix(
            k,
            {"rgb_a": ra, "depth_a": da, "mask_a": ma, "pose_a": pa,
             "rgb_b": rb, "depth_b": db, "mask_b": mb, "pose_b": pb, "K": K},
            {"rgb_a": ra2, "depth_a": da2, "mask_a": ma2, "pose_a": pa2,
             "rgb_b": rb2, "depth_b": db2, "mask_b": mb2, "pose_b": pb2, "K": K2},
            cfg,
        )
        is_smo = mt == 4
        img_a, img_b, idx = _select_sample(is_smo, base, smo)
        idx = idx._replace(match_type=mt.astype(jnp.int32))
        return img_a, img_b, idx

    args = [
        keys,
        batch["rgb_a"], batch["depth_a"], batch["mask_a"], batch["pose_a"],
        batch["rgb_b"], batch["depth_b"], batch["mask_b"], batch["pose_b"],
        batch["K"], batch["match_type"],
    ]
    perm_args = [
        batch.get("perm_a"), batch.get("count_a"),
        batch.get("perm_b"), batch.get("count_b"),
    ] if has_perm else []
    smo_args = [
        batch["rgb_a_2"], batch["depth_a_2"], batch["mask_a_2"], batch["pose_a_2"],
        batch["rgb_b_2"], batch["depth_b_2"], batch["mask_b_2"], batch["pose_b_2"],
        batch["K_2"],
    ] if cfg.enable_synthetic_multi_object else []

    if has_perm and cfg.enable_synthetic_multi_object:
        fn = lambda k, ra, da, ma, pa, rb, db, mb, pb, K, mt, qa, ca, qb, cb, *s: one(  # noqa: E731
            k, ra, da, ma, pa, rb, db, mb, pb, K, mt, qa, ca, qb, cb, *s)
        return jax.vmap(fn)(*args, *perm_args, *smo_args)
    if has_perm:
        return jax.vmap(
            lambda k, ra, da, ma, pa, rb, db, mb, pb, K, mt, qa, ca, qb, cb:
            one(k, ra, da, ma, pa, rb, db, mb, pb, K, mt, qa, ca, qb, cb)
        )(*args, *perm_args)
    if cfg.enable_synthetic_multi_object:
        return jax.vmap(
            lambda k, ra, da, ma, pa, rb, db, mb, pb, K, mt, *s:
            one(k, ra, da, ma, pa, rb, db, mb, pb, K, mt,
                None, None, None, None, *s)
        )(*args, *smo_args)
    return jax.vmap(one)(*args)


def assemble_synthetic_multi_object_sample(key, p1, p2, cfg: AssemblerConfig):
    """Composite two within-scene pairs into one synthetic multi-object pair.

    Rebuild of ``get_synthetic_multi_object_within_scene_data``
    (spartan_dataset_masked.py:890-1053): pair 1 = two views (a1, a2) of
    scene A, pair 2 = two views (b1, b2) of scene B. Merged image 1 =
    composite(a1, b1); merged image 2 = composite(a2, b2); matches are the
    concatenation of both pairs' correspondences, invalidated wherever the
    foreground object of either composite occludes them. Blind non-matches
    are empty for this type (reference returns the empty sentinel).

    :param p1, p2: dicts with rgb_a/depth_a/mask_a/pose_a/rgb_b/.../K for the
        scene-A pair and the scene-B pair
    :return: (img_1, img_2, SampleIndices) with the same static shapes as
        :func:`assemble_sample`
    """
    H, W = p1["depth_a"].shape
    N = cfg.num_matching_attempts
    half = N // 2
    keys = jax.random.split(key, 8)

    uv_a1, uv_a2, valid_a = find_pixel_correspondences(
        p1["depth_a"], p1["pose_a"], p1["depth_b"], p1["pose_b"], p1["K"],
        keys[0], num_attempts=half, mask_a=p1["mask_a"],
    )
    uv_b1, uv_b2, valid_b = find_pixel_correspondences(
        p2["depth_a"], p2["pose_a"], p2["depth_b"], p2["pose_b"], p2["K"],
        keys[1], num_attempts=half, mask_a=p2["mask_a"],
    )

    # composite view 1 (a1 + b1) and view 2 (a2 + b2); independent coins
    merged_1, merged_mask_1, (pa1, valid_a), (pb1, valid_b) = merge_images_with_occlusions(
        keys[2], p1["rgb_a"], p2["rgb_a"], p1["mask_a"], p2["mask_a"],
        (uv_a1, uv_a2), (uv_b1, uv_b2), valid_a, valid_b,
    )
    merged_2, merged_mask_2, (pa2, valid_a), (pb2, valid_b) = merge_images_with_occlusions(
        keys[3], p1["rgb_b"], p2["rgb_b"], p1["mask_b"], p2["mask_b"],
        (uv_a2, uv_a1), (uv_b2, uv_b1), valid_a, valid_b,
    )

    # concatenated matches in the merged images (a-pair then b-pair)
    uv_1 = jnp.concatenate([uv_a1, uv_b1], axis=0)   # view-1 pixels [N, 2]
    uv_2 = jnp.concatenate([uv_a2.astype(jnp.float32),
                            uv_b2.astype(jnp.float32)], axis=0)
    match_valid = jnp.concatenate([valid_a, valid_b], axis=0)

    matches_1_flat = _flatten_uv(uv_1, W)
    matches_2_flat = _flatten_uv(uv_2, W)

    masked_nm_uv = create_non_correspondences(
        keys[4], uv_2, (H, W),
        num_non_matches_per_match=cfg.num_masked_non_matches_per_match,
        mask_b=merged_mask_2,
    )
    bg_mask = (1 - (merged_mask_2 != 0).astype(jnp.uint8)) if cfg.use_image_b_mask_inv else None
    background_nm_uv = create_non_correspondences(
        keys[5], uv_2, (H, W),
        num_non_matches_per_match=cfg.num_background_non_matches_per_match,
        mask_b=bg_mask,
    )

    Mm = cfg.num_masked_non_matches_per_match
    Mb = cfg.num_background_non_matches_per_match
    indices = SampleIndices(
        matches_a=matches_1_flat,
        matches_b=matches_2_flat,
        matches_valid=match_valid,
        masked_nm_a=jnp.repeat(matches_1_flat, Mm),
        masked_nm_b=_flatten_uv(masked_nm_uv.reshape(-1, 2), W),
        masked_nm_valid=jnp.repeat(match_valid, Mm),
        masked_nm_gt_b=jnp.repeat(matches_2_flat, Mm),
        background_nm_a=jnp.repeat(matches_1_flat, Mb),
        background_nm_b=_flatten_uv(background_nm_uv.reshape(-1, 2), W),
        background_nm_valid=jnp.repeat(match_valid, Mb),
        background_nm_gt_b=jnp.repeat(matches_2_flat, Mb),
        blind_nm_a=jnp.zeros((cfg.num_blind_samples,), jnp.int32),
        blind_nm_b=jnp.zeros((cfg.num_blind_samples,), jnp.int32),
        blind_nm_valid=jnp.zeros((cfg.num_blind_samples,), bool),
        match_type=jnp.asarray(4, jnp.int32),  # SYNTHETIC_MULTI_OBJECT
    )

    mean = jnp.asarray(cfg.image_mean, jnp.float32)
    std = jnp.asarray(cfg.image_std, jnp.float32)
    img_1 = (merged_1.astype(jnp.float32) / 255.0 - mean) / std
    img_2 = (merged_2.astype(jnp.float32) / 255.0 - mean) / std
    return img_1, img_2, indices


def _select_sample(use_b, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(use_b, y, x), a, b
    )


@functools.partial(jax.jit, static_argnames=("cfg",))
def assemble_batch(key, batch, cfg: AssemblerConfig):
    """vmapped :func:`assemble_sample` over a host batch dict
    (see SpartanDataset.make_host_batch).

    With ``cfg.enable_synthetic_multi_object`` the batch carries a second
    image pair (``*_2`` keys); SYNTHETIC_MULTI_OBJECT rows take the composited
    path, everything else the standard one (both are computed, the result
    selected per sample — one compiled executable for mixed batches).

    :return: (img_a [B,H,W,3], img_b [B,H,W,3], SampleIndices with leading
        batch axis)
    """
    B = batch["rgb_a"].shape[0]
    keys = jax.random.split(key, B)

    def one(k, ra, da, ma, pa, rb, db, mb, pb, K, mt,
            ra2=None, da2=None, ma2=None, pa2=None,
            rb2=None, db2=None, mb2=None, pb2=None, K2=None):
        base = assemble_sample(k, ra, da, ma, pa, rb, db, mb, pb, K, mt, cfg)
        if not cfg.enable_synthetic_multi_object:
            return base
        smo = assemble_synthetic_multi_object_sample(
            k,
            {"rgb_a": ra, "depth_a": da, "mask_a": ma, "pose_a": pa,
             "rgb_b": rb, "depth_b": db, "mask_b": mb, "pose_b": pb, "K": K},
            {"rgb_a": ra2, "depth_a": da2, "mask_a": ma2, "pose_a": pa2,
             "rgb_b": rb2, "depth_b": db2, "mask_b": mb2, "pose_b": pb2, "K": K2},
            cfg,
        )
        is_smo = mt == 4
        img_a, img_b, idx = _select_sample(is_smo, base, smo)
        # keep the true match_type (selection above would also work, but -1
        # empties must survive)
        idx = idx._replace(match_type=mt.astype(jnp.int32))
        return img_a, img_b, idx

    args = [
        keys,
        batch["rgb_a"], batch["depth_a"], batch["mask_a"], batch["pose_a"],
        batch["rgb_b"], batch["depth_b"], batch["mask_b"], batch["pose_b"],
        batch["K"], batch["match_type"],
    ]
    if cfg.enable_synthetic_multi_object:
        args += [
            batch["rgb_a_2"], batch["depth_a_2"], batch["mask_a_2"], batch["pose_a_2"],
            batch["rgb_b_2"], batch["depth_b_2"], batch["mask_b_2"], batch["pose_b_2"],
            batch["K_2"],
        ]
    return jax.vmap(one)(*args)
