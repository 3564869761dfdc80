"""Device-side data augmentation with joint image + pixel-index mutation.

TPU-native rebuild of ``correspondence_augmentation.py``: every op is a pure
jnp function over fixed-shape arrays, selected with ``jnp.where`` on traced
booleans so the whole augmentation pipeline lives inside the jitted sample
assembler (the reference runs PIL ops in DataLoader worker processes).

Images are [H, W, C] arrays; pixel positions are [N, 2] (u, v).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flip_180(image, uv):
    """Rotate an image 180 degrees (flip vertical + horizontal) and remap
    pixel positions (reference :45-84)."""
    H, W = image.shape[0], image.shape[1]
    flipped = image[::-1, ::-1]
    uv = jnp.asarray(uv)
    new_uv = jnp.stack([(W - 1) - uv[..., 0], (H - 1) - uv[..., 1]], axis=-1)
    return flipped, new_uv.astype(uv.dtype)


def random_flip_180(key, image, uv, extra_images=(), return_flag: bool = False):
    """With probability 0.5 rotate image(s) 180 degrees and remap uv
    (reference ``random_image_and_indices_mutation``, :19-56).

    With ``return_flag`` also returns the flip coin (bool scalar) so callers
    can remap externally-sampled flat indices (a 180-degree rotation maps
    flat index n to H*W-1-n)."""
    do = jax.random.uniform(key) < 0.5
    flipped, new_uv = flip_180(image, uv)
    image_out = jnp.where(do, flipped, image)
    uv_out = jnp.where(do, new_uv, jnp.asarray(uv))
    extras_out = tuple(jnp.where(do, e[::-1, ::-1], e) for e in extra_images)
    if return_flag:
        return image_out, uv_out, extras_out, do
    return image_out, uv_out, extras_out


def _random_solid_color(key, shape):
    rgb = jnp.floor(jax.random.uniform(key, (3,)) * 255.0).astype(jnp.uint8)
    return jnp.ones(shape, jnp.uint8) * rgb


def _gradient_image(rgb1, rgb2, vertical, shape):
    H, W = shape[0], shape[1]
    pv = jnp.tile(jnp.linspace(0.0, 1.0, H)[:, None, None], (1, W, 1))
    ph = jnp.tile(jnp.linspace(0.0, 1.0, W)[None, :, None], (H, 1, 1))
    p = jnp.where(vertical, pv, ph)
    out = rgb2.astype(jnp.float32) * p + rgb1.astype(jnp.float32) * (1.0 - p)
    return out.astype(jnp.uint8)


def _random_uint8_image(key, shape, max_val):
    return jnp.floor(jax.random.uniform(key, shape) * max_val).astype(jnp.uint8)


def domain_randomize_background(key, image_rgb, mask):
    """Replace the background (mask == 0) with a random solid color or
    gradient, optionally +- uint8 noise with wraparound overflow — matching
    the reference bit-for-bit in spirit (``:96-214``; it deliberately relies
    on uint8 overflow: "do not need to clamp, since uint8 will just
    overflow").

    :param image_rgb: [H, W, 3] uint8
    :param mask: [H, W] nonzero = object
    :return: [H, W, 3] uint8
    """
    image_rgb = jnp.asarray(image_rgb).astype(jnp.uint8)
    shape = image_rgb.shape
    k_kind, k_c1, k_c2, k_vert, k_noise_q, k_n1, k_n2 = jax.random.split(key, 7)

    solid = _random_solid_color(k_c1, shape)
    grad = _gradient_image(
        _random_solid_color(k_c1, shape)[0, 0],
        _random_solid_color(k_c2, shape)[0, 0],
        jax.random.uniform(k_vert) > 0.5,
        shape,
    )
    rand_image = jnp.where(jax.random.uniform(k_kind) < 0.5, solid, grad)

    noisy = (
        rand_image
        + _random_uint8_image(k_n1, shape, 50)
        - _random_uint8_image(k_n2, shape, 50)
    )  # uint8 arithmetic wraps, as in the reference
    rand_image = jnp.where(jax.random.uniform(k_noise_q) < 0.5, rand_image, noisy)

    obj = (jnp.asarray(mask) != 0)[..., None]
    return jnp.where(obj, image_rgb, rand_image)


def random_domain_randomize_background(key, image_rgb, mask):
    """With probability 0.5 apply :func:`domain_randomize_background`
    (reference :86-93)."""
    k_coin, k_dr = jax.random.split(key)
    randomized = domain_randomize_background(k_dr, image_rgb, mask)
    do = jax.random.uniform(k_coin) < 0.5
    return jnp.where(do, randomized, jnp.asarray(image_rgb).astype(jnp.uint8))


def merge_images_with_occlusions(
    key,
    image_a,
    image_b,
    mask_a,
    mask_b,
    matches_a_pair,
    matches_b_pair,
    valid_a,
    valid_b,
):
    """Composite two object crops into one synthetic multi-object image and
    prune (mask-out) matches occluded by the foreground object.

    Reference ``merge_images_with_occlusions`` (:217-333); the reference's
    per-index python loop for occlusion pruning (:319-324) becomes a gather
    on the foreground mask, and "pruning" becomes validity masking.

    :param matches_*_pair: tuple of ([N,2] uv in this image, [N,2] uv in the
        partner image)
    :param valid_*: [N] bool validity of those matches
    :return: merged_image [H,W,3] uint8, merged_mask [H,W] int32,
        (matches_a_pair, valid_a), (matches_b_pair, valid_b) with occluded
        background matches invalidated
    """
    H, W = mask_a.shape
    a_is_fg = jax.random.uniform(key) < 0.5

    mask_a_b = (jnp.asarray(mask_a) != 0)
    mask_b_b = (jnp.asarray(mask_b) != 0)
    fg_mask = jnp.where(a_is_fg, mask_a_b, mask_b_b)
    image_a = jnp.asarray(image_a).astype(jnp.uint8)
    image_b = jnp.asarray(image_b).astype(jnp.uint8)
    fg_img = jnp.where(a_is_fg, image_a, image_b)
    bg_img = jnp.where(a_is_fg, image_b, image_a)

    merged = jnp.where(fg_mask[..., None], fg_img, bg_img)
    merged_mask = (mask_a_b | mask_b_b).astype(jnp.int32)

    def occluded(uv):
        u = jnp.clip(uv[:, 0].astype(jnp.int32), 0, W - 1)
        v = jnp.clip(uv[:, 1].astype(jnp.int32), 0, H - 1)
        return fg_mask[v, u]

    # Matches belonging to the background image die where the foreground
    # object covers them.
    a_occ = occluded(matches_a_pair[0])
    b_occ = occluded(matches_b_pair[0])
    valid_a = valid_a & (a_is_fg | ~a_occ)
    valid_b = valid_b & (~a_is_fg | ~b_occ)
    return merged, merged_mask, (matches_a_pair, valid_a), (matches_b_pair, valid_b)


def merge_matches(matches_one, valid_one, matches_two, valid_two):
    """Concatenate two fixed-size match sets with their validity masks
    (reference ``merge_matches``, :335-347)."""
    uv = jnp.concatenate([jnp.asarray(matches_one), jnp.asarray(matches_two)], axis=0)
    valid = jnp.concatenate([valid_one, valid_two], axis=0)
    return uv, valid
