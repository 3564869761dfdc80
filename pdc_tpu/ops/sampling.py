"""Jit-friendly random pixel sampling.

The reference samples pixels uniformly over the nonzero entries of a mask via
``torch.nonzero`` + ``index_select`` (``correspondence_finder.py:92-121``),
which has data-dependent shapes. Here we keep shapes static by sampling with
an inverse-CDF over the mask's cumulative sum: identical distribution
(uniform over nonzero pixels, i.i.d. with replacement), fully jit-compatible,
and it vectorizes over a batch of masks with ``vmap``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_from_mask(key, mask, num_samples: int):
    """Sample pixel locations uniformly from the nonzero entries of a mask.

    :param key: jax PRNG key
    :param mask: [H, W] array; nonzero entries are candidates. Any dtype.
    :param num_samples: static int, number of samples (with replacement)
    :return: (uv, valid)
        uv: [num_samples, 2] int32 (u, v) pixel coordinates
        valid: scalar bool — False iff the mask was entirely empty
        (reference returns ``(None, None)`` in that case,
        correspondence_finder.py:114-115)
    """
    H, W = mask.shape
    flat = (jnp.asarray(mask).reshape(-1) != 0).astype(jnp.float32)
    cdf = jnp.cumsum(flat)
    total = cdf[-1]
    valid = total > 0
    # Uniform in [0, total); searchsorted(side='right') picks index i with
    # probability flat[i]/total — exactly uniform over the nonzero entries.
    u = jax.random.uniform(key, (num_samples,)) * jnp.maximum(total, 1.0)
    idx = jnp.searchsorted(cdf, u, side="right").astype(jnp.int32)
    idx = jnp.clip(idx, 0, H * W - 1)
    uv = jnp.stack([idx % W, idx // W], axis=-1)
    return uv, valid


def sample_uniform_pixels(key, width: int, height: int, num_samples: int):
    """Uniform i.i.d. pixel sampling over the full image.

    Matches the reference's ``pytorch_rand_select_pixel``
    (correspondence_finder.py:29-34): floor(U[0,1) * dim).
    :return: [num_samples, 2] int32 (u, v)
    """
    uv01 = jax.random.uniform(key, (num_samples, 2))
    scale = jnp.array([width, height], dtype=jnp.float32)
    return jnp.floor(uv01 * scale).astype(jnp.int32)


def sample_flat_from_perm(key, perm_row, lo, hi, num_samples: int):
    """Sample flat pixel indices uniformly from ``perm_row[lo:hi]`` (with
    replacement).

    ``perm_row`` is a precomputed valid-first pixel permutation of one frame
    (see :class:`pdc_tpu.data.device_cache.DeviceCache` ``pixel_perm``):
    entries [0, mask_count) are the mask pixels, entries [mask_count, HW) the
    background. One uniform draw + one parallel gather replaces the
    inverse-CDF searchsorted (19 dependent HBM gathers at 640x480 — measured
    as the dominant cost of on-device sample assembly).

    :param perm_row: [HW] int32
    :param lo, hi: traced scalars — sample from perm_row[lo:hi]
    :return: (idx [num_samples] int32, valid scalar bool = hi > lo)
    """
    n = hi - lo
    valid = n > 0
    r = lo + jax.random.randint(key, (num_samples,), 0, jnp.maximum(n, 1))
    return jnp.take(perm_row, r, axis=0).astype(jnp.int32), valid


def build_pixel_perm(mask):
    """Valid-first pixel permutation of one mask image.

    :param mask: [H, W] (nonzero = object)
    :return: (perm [H*W] int32 — mask-pixel indices first, background after;
        count scalar int32 — number of mask pixels)
    """
    flat = (jnp.asarray(mask).reshape(-1) != 0)
    perm = jnp.argsort(~flat, stable=True).astype(jnp.int32)
    return perm, jnp.sum(flat).astype(jnp.int32)


def sample_flat_from_mask(key, mask_flat, num_samples: int):
    """Like :func:`sample_from_mask` but over an already-flattened mask.

    :param mask_flat: [N] array, nonzero = candidate
    :return: (idx [num_samples] int32, valid scalar bool)
    """
    flat = (jnp.asarray(mask_flat) != 0).astype(jnp.float32)
    cdf = jnp.cumsum(flat)
    total = cdf[-1]
    valid = total > 0
    u = jax.random.uniform(key, (num_samples,)) * jnp.maximum(total, 1.0)
    idx = jnp.searchsorted(cdf, u, side="right").astype(jnp.int32)
    return jnp.clip(idx, 0, flat.shape[0] - 1), valid
