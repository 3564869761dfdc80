"""Precomputed valid-first pixel permutations: distribution and flip
semantics of the single-gather masked sampler that replaces the inverse-CDF
searchsorted on the device-cache path."""

import jax
import jax.numpy as jnp
import numpy as np

from pdc_tpu.ops.correspondence import (
    find_pixel_correspondences, make_blind_non_matches_perm)
from pdc_tpu.ops.sampling import build_pixel_perm, sample_flat_from_perm


def _mask(H=24, W=32, frac=0.2, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random((H, W)) < frac).astype(np.uint8)


def test_build_pixel_perm_partitions():
    m = _mask()
    perm, count = build_pixel_perm(jnp.asarray(m))
    perm = np.asarray(perm)
    flat = m.reshape(-1) != 0
    assert int(count) == flat.sum()
    assert sorted(perm.tolist()) == list(range(flat.size))  # a permutation
    assert flat[perm[: int(count)]].all()          # mask pixels first
    assert not flat[perm[int(count):]].any()       # background after


def test_sample_from_perm_mask_and_background():
    m = _mask(frac=0.3, seed=1)
    perm, count = build_pixel_perm(jnp.asarray(m))
    flat = m.reshape(-1) != 0
    HW = flat.size

    idx, ok = sample_flat_from_perm(jax.random.PRNGKey(0), perm, 0, count, 500)
    assert bool(ok)
    assert flat[np.asarray(idx)].all()

    idx_bg, ok_bg = sample_flat_from_perm(
        jax.random.PRNGKey(1), perm, count, HW, 500)
    assert bool(ok_bg)
    assert not flat[np.asarray(idx_bg)].any()


def test_sample_from_perm_uniform():
    """Chi-squared sanity: draws cover the mask roughly uniformly."""
    m = _mask(H=8, W=8, frac=0.5, seed=2)
    perm, count = build_pixel_perm(jnp.asarray(m))
    n = int(count)
    draws, _ = sample_flat_from_perm(
        jax.random.PRNGKey(2), perm, 0, count, 20000)
    counts = np.bincount(np.asarray(draws), minlength=64)
    on = counts[m.reshape(-1) != 0]
    expected = 20000 / n
    chi2 = ((on - expected) ** 2 / expected).sum()
    # dof = n-1; generous 5-sigma-ish bound
    assert chi2 < (n - 1) + 6 * np.sqrt(2 * (n - 1))


def test_empty_mask_invalid():
    m = np.zeros((8, 8), np.uint8)
    perm, count = build_pixel_perm(jnp.asarray(m))
    _, ok = sample_flat_from_perm(jax.random.PRNGKey(0), perm, 0, count, 16)
    assert not bool(ok)


def test_blind_perm_flip_and_matched_exclusion():
    H, W = 16, 16
    HW = H * W
    m = _mask(H, W, frac=0.4, seed=3)
    perm, count = build_pixel_perm(jnp.asarray(m))
    flat = m.reshape(-1) != 0

    # matched set (post-flip coords): mark the first 10 mask pixels, flipped
    mask_idx = np.where(flat)[0]
    matches = jnp.asarray(HW - 1 - mask_idx[:10], jnp.int32)
    valid = jnp.ones((10,), bool)

    blind_a, blind_b, ok = make_blind_non_matches_perm(
        jax.random.PRNGKey(4), perm, count, jnp.asarray(True),
        matches, valid, perm, count, jnp.asarray(False), HW, 400)
    blind_a = np.asarray(blind_a)
    blind_b = np.asarray(blind_b)
    ok = np.asarray(ok)

    # flipped a-draws land on the flipped mask
    assert flat[HW - 1 - blind_a].all()
    # b-draws (unflipped) land on the mask
    assert flat[blind_b].all()
    # no valid draw hits a matched pixel
    assert not np.isin(blind_a[ok], np.asarray(matches)).any()
    # some overlap was actually rejected (10/~100 mask pixels, 400 draws)
    assert (~ok).any()


def test_correspondences_with_perm_match_mask():
    """find_pixel_correspondences(perm_a=...) sources only mask pixels and
    agrees with the mask-based path's validity semantics."""
    from pdc_tpu.data.synthetic import SyntheticScene

    scene = SyntheticScene(width=32, height=24, num_frames=3)
    rgb, depth, mask, poses = scene.render_all()
    perm, count = build_pixel_perm(jnp.asarray(mask[0]))
    uv_a, uv_b, ok = find_pixel_correspondences(
        depth[0], poses[0], depth[1], poses[1], scene.K,
        jax.random.PRNGKey(0), num_attempts=128,
        perm_a=perm, mask_count_a=count)
    uv_a = np.asarray(uv_a)
    flat = np.asarray(mask[0]).reshape(-1) != 0
    assert flat[uv_a[:, 1] * 32 + uv_a[:, 0]].all()
    assert np.asarray(ok).any()
