"""Correspondence engine vs the numpy oracle on an analytic synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np

from pdc_tpu.data.synthetic import SyntheticScene
from pdc_tpu.ops.correspondence import (
    create_non_correspondences,
    find_pixel_correspondences,
    make_blind_non_matches,
    reproject_pixels,
)
from pdc_tpu.ops.sampling import sample_from_mask, sample_uniform_pixels
from oracle import oracle_correspondence


def _scene(occluder=None):
    return SyntheticScene(width=64, height=48, num_frames=6, occluder=occluder)


def test_reprojection_matches_oracle():
    scene = _scene()
    rgb, depth, mask, poses = scene.render_all()
    K = scene.K
    a, b = 0, 1

    key = jax.random.PRNGKey(0)
    uv_a, uv_b, valid = find_pixel_correspondences(
        depth[a], poses[a], depth[b], poses[b], K, key, num_attempts=300
    )
    uv_a, uv_b, valid = map(np.asarray, (uv_a, uv_b, valid))
    assert valid.sum() > 50  # plenty of overlap in a ring scene

    checked = 0
    for i in range(len(valid)):
        expected = oracle_correspondence(
            int(uv_a[i, 0]), int(uv_a[i, 1]), depth[a], poses[a], depth[b], poses[b], K
        )
        if valid[i]:
            assert expected is not None, f"XLA says valid, oracle prunes: {uv_a[i]}"
            np.testing.assert_allclose(uv_b[i], expected, atol=0.02)
            checked += 1
        else:
            # the oracle must also prune it (allow boundary disagreements
            # within half a pixel of the FOV edge)
            if expected is not None:
                assert (
                    expected[0] < 1 or expected[0] > scene.width - 1
                    or expected[1] < 1 or expected[1] > scene.height - 1
                )
    assert checked > 50


def test_correspondence_geometric_consistency():
    """A valid correspondence must view the same world point (< 5 mm apart)."""
    scene = _scene()
    _, depth, _, poses = scene.render_all()
    K = scene.K
    from pdc_tpu.geom.camera import unproject_to_camera
    from pdc_tpu.geom.transforms import transform_points

    key = jax.random.PRNGKey(1)
    uv_a, uv_b, valid = find_pixel_correspondences(
        depth[0], poses[0], depth[2], poses[2], K, key, num_attempts=500
    )
    uv_a, uv_b, valid = map(np.asarray, (uv_a, uv_b, valid))

    za = depth[0].astype(np.float32)[uv_a[:, 1], uv_a[:, 0]] / 1000.0
    pts_a = np.asarray(unproject_to_camera(uv_a.astype(np.float32), za, K))
    world_a = np.asarray(transform_points(jnp.asarray(poses[0], jnp.float32), pts_a))

    ub = np.clip(uv_b[:, 0].astype(int), 0, scene.width - 1)
    vb = np.clip(uv_b[:, 1].astype(int), 0, scene.height - 1)
    zb = depth[2].astype(np.float32)[vb, ub] / 1000.0
    pts_b = np.asarray(unproject_to_camera(uv_b, zb, K))
    world_b = np.asarray(transform_points(jnp.asarray(poses[2], jnp.float32), pts_b))

    err = np.linalg.norm(world_a - world_b, axis=1)[valid]
    assert err.size > 50
    # integer-pixel depth lookup adds < ~1px of parallax error at this scale
    assert np.median(err) < 0.02
    assert (err < 0.06).mean() > 0.95


def test_masked_correspondences_start_on_mask():
    scene = _scene()
    _, depth, mask, poses = scene.render_all()
    key = jax.random.PRNGKey(2)
    uv_a, uv_b, valid = find_pixel_correspondences(
        depth[0], poses[0], depth[1], poses[1], scene.K, key,
        num_attempts=200, mask_a=mask[0],
    )
    uv_a, valid = np.asarray(uv_a), np.asarray(valid)
    assert valid.sum() > 20
    on_mask = mask[0][uv_a[:, 1], uv_a[:, 0]]
    assert (on_mask != 0).all()


def test_occlusion_pruning():
    """With an occluder over the object in frame b, correspondences landing
    behind it must be pruned."""
    # a low, wide canopy directly above the object disc so that sightlines
    # from the ring cameras to the disc pass through it
    occ = (-0.3, 0.3, -0.3, 0.3, 0.08)
    scene_occ = _scene(occluder=occ)
    scene_free = _scene()
    _, depth_occ, _, poses = scene_occ.render_all()
    _, depth_free, mask, _ = scene_free.render_all()

    key = jax.random.PRNGKey(3)
    # a: occluder-free view of the object; b: occluded view
    _, _, valid_free = find_pixel_correspondences(
        depth_free[0], poses[0], depth_free[3], poses[3], scene_free.K, key,
        num_attempts=400, mask_a=mask[0],
    )
    _, uv_b, valid_occ = find_pixel_correspondences(
        depth_free[0], poses[0], depth_occ[3], poses[3], scene_free.K, key,
        num_attempts=400, mask_a=mask[0],
    )
    # occluder must remove a meaningful fraction of matches
    assert int(np.sum(np.asarray(valid_occ))) < int(np.sum(np.asarray(valid_free)))


def test_sample_from_mask_uniformity():
    mask = np.zeros((20, 30), np.uint8)
    mask[5:10, 10:20] = 1
    key = jax.random.PRNGKey(0)
    uv, valid = sample_from_mask(key, mask, 5000)
    uv = np.asarray(uv)
    assert bool(valid)
    assert (mask[uv[:, 1], uv[:, 0]] != 0).all()
    # roughly uniform: each of the 50 mask pixels gets ~100 hits
    counts = np.zeros(mask.shape)
    np.add.at(counts, (uv[:, 1], uv[:, 0]), 1)
    hits = counts[mask != 0]
    assert hits.min() > 40 and hits.max() < 200


def test_sample_from_empty_mask():
    mask = np.zeros((8, 8), np.uint8)
    uv, valid = sample_from_mask(jax.random.PRNGKey(0), mask, 10)
    assert not bool(valid)
    assert np.asarray(uv).shape == (10, 2)


def test_sample_uniform_pixels_bounds():
    uv = np.asarray(sample_uniform_pixels(jax.random.PRNGKey(0), 64, 48, 1000))
    assert uv[:, 0].min() >= 0 and uv[:, 0].max() < 64
    assert uv[:, 1].min() >= 0 and uv[:, 1].max() < 48


def test_non_correspondences_shape_and_distance():
    key = jax.random.PRNGKey(4)
    matches = jnp.array([[10.0, 10.0], [30.0, 20.0], [5.0, 40.0]])
    nm = create_non_correspondences(key, matches, (48, 64), num_non_matches_per_match=50)
    nm = np.asarray(nm)
    assert nm.shape == (3, 50, 2)
    assert nm[..., 0].min() >= 0 and nm[..., 0].max() <= 63
    assert nm[..., 1].min() >= 0 and nm[..., 1].max() <= 47
    # collisions are perturbed away: those still within 1px of the match in
    # BOTH coords should be very rare (the perturbation is the reference's
    # probabilistic scheme, so allow a small tail)
    d = np.abs(nm - np.asarray(matches)[:, None, :])
    both_close = ((d[..., 0] < 0.5) & (d[..., 1] < 0.5)).mean()
    assert both_close < 0.02


def test_non_correspondences_respect_mask():
    mask = np.zeros((48, 64), np.uint8)
    mask[10:30, 20:50] = 1
    key = jax.random.PRNGKey(5)
    matches = jnp.array([[25.0, 15.0]])
    nm = np.asarray(
        create_non_correspondences(key, matches, (48, 64), 200, mask_b=mask)
    )[0]
    # most samples stay on the mask; perturbed collisions may step off
    iu = np.clip(np.round(nm[:, 0]).astype(int), 0, 63)
    iv = np.clip(np.round(nm[:, 1]).astype(int), 0, 47)
    assert (mask[iv, iu] != 0).mean() > 0.8


def test_blind_non_matches():
    scene = _scene()
    _, depth, mask, poses = scene.render_all()
    H, W = mask[0].shape
    key = jax.random.PRNGKey(6)
    uv_a, _, valid = find_pixel_correspondences(
        depth[0], poses[0], depth[1], poses[1], scene.K, key,
        num_attempts=100, mask_a=mask[0],
    )
    matches_flat = np.asarray(uv_a[:, 1] * W + uv_a[:, 0])
    blind_a, blind_b, ok = make_blind_non_matches(
        key, mask[0], jnp.asarray(matches_flat), valid, mask[1], 500
    )
    blind_a, blind_b = np.asarray(blind_a), np.asarray(blind_b)
    assert bool(ok)
    mask_a_flat = mask[0].reshape(-1)
    mask_b_flat = mask[1].reshape(-1)
    assert (mask_a_flat[blind_a] != 0).all()
    assert (mask_b_flat[blind_b] != 0).all()
    # none of the blind a-pixels is a matched pixel
    matched = set(matches_flat[np.asarray(valid)].tolist())
    assert not (set(blind_a.tolist()) & matched)


def test_vmap_over_pairs():
    """The engine must vmap cleanly over a batch of image pairs (DP axis)."""
    scene = _scene()
    _, depth, mask, poses = scene.render_all()
    K = scene.K
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    da = jnp.stack([depth[i] for i in range(B)])
    db = jnp.stack([depth[i + 1] for i in range(B)])
    pa = jnp.stack([poses[i] for i in range(B)])
    pb = jnp.stack([poses[i + 1] for i in range(B)])
    ma = jnp.stack([mask[i] for i in range(B)])

    fn = jax.vmap(
        lambda d1, p1, d2, p2, m, k: find_pixel_correspondences(
            d1, p1, d2, p2, K, k, num_attempts=128, mask_a=m
        )
    )
    uv_a, uv_b, valid = fn(da, pa, db, pb, ma, keys)
    assert uv_a.shape == (B, 128, 2)
    assert uv_b.shape == (B, 128, 2)
    assert valid.shape == (B, 128)
    assert bool(valid.any())
