"""Direct unit tests for the device-side augmentation ops."""

import jax
import jax.numpy as jnp
import numpy as np

from pdc_tpu.ops.augmentation import (
    domain_randomize_background,
    flip_180,
    merge_images_with_occlusions,
    merge_matches,
    random_domain_randomize_background,
    random_flip_180,
)

H, W = 12, 16


def test_flip_180_image_and_indices(rng):
    img = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    uv = jnp.array([[0, 0], [5, 3], [W - 1, H - 1]])
    flipped, new_uv = flip_180(jnp.asarray(img), uv)
    # image rotated 180 degrees
    np.testing.assert_array_equal(np.asarray(flipped), img[::-1, ::-1])
    # indices remapped: pixel values must follow their coordinates
    for (u, v), (nu, nv) in zip(np.asarray(uv), np.asarray(new_uv)):
        np.testing.assert_array_equal(img[v, u], np.asarray(flipped)[nv, nu])
    # corners map to opposite corners
    np.testing.assert_array_equal(np.asarray(new_uv)[0], [W - 1, H - 1])
    np.testing.assert_array_equal(np.asarray(new_uv)[2], [0, 0])


def test_flip_180_involution(rng):
    img = jnp.asarray(rng.randint(0, 255, (H, W, 3)).astype(np.uint8))
    uv = jnp.array([[2, 7]])
    img2, uv2 = flip_180(*flip_180(img, uv))
    np.testing.assert_array_equal(np.asarray(img2), np.asarray(img))
    np.testing.assert_array_equal(np.asarray(uv2), np.asarray(uv))


def test_random_flip_is_coin_flip(rng):
    img = jnp.asarray(rng.randint(0, 255, (H, W, 3)).astype(np.uint8))
    uv = jnp.array([[2, 7]])
    outcomes = set()
    for i in range(20):
        out, new_uv, _ = random_flip_180(jax.random.PRNGKey(i), img, uv)
        outcomes.add(bool((np.asarray(out) == np.asarray(img)).all()))
    assert outcomes == {True, False}  # both branches occur


def test_domain_randomize_preserves_object(rng):
    img = rng.randint(0, 255, (H, W, 3)).astype(np.uint8)
    mask = np.zeros((H, W), np.uint8)
    mask[3:8, 4:10] = 1
    out = np.asarray(domain_randomize_background(jax.random.PRNGKey(0),
                                                 jnp.asarray(img), jnp.asarray(mask)))
    # object pixels untouched
    np.testing.assert_array_equal(out[mask != 0], img[mask != 0])
    # background replaced (overwhelmingly different from the original)
    bg_same = (out[mask == 0] == img[mask == 0]).all(axis=-1).mean()
    assert bg_same < 0.1


def test_random_domain_randomize_both_branches(rng):
    img = jnp.asarray(rng.randint(0, 255, (H, W, 3)).astype(np.uint8))
    mask = jnp.zeros((H, W), jnp.uint8)
    outcomes = set()
    for i in range(20):
        out = random_domain_randomize_background(jax.random.PRNGKey(i), img, mask)
        outcomes.add(bool((np.asarray(out) == np.asarray(img)).all()))
    assert outcomes == {True, False}


def test_merge_images_occlusion_validity(rng):
    img_a = np.full((H, W, 3), 50, np.uint8)
    img_b = np.full((H, W, 3), 200, np.uint8)
    mask_a = np.zeros((H, W), np.uint8)
    mask_a[0:6, 0:8] = 1
    mask_b = np.zeros((H, W), np.uint8)
    mask_b[4:10, 6:14] = 1

    # matches for each image: one in the overlap zone, one clear of it
    uv_a = jnp.array([[7, 5], [1, 1]])   # (7,5) inside mask_b's area
    uv_b = jnp.array([[7, 5], [13, 9]])  # (7,5) inside mask_a's area
    va = jnp.ones(2, bool)
    vb = jnp.ones(2, bool)

    merged, merged_mask, (pa, va2), (pb, vb2) = merge_images_with_occlusions(
        jax.random.PRNGKey(3), jnp.asarray(img_a), jnp.asarray(img_b),
        jnp.asarray(mask_a), jnp.asarray(mask_b), (uv_a, uv_a), (uv_b, uv_b),
        va, vb,
    )
    merged = np.asarray(merged)
    merged_mask = np.asarray(merged_mask)
    va2, vb2 = np.asarray(va2), np.asarray(vb2)

    # merged mask = union
    np.testing.assert_array_equal(merged_mask, (mask_a | mask_b).astype(np.int32))
    # exactly one image is foreground: its matches stay valid; the other's
    # match under the foreground object dies, its clear match survives
    a_is_fg = va2.all()
    if a_is_fg:
        assert not vb2[0] and vb2[1]
        np.testing.assert_array_equal(merged[5, 7], [50, 50, 50])
    else:
        assert not va2[0] and va2[1]
        np.testing.assert_array_equal(merged[5, 7], [200, 200, 200])
    # pixels outside both masks come from the background image
    assert merged_mask[11, 0] == 0


def test_merge_matches():
    uv1 = jnp.array([[1, 2]])
    uv2 = jnp.array([[3, 4], [5, 6]])
    uv, valid = merge_matches(uv1, jnp.array([True]), uv2, jnp.array([False, True]))
    assert uv.shape == (3, 2)
    np.testing.assert_array_equal(np.asarray(valid), [True, False, True])
