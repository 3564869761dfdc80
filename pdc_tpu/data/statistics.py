"""Dataset image statistics.

Rebuild of ``dense_correspondence_dataset_masked.py:614-690``
(``compute_image_mean_and_std_dev``): per-channel RGB mean/std over sampled
frames, used to set the normalization constants of a new dataset. Computed as
one jitted reduction per image batch instead of a python accumulation loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _moments(rgb_u8):
    x = rgb_u8.astype(jnp.float32) / 255.0  # [B, H, W, 3]
    s1 = jnp.sum(x, axis=(0, 1, 2))
    s2 = jnp.sum(jnp.square(x), axis=(0, 1, 2))
    n = x.shape[0] * x.shape[1] * x.shape[2]
    return s1, s2, n


def compute_image_mean_and_std_dev(dataset, num_images: int = 100,
                                   batch_size: int = 8):
    """:return: (mean [3], std [3]) numpy float64"""
    s1 = np.zeros(3)
    s2 = np.zeros(3)
    n = 0
    batch = []
    drawn = 0
    while drawn < num_images:
        scene_name = dataset.get_random_scene_name()
        idx = dataset.get_random_image_index(scene_name)
        rgb, _, _, _ = dataset.get_rgbd_mask_pose(scene_name, idx)
        batch.append(rgb)
        drawn += 1
        if len(batch) == batch_size or drawn == num_images:
            a, b, c = _moments(jnp.asarray(np.stack(batch)))
            s1 += np.asarray(a)
            s2 += np.asarray(b)
            n += int(c)
            batch = []
    mean = s1 / n
    var = np.maximum(s2 / n - mean**2, 0.0)
    return mean, np.sqrt(var)
