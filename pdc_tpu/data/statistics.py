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


def main(argv=None):  # pragma: no cover - thin CLI
    """CLI analog of the reference's ``compute_dataset_img_mean.ipynb``:
    print the per-channel RGB mean/std of a dataset (the values to put in a
    new dataset's normalization config)."""
    import argparse
    import os

    import yaml

    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.utils.yaml_io import load_yaml

    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True, help="composite dataset yaml")
    p.add_argument("--data_dir", default=os.environ.get("DC_DATA_DIR", "."))
    p.add_argument("--num_images", type=int, default=100)
    args = p.parse_args(argv)

    ds = SpartanDataset(config=load_yaml(args.config), data_dir=args.data_dir,
                        config_dir=os.path.dirname(args.config))
    mean, std = compute_image_mean_and_std_dev(ds, num_images=args.num_images)
    print(yaml.safe_dump({"image_normalization": {
        "mean": [round(float(m), 6) for m in mean],
        "std_dev": [round(float(s), 6) for s in std],
    }}))


if __name__ == "__main__":  # pragma: no cover
    main()
