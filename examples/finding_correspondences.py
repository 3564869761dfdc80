"""Finding-correspondences demo — script equivalent of the reference's
``correspondence_tools/pytorch-finding-correspondences.ipynb``: sample an
image pair from a dataset, find pixel correspondences on device, plot them,
time a large-attempt batch, then sample and plot non-correspondences.

Where the notebook times CPU-vs-GPU torch loops, this times ONE jitted TPU
dispatch at ``--num_attempts_timed`` candidates (static shapes; the valid
count is fetched, which is what actually synchronizes through a remote
runtime). The notebook's "about 1/10 get pruned" observation maps to the
``valid`` mask — pdc_tpu keeps every candidate at a static shape and marks
the three prune reasons instead of shrinking the array.

Usage (synthetic dataset, no pdc download needed):
    python examples/finding_correspondences.py --output_dir /tmp/corr_demo
Real data:
    python examples/finding_correspondences.py \
        --config configs/dataset/composite/caterpillar_only.yaml \
        --data_dir /path/to/pdc
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", help="composite dataset yaml (real data)")
    p.add_argument("--data_dir", default=os.environ.get("DC_DATA_DIR", "."))
    p.add_argument("--scene", help="scene name (default: first in dataset)")
    p.add_argument("--num_attempts", type=int, default=50,
                   help="candidates for the plotted pair")
    p.add_argument("--num_attempts_timed", type=int, default=50000,
                   help="candidates for the timing measurement")
    p.add_argument("--num_non_matches_per_match", type=int, default=10)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--height", type=int, default=96)
    p.add_argument("--output_dir", default="/tmp/finding_correspondences")
    p.add_argument("--seed", type=int, default=1)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.ops.correspondence import (create_non_correspondences,
                                            find_pixel_correspondences)
    from pdc_tpu.ops.plotter import plot_correspondences_direct
    from pdc_tpu.utils.yaml_io import load_yaml

    if args.config:
        dataset = SpartanDataset(
            config=load_yaml(args.config), data_dir=args.data_dir,
            config_dir=os.path.dirname(args.config))
    else:
        dataset = SpartanDataset.make_synthetic(
            num_scenes=2, width=args.width, height=args.height,
            num_frames=12)
    dataset.reset_seed(args.seed)

    scene = args.scene or sorted(dataset.scenes)[0]
    idx_a = dataset.get_random_image_index(scene)
    rgb_a, depth_a, mask_a, pose_a = dataset.get_rgbd_mask_pose(scene, idx_a)
    idx_b = dataset.get_img_idx_with_different_pose(scene, pose_a,
                                                    num_attempts=50)
    if idx_b is None:
        raise SystemExit(
            f"scene {scene!r}: no frame with a sufficiently different pose "
            f"from frame {idx_a} after 50 attempts (near-static camera?); "
            "try --scene or a different --seed")
    rgb_b, depth_b, mask_b, pose_b = dataset.get_rgbd_mask_pose(scene, idx_b)
    K = dataset.get_camera_intrinsics(scene).K

    os.makedirs(args.output_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    k_plot, k_timed, k_nm = jax.random.split(key, 3)

    # -- small batch, plotted (notebook cell 2) -----------------------------
    uv_a, uv_b, valid = find_pixel_correspondences(
        jnp.asarray(np.asarray(depth_a)), jnp.asarray(pose_a),
        jnp.asarray(np.asarray(depth_b)), jnp.asarray(pose_b),
        jnp.asarray(K), k_plot, num_attempts=args.num_attempts,
        mask_a=jnp.asarray(np.asarray(mask_a)))
    valid_np = np.asarray(valid)
    plot_path = os.path.join(args.output_dir, "correspondences.png")
    plot_correspondences_direct(
        np.asarray(rgb_a), np.asarray(depth_a), np.asarray(rgb_b),
        np.asarray(depth_b), np.asarray(uv_a)[valid_np],
        np.asarray(uv_b)[valid_np], show=False, save_path=plot_path)

    # -- large batch, timed (notebook cells 3-4) ----------------------------
    finder = jax.jit(lambda k: find_pixel_correspondences(
        jnp.asarray(np.asarray(depth_a)), jnp.asarray(pose_a),
        jnp.asarray(np.asarray(depth_b)), jnp.asarray(pose_b),
        jnp.asarray(K), k, num_attempts=args.num_attempts_timed,
        mask_a=jnp.asarray(np.asarray(mask_a)))[2].sum())
    n_valid = int(finder(k_timed))  # compile + warm
    t0 = time.time()
    n_valid = int(finder(jax.random.fold_in(k_timed, 1)))
    dt = time.time() - t0

    # -- non-correspondences, plotted (notebook cells 6-7) ------------------
    uv_b_matches = np.asarray(uv_b)[valid_np]
    uv_b_nm = create_non_correspondences(
        k_nm, jnp.asarray(uv_b_matches), np.asarray(depth_b).shape,
        num_non_matches_per_match=args.num_non_matches_per_match,
        mask_b=jnp.asarray(np.asarray(mask_b)))
    uv_a_rep = np.repeat(np.asarray(uv_a)[valid_np],
                         args.num_non_matches_per_match, axis=0)
    nm_path = os.path.join(args.output_dir, "non_correspondences.png")
    plot_correspondences_direct(
        np.asarray(rgb_a), np.asarray(depth_a), np.asarray(rgb_b),
        np.asarray(depth_b), uv_a_rep,
        np.asarray(uv_b_nm).reshape(-1, 2), circ_color="r", show=False,
        save_path=nm_path)

    summary = {
        "scene": scene,
        "pair": [int(idx_a), int(idx_b)],
        "num_attempted": args.num_attempts,
        "num_valid": int(valid_np.sum()),
        "timed_attempts": args.num_attempts_timed,
        "timed_valid": n_valid,
        "timed_seconds": round(dt, 4),
        "attempts_per_second": round(args.num_attempts_timed / max(dt, 1e-9)),
        "plots": [plot_path, nm_path],
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
