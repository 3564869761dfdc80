"""Descriptor-video maker — render every frame of a scene through a trained
network and assemble RGB / descriptor-RGB videos.

Rebuild of the reference's ``evaluation/make_video.ipynb`` workflow: for each
frame of a log, forward the RGB image, normalize the descriptor image to RGB
with the network's ``descriptor_image_stats`` (so colors are consistent
across frames), write ``%06d_res.png`` (and ``_res_masked.png`` when masks
are available), then assemble mp4s with ffmpeg.

TPU redesign: frames go through one batched jitted forward (not a
frame-at-a-time host loop), and normalization happens on the stacked batch.
ffmpeg is optional — absent, the PNG frame directory is the artifact.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np


def _write_png(path: str, arr_u8):
    try:
        from PIL import Image

        Image.fromarray(arr_u8).save(path)
    except ImportError:  # pragma: no cover - PIL is in the baked image
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.imsave(path, arr_u8)


def make_descriptor_images(dcn, scene, save_images_dir: str,
                           batch_size: int = 8, masked: bool = False):
    """Forward every frame of ``scene``; write ``%06d_rgb.png`` +
    ``%06d_res.png`` (+ ``_res_masked.png``) under ``save_images_dir``.

    :param scene: a :class:`pdc_tpu.data.dataset.SceneData`
    :return: number of frames written
    """
    from pdc_tpu.evaluation.plotting import normalize_descriptor

    os.makedirs(save_images_dir, exist_ok=True)
    stats = None
    try:
        stats = dcn.descriptor_image_stats
    except (FileNotFoundError, OSError, KeyError):
        pass

    mean = jnp.asarray(dcn.image_mean, jnp.float32)
    std = jnp.asarray(dcn.image_std_dev, jnp.float32)

    @jax.jit
    def fwd(variables, rgb_u8):
        x = rgb_u8.astype(jnp.float32) / 255.0
        x = (x - mean) / std
        return dcn.module.apply(variables, x, train=False).astype(jnp.float32)

    n = scene.num_frames
    for start in range(0, n, batch_size):
        idxs = list(range(start, min(start + batch_size, n)))
        batch = scene.rgb[idxs[0]: idxs[-1] + 1]
        if batch.shape[0] < batch_size:  # keep one compiled shape
            pad = np.repeat(batch[-1:], batch_size - batch.shape[0], axis=0)
            batch = np.concatenate([batch, pad], axis=0)
        res = np.asarray(fwd(dcn.variables, jnp.asarray(batch)))
        for j, idx in enumerate(idxs):
            rgb = np.asarray(scene.rgb[idx])
            _write_png(os.path.join(save_images_dir, "%06d_rgb.png" % idx), rgb)
            res_norm = normalize_descriptor(
                res[j], stats.get("mask_image") if stats else None)
            res_u8 = (np.clip(res_norm, 0, 1) * 255).astype(np.uint8)
            _write_png(os.path.join(save_images_dir, "%06d_res.png" % idx),
                       res_u8)
            if masked and scene.mask is not None:
                m = (np.asarray(scene.mask[idx]) > 0)[..., None]
                _write_png(
                    os.path.join(save_images_dir, "%06d_res_masked.png" % idx),
                    (res_u8 * m).astype(np.uint8))
    return n


def make_videos(save_images_dir: str, videos_dir: str, log_name: str,
                framerate: int = 30, masked: bool = False):
    """Assemble mp4s from the frame directory with ffmpeg (skipped, with the
    frame directory kept as the artifact, when ffmpeg is unavailable).

    :return: list of video paths written
    """
    if shutil.which("ffmpeg") is None:
        return []
    os.makedirs(videos_dir, exist_ok=True)
    written = []
    suffixes = [("rgb", "_video_rgb.mp4"), ("res", "_video_descriptors.mp4")]
    if masked:
        suffixes.append(("res_masked", "_video_descriptors_masked.mp4"))
    for frame_kind, video_suffix in suffixes:
        out = os.path.join(videos_dir, log_name + video_suffix)
        cmd = ["ffmpeg", "-y", "-framerate", str(framerate),
               "-i", os.path.join(save_images_dir, f"%06d_{frame_kind}.png"),
               "-c:v", "libx264", "-pix_fmt", "yuv420p", "-r", str(framerate),
               out]
        proc = subprocess.run(cmd, capture_output=True)
        if proc.returncode == 0:
            written.append(out)
    return written


def run(model_folder: str, dataset, scene_names=None, output_dir: str = None,
        batch_size: int = 8, masked: bool = False, framerate: int = 30):
    from pdc_tpu.models.dcn import DenseCorrespondenceNetwork

    dcn = DenseCorrespondenceNetwork.from_model_folder(model_folder)
    output_dir = output_dir or "descriptor_videos_out"
    scene_names = scene_names or sorted(dataset.scenes.keys())
    results = {}
    for name in scene_names:
        scene = dataset.scenes[name]
        save_images_dir = os.path.join(output_dir, name, "video_images")
        n = make_descriptor_images(dcn, scene, save_images_dir,
                                   batch_size=batch_size, masked=masked)
        videos = make_videos(save_images_dir,
                             os.path.join(output_dir, name, "videos"),
                             name, framerate=framerate, masked=masked)
        results[name] = {"frames": n, "videos": videos}
    return results


if __name__ == "__main__":  # pragma: no cover
    p = argparse.ArgumentParser()
    p.add_argument("--model_folder", required=True)
    p.add_argument("--config", required=True, help="composite dataset yaml")
    p.add_argument("--data_dir", default=os.environ.get("DC_DATA_DIR", "."))
    p.add_argument("--output_dir", default="descriptor_videos_out")
    p.add_argument("--scenes", default=None, help="comma-separated scene names")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--masked", action="store_true")
    p.add_argument("--framerate", type=int, default=30)
    args = p.parse_args()

    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.utils.yaml_io import load_yaml

    ds = SpartanDataset(config=load_yaml(args.config), data_dir=args.data_dir,
                        config_dir=os.path.dirname(args.config))
    scenes = args.scenes.split(",") if args.scenes else None
    out = run(args.model_folder, ds, scene_names=scenes,
              output_dir=args.output_dir, batch_size=args.batch_size,
              masked=args.masked, framerate=args.framerate)
    for name, info in out.items():
        print(name, info["frames"], "frames", len(info["videos"]), "videos")
