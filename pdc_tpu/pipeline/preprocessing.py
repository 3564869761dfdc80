"""Batch preprocessing orchestration — the all-logs change-detection driver.

Rebuild of ``run_change_detection_pipeline.py:27-92`` /
``batch_run_change_detection_pipeline.py``: iterate every
``<logs_dir>/<scene>/processed`` folder, skip scenes whose masks/depth are
already rendered, and regenerate ``image_masks/%06d_mask.png`` +
``rendered_images/%06d_depth.png`` (+``_depth_cropped.png``) from the fused
scene geometry — with the GL-free point-splat renderer instead of
directorPython/VTK, so one command reprocesses a dataset root on any host.

The crop box comes from a station config YAML (the reference's
``config/stations/<robot>/change_detection.yaml`` format), or is auto-fit
from the scene geometry (:func:`pdc_tpu.pipeline.change_detection.fit_crop_box`)
when no config is given — the headless counterpart of the reference's
drag-a-cube authoring flow (mesh_processing.py:32-108).
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

from pdc_tpu.pipeline.change_detection import (
    ChangeDetection,
    OrientedCropBox,
    fit_crop_box,
)
from pdc_tpu.utils.yaml_io import load_yaml, save_yaml

logger = logging.getLogger(__name__)


def already_ran_change_detection(processed_dir: str) -> bool:
    """Skip marker (reference run_change_detection_pipeline.py:72-75)."""
    return (
        os.path.isfile(os.path.join(processed_dir, "rendered_images",
                                    "000000_depth.png"))
        and os.path.isfile(os.path.join(processed_dir, "image_masks",
                                        "000000_mask.png"))
    )


def discover_processed_scenes(logs_dir: str):
    """All ``<logs_dir>/<scene>/processed`` folders, sorted. Raises on a
    scene folder without a processed/ subdir (the reference treats that as
    'need to run fusion first')."""
    scenes = []
    for name in sorted(os.listdir(logs_dir)):
        full = os.path.join(logs_dir, name)
        if not os.path.isdir(full):
            continue
        processed = os.path.join(full, "processed")
        if not os.path.isdir(processed):
            raise ValueError(f"Need to extract and run fusion on {full}")
        scenes.append(processed)
    return scenes


def _prepare_scene(processed_dir: str, crop_box=None,
                   station_config: Optional[dict] = None,
                   save_fitted_crop_box: bool = True):
    """Crop-box resolution + geometry load for one scene."""
    if crop_box is None and station_config is not None:
        crop_box = OrientedCropBox.from_station_config(station_config)
    cd, structure = ChangeDetection.from_data_folder(processed_dir)
    if crop_box is None:
        crop_box = fit_crop_box(cd.points)
        logger.info("fitted crop box for %s: dims=%s", processed_dir,
                    crop_box.dimensions)
        if save_fitted_crop_box:
            save_yaml(crop_box.to_station_config(),
                      os.path.join(processed_dir, "crop_box.yaml"))
    cd.set_crop_box(crop_box)
    return cd, structure


def run_change_detection_on_scene(processed_dir: str,
                                  crop_box=None,
                                  station_config: Optional[dict] = None,
                                  render_full_depth: bool = True,
                                  save_fitted_crop_box: bool = True):
    """One scene: crop-box resolution -> masks -> (optionally) full-scene
    depth re-render. Returns the number of frames written."""
    cd, structure = _prepare_scene(processed_dir, crop_box, station_config,
                                   save_fitted_crop_box)
    # one fused device dispatch per scene (masks + cropped depth + full
    # depth, device-side uint8/uint16 encoding); falls back to the two-pass
    # flow for pair-strategy / point-splat scenes
    return cd.process_scene(structure, render_full_depth=render_full_depth)


def run_change_detection_pipeline(logs_dir: str,
                                  station_config_file: Optional[str] = None,
                                  redo: bool = False,
                                  render_full_depth: bool = True) -> dict:
    """The all-logs driver, software-pipelined one scene deep: scene i's
    device render + device->host transfer overlap scene i+1's host work
    (geometry load, crop fit, raster prep) and scene i-1's PNG encode —
    jax dispatch is asynchronous, so
    ``ChangeDetection.process_scene_start`` returns as soon as the fused
    per-scene program is enqueued. Returns {scene_processed_dir:
    frames_written} (skipped scenes map to 0)."""
    station_config = (load_yaml(station_config_file)
                      if station_config_file else None)
    results = {}
    pending = None  # (processed_dir, cd, handle) dispatched but not fetched

    def finish(item):
        processed, cd, handle = item
        results[processed] = cd.process_scene_finish(handle)
        logger.info("processed %s: %d frames", processed, results[processed])

    for processed in discover_processed_scenes(logs_dir):
        if not redo and already_ran_change_detection(processed):
            logger.info("already ran change detection for %s", processed)
            results[processed] = 0
            continue
        cd, structure = _prepare_scene(processed,
                                       station_config=station_config)
        handle = cd.process_scene_start(structure,
                                        render_full_depth=render_full_depth)
        if handle is None or handle is cd.OVER_BUDGET:
            # two-pass fallback runs synchronously; go straight there —
            # re-entering process_scene would repeat process_scene_start's
            # full per-pose host prep on exactly the heaviest scenes
            if pending is not None:
                finish(pending)
                pending = None
            results[processed] = cd.process_scene_two_pass(
                structure, render_full_depth=render_full_depth)
            logger.info("processed %s: %d frames", processed,
                        results[processed])
            continue
        if pending is not None:
            finish(pending)
        pending = (processed, cd, handle)
    if pending is not None:
        finish(pending)
    return results


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Regenerate object masks + rendered depth for every "
                    "scene log under a dataset root (GL-free).")
    parser.add_argument("--data_dir", type=str, default=os.getcwd(),
                        help="logs root (e.g. pdc/logs_proto)")
    parser.add_argument("--config_file", type=str, default=None,
                        help="station change_detection.yaml with the crop "
                             "box; auto-fit per scene when omitted")
    parser.add_argument("--redo", action="store_true",
                        help="reprocess scenes that already have masks")
    parser.add_argument("--no_depth", action="store_true",
                        help="skip full-scene depth re-rendering")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    results = run_change_detection_pipeline(
        args.data_dir, station_config_file=args.config_file,
        redo=args.redo, render_full_depth=not args.no_depth)
    done = sum(1 for v in results.values() if v > 0)
    print(f"processed {done} scenes ({len(results) - done} already done)")


if __name__ == "__main__":
    main()
