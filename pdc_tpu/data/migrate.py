"""Data-layout migration — old flat scene logs to the processed/raw layout.

Rebuild of the reference's ``scripts/convert_data_to_new_format.py``: early
pdc captures kept all files directly under ``<scene>/``; the current layout
is ``<scene>/processed/`` (everything the pipeline reads) + ``<scene>/raw/``
(the ROS bag). A scene already in the new format (no top-level
``fusion_mesh.ply``) is left untouched.
"""

from __future__ import annotations

import os
import shutil
from typing import List

RAW_FILES = ("fusion.bag",)


def migrate_scene_to_new_format(folder: str, dry_run: bool = False) -> bool:
    """Migrate one scene folder in place. :return: True if migrated."""
    if not os.path.isfile(os.path.join(folder, "fusion_mesh.ply")):
        return False  # already new-format (or not a scene folder)

    move_to_processed, move_to_raw = [], []
    for name in sorted(os.listdir(folder)):
        if name in ("processed", "raw"):
            continue
        (move_to_raw if name in RAW_FILES else move_to_processed).append(name)

    if dry_run:
        return True
    processed = os.path.join(folder, "processed")
    raw = os.path.join(folder, "raw")
    os.makedirs(processed, exist_ok=True)
    os.makedirs(raw, exist_ok=True)
    for name in move_to_raw:
        shutil.move(os.path.join(folder, name), os.path.join(raw, name))
    for name in move_to_processed:
        shutil.move(os.path.join(folder, name), os.path.join(processed, name))
    return True


def migrate_logs(logs_dir: str, dry_run: bool = False) -> List[str]:
    """Migrate every old-format scene under ``logs_dir``; returns the scene
    names migrated (or that would be, with ``dry_run``)."""
    migrated = []
    for name in sorted(os.listdir(logs_dir)):
        folder = os.path.join(logs_dir, name)
        if os.path.isdir(folder) and migrate_scene_to_new_format(folder, dry_run):
            migrated.append(name)
    return migrated


if __name__ == "__main__":  # pragma: no cover
    import argparse

    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--logs_dir", required=True)
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args()
    for name in migrate_logs(args.logs_dir, dry_run=args.dry_run):
        print(("would migrate " if args.dry_run else "migrated ") + name)
