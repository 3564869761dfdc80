"""pdc dataset downloader.

Rebuild of ``config/download_pdc_data.py:1-99``: given a composite dataset
YAML, download the per-scene tarballs from data.csail.mit.edu and unpack them
into the pdc ``logs_proto`` layout. Network access is gated — in air-gapped
environments this degrades to listing what would be fetched.
"""

from __future__ import annotations

import os
import tarfile
import urllib.request
from typing import List, Optional

from pdc_tpu.utils.yaml_io import load_yaml

BASE_URL = "https://data.csail.mit.edu/labelfusion/pdccompressed/"


def scene_urls_from_composite_config(config: dict, config_dir: Optional[str] = None) -> List[str]:
    """Expand a composite dataset config into per-scene tarball URLs."""
    urls = []
    for key in ("single_object_scenes_config_files", "multi_object_scenes_config_files"):
        for f in config.get(key, []):
            from pdc_tpu.data.config_gen import resolve_scene_list_path

            sc = load_yaml(resolve_scene_list_path(f, config_dir))
            for split in ("train", "test"):
                for scene in sc.get(split, []):
                    urls.append(BASE_URL + "logs_proto_compressed/" + scene + ".tar.gz")
    return sorted(set(urls))


def download_pdc_data(composite_config_file: str, data_dir: str,
                      dry_run: bool = False) -> List[str]:
    """Fetch + extract every scene of a composite config under
    ``<data_dir>/logs_proto``. Returns the list of scene URLs handled."""
    config = load_yaml(composite_config_file)
    urls = scene_urls_from_composite_config(
        config, config_dir=os.path.dirname(composite_config_file)
    )
    logs_dir = os.path.join(data_dir, "logs_proto")
    os.makedirs(logs_dir, exist_ok=True)
    for url in urls:
        scene = os.path.basename(url).replace(".tar.gz", "")
        dest = os.path.join(logs_dir, scene)
        if os.path.isdir(dest):
            continue
        if dry_run:
            print("would fetch", url)
            continue
        tar_path = dest + ".tar.gz"
        urllib.request.urlretrieve(url, tar_path)  # noqa: S310 - public dataset
        with tarfile.open(tar_path) as tf:
            tf.extractall(logs_dir)
        os.remove(tar_path)
    return urls


if __name__ == "__main__":  # pragma: no cover
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--data_dir", default=os.environ.get("DC_DATA_DIR", "."))
    p.add_argument("--dry_run", action="store_true")
    args = p.parse_args()
    download_pdc_data(args.config, args.data_dir, dry_run=args.dry_run)
