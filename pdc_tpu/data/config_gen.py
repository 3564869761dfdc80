"""Dataset-config generator — build the scene-list / composite YAML corpus
from a pdc data root.

The reference ships 85 hand-maintained config YAMLs (37 single-object scene
lists + 35 composites, ``config/dense_correspondence/dataset/**``) keyed to
its published dataset. pdc_tpu generates them instead: point this module at
any data root laid out as ``<data_dir>/logs_proto/<scene>/processed/`` and it
discovers the scenes, validates their layout, groups them into objects, holds
out a test split, and writes

    <out_dir>/single_object/<object_id>.yaml     (train/test scene lists)
    <out_dir>/composite/<name>.yaml              (composite referencing them)

in exactly the format ``SpartanDataset`` (and the reference's
``spartan_dataset_masked.py:154-222``) consumes — so users build a working
config corpus for their own captures with one command instead of maintaining
it by hand.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, List, Optional

from pdc_tpu.utils.yaml_io import load_yaml, save_yaml


def discover_scenes(data_dir: str, logs_root: str = "logs_proto") -> List[str]:
    """Scene names under ``<data_dir>/<logs_root>`` with a valid processed
    layout (images + pose data; depth/mask dirs reported but not required —
    they can be produced later by the change-detection pipeline)."""
    logs_dir = os.path.join(data_dir, logs_root)
    if not os.path.isdir(logs_dir):
        raise FileNotFoundError(f"no {logs_root} directory under {data_dir}")
    scenes = []
    for name in sorted(os.listdir(logs_dir)):
        processed = os.path.join(logs_dir, name, "processed")
        images = os.path.join(processed, "images")
        if not os.path.isdir(images):
            continue
        if not os.path.exists(os.path.join(images, "pose_data.yaml")):
            continue
        if not any(f.endswith("_rgb.png") for f in os.listdir(images)):
            continue
        scenes.append(name)
    return scenes


def group_scenes_by_object(scene_names: List[str],
                           object_of: Optional[Dict[str, str]] = None,
                           default_object_id: str = "object",
                           ) -> Dict[str, List[str]]:
    """Group scene names into object ids. ``object_of`` maps scene name (or
    a scene-name prefix) to object id; unmatched scenes fall into
    ``default_object_id``."""
    groups: Dict[str, List[str]] = {}
    for name in scene_names:
        oid = default_object_id
        if object_of:
            if name in object_of:
                oid = object_of[name]
            else:
                for prefix, o in object_of.items():
                    if name.startswith(prefix):
                        oid = o
                        break
        groups.setdefault(oid, []).append(name)
    return groups


def make_scene_list_config(object_id: str, scene_names: List[str],
                           test_fraction: float = 0.2, min_test: int = 1,
                           logs_root: str = "logs_proto",
                           evaluation_labeled_data_path: Optional[list] = None,
                           ) -> dict:
    """One single-object scene-list config (the reference's
    ``single_object/<object>.yaml`` schema). The LAST ceil(test_fraction*N)
    scenes become the test split (deterministic: scene names are already
    sorted by capture timestamp in the pdc naming scheme)."""
    n = len(scene_names)
    n_test = min(max(min_test, round(test_fraction * n)), max(n - 1, 0))
    cfg = {
        "logs_root_path": logs_root,
        "object_id": object_id,
        "train": list(scene_names[: n - n_test]),
        "test": list(scene_names[n - n_test:]),
    }
    if evaluation_labeled_data_path:
        cfg["evaluation_labeled_data_path"] = list(evaluation_labeled_data_path)
    return cfg


def generate_dataset_configs(data_dir: str, out_dir: str,
                             composite_name: str = "generated_dataset",
                             object_of: Optional[Dict[str, str]] = None,
                             test_fraction: float = 0.2,
                             logs_root: str = "logs_proto",
                             multi_object_ids: Optional[List[str]] = None,
                             ) -> dict:
    """Discover scenes, write the scene-list + composite YAML corpus.

    :param object_of: scene-name (or prefix) -> object id map; one object
        when omitted
    :param multi_object_ids: object ids whose scene lists are multi-object
        captures (listed under ``multi_object_scenes_config_files``)
    :return: {"composite": path, "single_object": {object_id: path},
              "multi_object": {object_id: path}, "num_scenes": N}
    """
    scenes = discover_scenes(data_dir, logs_root)
    if not scenes:
        raise ValueError(f"no valid scenes under {data_dir}/{logs_root}")
    groups = group_scenes_by_object(scenes, object_of)
    multi_ids = set(multi_object_ids or [])

    single_dir = os.path.join(out_dir, "single_object")
    multi_dir = os.path.join(out_dir, "multi_object")
    composite_dir = os.path.join(out_dir, "composite")
    result = {"single_object": {}, "multi_object": {}, "num_scenes": len(scenes)}
    single_files, multi_files = [], []
    for oid, names in sorted(groups.items()):
        cfg = make_scene_list_config(oid, names, test_fraction=test_fraction,
                                     logs_root=logs_root)
        sub, files, key = (
            (multi_dir, multi_files, "multi_object") if oid in multi_ids
            else (single_dir, single_files, "single_object"))
        os.makedirs(sub, exist_ok=True)
        path = os.path.join(sub, f"{oid}.yaml")
        save_yaml(cfg, path)
        result[key][oid] = path
        files.append(os.path.relpath(path, out_dir))

    composite = {
        "logs_root_path": logs_root,
        "single_object_scenes_config_files": single_files,
        "multi_object_scenes_config_files": multi_files,
    }
    os.makedirs(composite_dir, exist_ok=True)
    composite_path = os.path.join(composite_dir, f"{composite_name}.yaml")
    save_yaml(composite, composite_path)
    result["composite"] = composite_path
    return result


def write_published_corpus(out_dir: str) -> dict:
    """Write the config corpus for the PUBLISHED pdc dataset from the
    shipped manifest (:mod:`pdc_tpu.data.published_manifest`): every
    single-object / multi-object scene list and every composite the
    reference's experiment notebooks load by name
    (``caterpillar_only.yaml``, ``shoe_train_all_shoes.yaml``, ...), in the
    exact schema ``SpartanDataset`` consumes. Users holding the published
    dataset get a verbatim-compatible corpus; users with their own captures
    use :func:`generate_dataset_configs` instead.

    :return: {"single_object": N, "multi_object": N, "composite": N,
              "out_dir": out_dir}
    """
    from pdc_tpu.data.published_manifest import (
        COMPOSITES,
        MULTI_OBJECT_SCENE_LISTS,
        SINGLE_OBJECT_SCENE_LISTS,
    )

    def write_scene_lists(lists: dict, sub: str):
        d = os.path.join(out_dir, sub)
        os.makedirs(d, exist_ok=True)
        for name, spec in lists.items():
            cfg = {
                "logs_root_path": spec["logs_root_path"],
                "object_id": spec["object_id"],
                "train": list(spec["train"]),
                "test": list(spec["test"]),
            }
            if spec.get("evaluation_labeled_data_path"):
                cfg["evaluation_labeled_data_path"] = list(
                    spec["evaluation_labeled_data_path"])
            save_yaml(cfg, os.path.join(d, f"{name}.yaml"))

    write_scene_lists(SINGLE_OBJECT_SCENE_LISTS, "single_object")
    write_scene_lists(MULTI_OBJECT_SCENE_LISTS, "multi_object")

    comp_dir = os.path.join(out_dir, "composite")
    os.makedirs(comp_dir, exist_ok=True)
    for name, spec in COMPOSITES.items():
        cfg = {
            "logs_root_path": spec["logs_root_path"],
            "single_object_scenes_config_files":
                [f"{e}.yaml" for e in spec["single_object"]],
            "multi_object_scenes_config_files":
                [f"{e}.yaml" for e in spec["multi_object"]],
        }
        save_yaml(cfg, os.path.join(comp_dir, f"{name}.yaml"))
    return {"single_object": len(SINGLE_OBJECT_SCENE_LISTS),
            "multi_object": len(MULTI_OBJECT_SCENE_LISTS),
            "composite": len(COMPOSITES), "out_dir": out_dir}


def resolve_scene_list_path(scene_cfg_file: str, config_dir: Optional[str]) -> str:
    """Resolve a scene-list reference from a composite config to a path.

    Composites in the published corpus name their scene lists bare
    (``caterpillar_17_scenes.yaml``) and the lists live in ``single_object/``
    / ``multi_object/`` siblings of ``composite/`` under the corpus root
    (reference ``spartan_dataset_masked.py:165-176`` resolves against the
    corpus root; older hand-written composites use explicit relative paths).
    Resolution order: absolute as-is; then — when ``config_dir`` points at
    the ``composite/`` subdir — the corpus ``single_object/`` +
    ``multi_object/`` siblings and the corpus root; then ``config_dir``
    itself LAST. The subdirs must come first: several published composites
    (baymax_1_train, caterpillar_upright, ...) reference a scene list with
    the SAME filename as the composite, and resolving against ``composite/``
    first would return the composite itself — whose train list is empty —
    silently yielding a zero-scene dataset. Returns the first existing
    candidate (or the ``config_dir`` join when none exists, so the caller's
    error names the natural path)."""
    if config_dir is None or os.path.isabs(scene_cfg_file):
        return scene_cfg_file
    root = os.path.dirname(config_dir.rstrip(os.sep))
    candidates = [
        os.path.join(root, "single_object", scene_cfg_file),
        os.path.join(root, "multi_object", scene_cfg_file),
        os.path.join(root, scene_cfg_file),
        os.path.join(config_dir, scene_cfg_file),
    ]
    return next((c for c in candidates if os.path.exists(c)), candidates[-1])


def scene_names_in_composite(composite: dict, config_dir: str) -> List[str]:
    """All scene names (train + test, single + multi object) referenced by a
    composite dataset config, without loading any frames."""
    names: List[str] = []
    for key in ("single_object_scenes_config_files",
                "multi_object_scenes_config_files"):
        for f in composite.get(key, []):
            path = resolve_scene_list_path(f, config_dir)
            sc = load_yaml(path)
            for split in ("train", "test"):
                names.extend(sc.get(split, []))
            names.extend(sc.get("scenes", []))
    seen, out = set(), []
    for n in names:
        if n not in seen:
            seen.add(n)
            out.append(n)
    return out


def copy_dataset_scenes(composite: dict, config_dir: str, data_dir: str,
                        target_dir: str, dry_run: bool = False) -> List[str]:
    """Copy every scene a composite config references into ``target_dir``
    (the reference's ``scripts/dataset_copy_util.ipynb`` workflow: extract a
    dataset subset — e.g. all shoe logs — into its own directory tree).
    Existing destinations are skipped; returns the scene names copied."""
    import shutil

    logs_root = composite.get("logs_root_path", "logs_proto")
    copied = []
    for name in scene_names_in_composite(composite, config_dir):
        src = os.path.join(data_dir, logs_root, name)
        dst = os.path.join(target_dir, logs_root, name)
        if not os.path.isdir(src):
            raise FileNotFoundError(src)
        if os.path.exists(dst):
            continue
        if not dry_run:
            shutil.copytree(src, dst)
        copied.append(name)
    return copied


def main(argv=None):  # pragma: no cover - thin CLI over the above
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--published", action="store_true",
                   help="write the corpus for the PUBLISHED pdc dataset "
                        "from the shipped manifest (no data_dir needed)")
    p.add_argument("--data_dir", default=None,
                   help="pdc data root (holds logs_proto/)")
    p.add_argument("--out_dir", required=True,
                   help="where to write single_object/ + composite/ YAMLs")
    p.add_argument("--name", default="generated_dataset",
                   help="composite config name")
    p.add_argument("--objects", default=None,
                   help="YAML file mapping scene-name prefix -> object id")
    p.add_argument("--multi_object_ids", default=None,
                   help="comma-separated object ids that are multi-object captures")
    p.add_argument("--test_fraction", type=float, default=0.2)
    p.add_argument("--logs_root", default="logs_proto")
    args = p.parse_args(argv)

    if args.published:
        res = write_published_corpus(args.out_dir)
        print(f"published corpus -> {res['out_dir']}: "
              f"{res['single_object']} single-object + "
              f"{res['multi_object']} multi-object scene lists, "
              f"{res['composite']} composites")
        return
    if args.data_dir is None:
        p.error("--data_dir is required unless --published is given")

    object_of = load_yaml(args.objects) if args.objects else None
    multi = args.multi_object_ids.split(",") if args.multi_object_ids else None
    res = generate_dataset_configs(
        args.data_dir, args.out_dir, composite_name=args.name,
        object_of=object_of, test_fraction=args.test_fraction,
        logs_root=args.logs_root, multi_object_ids=multi)
    print(f"{res['num_scenes']} scenes -> {res['composite']}")
    for oid, path in {**res["single_object"], **res["multi_object"]}.items():
        print(f"  {oid}: {path}")


if __name__ == "__main__":  # pragma: no cover
    main()
