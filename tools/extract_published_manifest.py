"""One-off build tool: distill the published-pdc-dataset manifest from the
reference's shipped config corpus.

The reference maintains 40 single-object scene-list YAMLs, 4 multi-object
lists, and 36 composites by hand (``config/dense_correspondence/dataset/**``,
loaded by ``spartan_dataset_masked.py:154-222``). The scene names inside are
facts about the public pdc data release (capture timestamps); the composites
are named groupings the experiment notebooks reference verbatim
(e.g. ``caterpillar_only.yaml`` in
``experiments/caterpillar/training_caterpillar.ipynb``).

This tool reads that corpus ONCE at build time and writes
``pdc_tpu/data/published_manifest.py`` — a pure-data module pdc_tpu ships so
:mod:`pdc_tpu.data.config_gen` can regenerate the full corpus
(``config_gen --published``) for users holding the published dataset,
without pdc_tpu depending on the reference tree at runtime.

Usage (build time only; requires /root/reference):
    python tools/extract_published_manifest.py
"""

import os
import pprint
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdc_tpu.utils.yaml_io import load_yaml

REF = "/root/reference/config/dense_correspondence/dataset"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "pdc_tpu", "data", "published_manifest.py")

HEADER = '''"""Published pdc dataset manifest (GENERATED — do not edit by hand).

Scene-list and composite definitions for the publicly released pdc dataset
(data.csail.mit.edu/labelfusion/pdccompressed), distilled from the reference
config corpus by tools/extract_published_manifest.py. Scene names are capture
timestamps — facts about the public data release. Consumed by
:func:`pdc_tpu.data.config_gen.write_published_corpus`, which regenerates the
YAML corpus in the exact on-disk schema ``SpartanDataset`` (and the
reference's ``spartan_dataset_masked.py:154-222``) loads, so reference
composite names (``caterpillar_only.yaml`` etc.) work verbatim.
"""

# {filename (no .yaml): {"object_id", "logs_root_path", "train", "test",
#                        "evaluation_labeled_data_path"?}}
'''


def clean_scene_list(path):
    cfg = load_yaml(path)
    out = {
        "object_id": cfg.get("object_id", os.path.splitext(os.path.basename(path))[0]),
        "logs_root_path": cfg.get("logs_root_path", "logs_proto"),
        "train": [str(s) for s in (cfg.get("train") or [])],
        "test": [str(s) for s in (cfg.get("test") or [])],
    }
    ev = cfg.get("evaluation_labeled_data_path")
    if ev:
        out["evaluation_labeled_data_path"] = [str(p) for p in ev]
    return out


def main():
    single, multi, composites = {}, {}, {}
    for sub, store in (("single_object", single), ("multi_object", multi)):
        d = os.path.join(REF, sub)
        for name in sorted(os.listdir(d)):
            if not name.endswith(".yaml"):
                continue
            store[name[:-5]] = clean_scene_list(os.path.join(d, name))
    # special.yaml sits at the top level (background/mug-rack scenes used by
    # a few composites via "../special.yaml" relative paths)
    special_path = os.path.join(REF, "special.yaml")
    if os.path.exists(special_path):
        single["special"] = clean_scene_list(special_path)

    for name in sorted(os.listdir(os.path.join(REF, "composite"))):
        if not name.endswith(".yaml"):
            continue
        cfg = load_yaml(os.path.join(REF, "composite", name))

        def norm(entry):
            # composites reference scene lists by bare filename or a
            # relative path like "../special.yaml" — keep the stem
            return os.path.splitext(os.path.basename(str(entry)))[0]

        composites[name[:-5]] = {
            "logs_root_path": cfg.get("logs_root_path", "logs_proto"),
            "single_object": [norm(e) for e in
                              (cfg.get("single_object_scenes_config_files") or [])],
            "multi_object": [norm(e) for e in
                             (cfg.get("multi_object_scenes_config_files") or [])],
        }

    # sanity: every composite entry resolves to a known scene list. The
    # reference corpus itself has dangling entries (e.g. mugs_all.yaml lists
    # white_plastic_mug.yaml which the reference never shipped) — drop those
    # and record them so the generated corpus always loads.
    known = set(single) | set(multi)
    dangling = {}
    for cname, c in composites.items():
        for key in ("single_object", "multi_object"):
            missing = [e for e in c[key] if e not in known]
            if missing:
                dangling.setdefault(cname, []).extend(missing)
                c[key] = [e for e in c[key] if e in known]
    if dangling:
        print(f"dropped dangling scene-list refs (absent from the reference "
              f"corpus too): {dangling}")

    with open(OUT, "w") as f:
        f.write(HEADER)
        f.write("SINGLE_OBJECT_SCENE_LISTS = ")
        f.write(pprint.pformat(single, width=100, sort_dicts=True))
        f.write("\n\nMULTI_OBJECT_SCENE_LISTS = ")
        f.write(pprint.pformat(multi, width=100, sort_dicts=True))
        f.write("\n\nCOMPOSITES = ")
        f.write(pprint.pformat(composites, width=100, sort_dicts=True))
        f.write("\n\n# composite -> scene-list refs present in the reference "
                "corpus's composites but\n# absent from its shipped scene "
                "lists (dropped so every composite loads)\nDANGLING_REFS = ")
        f.write(pprint.pformat(dangling, width=100, sort_dicts=True))
        f.write("\n")
    n_scenes = len({s for v in list(single.values()) + list(multi.values())
                    for s in v["train"] + v["test"]})
    print(f"wrote {OUT}: {len(single)} single-object lists, "
          f"{len(multi)} multi-object lists, {len(composites)} composites, "
          f"{n_scenes} distinct scenes")


if __name__ == "__main__":
    main()
