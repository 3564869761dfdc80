"""Reference-config compatibility: a verbatim-shaped reference training.yaml
dict (same keys/values as the CoRL-2018 release) must drive every consumer —
dataset parameter injection, assembler, loss config, optimizer, network
factory — without modification."""

import jax
import numpy as np

REFERENCE_STYLE_CONFIG = {
    "training": {
        "learning_rate": 1.0e-4,
        "learning_rate_decay": 0.9,
        "steps_between_learning_rate_decay": 250,
        "weight_decay": 1.0e-4,
        "num_iterations": 3500,
        "num_workers": 5,
        "compute_test_loss": False,
        "compute_test_loss_rate": 500,
        "test_loss_num_iterations": 50,
        "garbage_collect_rate": 1,
        "batch_size": 1,
        "domain_randomize": True,
        "num_matching_attempts": 10000,
        "sample_matches_only_off_mask": True,
        "num_non_matches_per_match": 150,
        "fraction_masked_non_matches": 0.5,
        "fraction_background_non_matches": 0.5,
        "use_image_b_mask_inv": True,
        "cross_scene_num_samples": 10000,
        "data_type_probabilities": {
            "SINGLE_OBJECT_WITHIN_SCENE": 1,
            "SINGLE_OBJECT_ACROSS_SCENE": 0,
            "DIFFERENT_OBJECT": 0,
            "MULTI_OBJECT": 0,
            "SYNTHETIC_MULTI_OBJECT": 0,
        },
        "loss_function": "pixelwise_contrastive_loss",
        "logging_rate": 100,
        "save_rate": 1000,
        "logging_dir_name": "test",
        "logging_dir": "trained_models",
    },
    "dense_correspondence_network": {
        "descriptor_dimension": 3,
        "image_width": 640,
        "image_height": 480,
        "normalize": False,
        "backbone": {"model_class": "Resnet", "resnet_name": "Resnet34_8s"},
    },
    "loss_function": {
        "M_masked": 0.5,
        "M_background": 0.5,
        "M_pixel": 50,
        "match_loss_weight": 1.0,
        "non_match_loss_weight": 1.0,
        "use_l2_pixel_loss_on_masked_non_matches": False,
        "use_l2_pixel_loss_on_background_non_matches": False,
        "scale_by_hard_negatives": True,
        "scale_by_hard_negatives_DIFFERENT_OBJECT": True,
        "alpha_triplet": 0.1,
    },
}


def test_dataset_parameter_injection():
    from pdc_tpu.data.dataset import SpartanDataset

    ds = SpartanDataset.make_synthetic(num_scenes=1, width=32, height=32, num_frames=4)
    ds.set_parameters_from_training_config(REFERENCE_STYLE_CONFIG)
    assert ds.num_matching_attempts == 10000
    assert ds.num_masked_non_matches_per_match == 75
    assert ds.num_background_non_matches_per_match == 75
    assert ds.sample_matches_only_off_mask is True
    assert ds._use_image_b_mask_inv is True
    assert ds._domain_randomize is True
    assert ds._data_type_probabilities == {0: 1.0}


def test_assembler_config_from_reference():
    from pdc_tpu.data.assembler import AssemblerConfig

    cfg = AssemblerConfig.from_training_config(REFERENCE_STYLE_CONFIG)
    assert cfg.num_matching_attempts == 10000
    assert cfg.num_masked_non_matches_per_match == 75
    assert cfg.num_background_non_matches_per_match == 75
    assert cfg.enable_synthetic_multi_object is False
    assert cfg.domain_randomize is True


def test_loss_config_from_reference():
    from pdc_tpu.losses.pixelwise_contrastive import LossConfig

    cfg = LossConfig.from_dict(REFERENCE_STYLE_CONFIG["loss_function"])
    assert cfg.M_masked == 0.5
    assert cfg.M_pixel == 50
    assert cfg.scale_by_hard_negatives is True
    assert cfg.alpha_triplet == 0.1


def test_network_factory_from_reference():
    from pdc_tpu.models.dcn import build_backbone

    model = build_backbone(REFERENCE_STYLE_CONFIG["dense_correspondence_network"])
    assert model.stage_sizes == (3, 4, 6, 3)  # ResNet-34
    assert model.output_stride == 8


def test_optimizer_and_schedule_from_reference():
    import optax

    from pdc_tpu.training.schedule import host_lr
    from pdc_tpu.training.train import make_optimizer

    tx = make_optimizer(REFERENCE_STYLE_CONFIG)
    params = {"w": jax.numpy.ones((3,))}
    state = tx.init(params)
    updates, _ = tx.update({"w": jax.numpy.ones((3,))}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()

    # 0.9 decay every 250 steps
    assert host_lr(REFERENCE_STYLE_CONFIG, 0) == 1e-4
    assert abs(host_lr(REFERENCE_STYLE_CONFIG, 250) - 0.9e-4) < 1e-12
    assert abs(host_lr(REFERENCE_STYLE_CONFIG, 999) - 0.9**3 * 1e-4) < 1e-12


# -- published config corpus (configs/dataset/**, VERDICT r3 item 4) ---------------


def test_published_corpus_integrity():
    """Every committed composite loads, and every scene list it references
    exists with a valid train/test schema — so a user holding the published
    pdc dataset can pass reference composite names verbatim."""
    import os

    from pdc_tpu.utils.yaml_io import load_yaml

    root = os.path.join(os.path.dirname(__file__), "..", "configs", "dataset")
    comp_dir = os.path.join(root, "composite")
    composites = sorted(f for f in os.listdir(comp_dir) if f.endswith(".yaml"))
    assert len(composites) >= 36, composites
    # the names the reference experiment notebooks load verbatim
    for required in ("caterpillar_only.yaml", "shoe_train_all_shoes.yaml",
                     "caterpillar_upright.yaml", "baymax_front_only.yaml",
                     "star_bot_front_only.yaml", "hat_train_6.yaml",
                     "mugs_all.yaml", "entire_dataset.yaml",
                     "caterpillar_baymax_starbot_all_front_single_only.yaml"):
        assert required in composites, required

    for name in composites:
        comp = load_yaml(os.path.join(comp_dir, name))
        assert "logs_root_path" in comp, name
        refs = (comp.get("single_object_scenes_config_files") or []) + (
            comp.get("multi_object_scenes_config_files") or [])
        assert refs, f"{name} references no scene lists"
        for ref in refs:
            found = [p for p in (
                os.path.join(root, "single_object", ref),
                os.path.join(root, "multi_object", ref),
            ) if os.path.exists(p)]
            assert found, f"{name} -> {ref} unresolved"
            sc = load_yaml(found[0])
            assert isinstance(sc.get("train"), list), f"{ref}: no train list"
            assert isinstance(sc.get("test"), list), f"{ref}: no test list"
            assert sc.get("object_id"), f"{ref}: no object_id"


def test_published_composite_loads_through_dataset(tmp_path):
    """A reference composite drives SpartanDataset end to end over a
    real-layout data root (one published caterpillar scene name, miniature
    frames) — the corpus is live config, not documentation."""
    import os

    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.utils.yaml_io import load_yaml, save_yaml
    from tests.fixtures.real_layout import write_miniature_scene

    root = os.path.join(os.path.dirname(__file__), "..", "configs", "dataset")
    comp = load_yaml(os.path.join(root, "composite", "caterpillar_only.yaml"))
    sc_path = os.path.join(root, "single_object",
                           comp["single_object_scenes_config_files"][0])
    scene_list = load_yaml(sc_path)

    # keep one train + one test scene (miniature frames are enough to prove
    # the load path; the full corpus is covered by the integrity test)
    small = dict(scene_list)
    small["train"] = scene_list["train"][:1]
    small["test"] = scene_list["test"][:1]
    cfg_dir = tmp_path / "config"
    (cfg_dir / "single_object").mkdir(parents=True)
    (cfg_dir / "composite").mkdir()
    save_yaml(small, str(cfg_dir / "single_object" /
                         comp["single_object_scenes_config_files"][0]))
    save_yaml(comp, str(cfg_dir / "composite" / "caterpillar_only.yaml"))

    data_dir = tmp_path / "pdc"
    for scene in small["train"] + small["test"]:
        write_miniature_scene(
            os.path.join(str(data_dir), "logs_proto", scene, "processed"))

    ds = SpartanDataset(
        config=load_yaml(str(cfg_dir / "composite" / "caterpillar_only.yaml")),
        data_dir=str(data_dir), config_dir=str(cfg_dir / "composite"))
    assert ds.num_scenes == 1  # train mode
    pair = ds.sample_pair()
    assert pair.rgb_a.ndim == 3
    ds.set_test_mode()
    assert ds.get_random_scene_name() == small["test"][0]


def test_resolve_scene_list_prefers_scene_dirs_over_composite_shadow():
    """Several published composites reference a scene list with the SAME
    filename as the composite itself (baymax_1_train, caterpillar_upright,
    ...). Resolution must land on the single_object/multi_object list, not
    the composite file — resolving to the composite silently yields a
    zero-scene dataset."""
    import os

    from pdc_tpu.data.config_gen import (
        resolve_scene_list_path,
        scene_names_in_composite,
    )
    from pdc_tpu.utils.yaml_io import load_yaml

    root = os.path.join(os.path.dirname(__file__), "..", "configs", "dataset")
    comp_dir = os.path.join(root, "composite")
    for name in ("baymax_1_train.yaml", "starbot_1_train.yaml",
                 "caterpillar_upright.yaml",
                 "caterpillar_single_scene_test.yaml", "entire_dataset.yaml"):
        resolved = resolve_scene_list_path(name, comp_dir)
        assert os.path.normpath(resolved) != os.path.normpath(
            os.path.join(comp_dir, name)), name
        assert os.path.exists(resolved), (name, resolved)
        comp = load_yaml(os.path.join(comp_dir, name))
        scenes = scene_names_in_composite(comp, comp_dir)
        assert scenes, f"{name} resolved to an empty scene set"
