"""Multi-stage curriculum training — script parity with the reference's
``training_script.py`` (train objects sequentially, each stage starting from
the previous stage's weights via run_from_pretrained).

The synthetic default trains object_0's scenes, then continues on object_1's
scenes from the stage-1 checkpoint.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import copy


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iterations_per_stage", type=int, default=100)
    p.add_argument("--width", type=int, default=96)
    p.add_argument("--height", type=int, default=72)
    p.add_argument("--output", default="trained_models")
    args = p.parse_args()

    from pdc_tpu.data.dataset import SpartanDataset
    from pdc_tpu.training.train import DenseCorrespondenceTraining

    W, H = args.width, args.height
    full = SpartanDataset.make_synthetic(num_scenes=4, num_objects=2,
                                         width=W, height=H, num_frames=10)

    def dataset_for(object_id):
        scenes = [s for s in full.scenes.values() if s.object_id == object_id]
        return SpartanDataset(scenes=scenes)

    base = copy.deepcopy(DenseCorrespondenceTraining.load_default_config())
    base["training"].update(
        num_iterations=args.iterations_per_stage, batch_size=4,
        num_matching_attempts=2000, logging_dir=args.output,
        save_rate=args.iterations_per_stage, logging_rate=50,
    )
    base["dense_correspondence_network"].update(image_width=W, image_height=H)

    prev_folder = None
    for stage, object_id in enumerate(sorted({s.object_id for s in full.scenes.values()})):
        cfg = copy.deepcopy(base)
        cfg["training"]["logging_dir_name"] = f"curriculum_stage{stage}_{object_id}"
        trainer = DenseCorrespondenceTraining(config=cfg, dataset=dataset_for(object_id))
        if prev_folder is None:
            print(f"stage {stage}: training {object_id} from scratch")
            prev_folder = trainer.run()
        else:
            print(f"stage {stage}: training {object_id} from {prev_folder}")
            it = trainer.load_pretrained(prev_folder)
            prev_folder = trainer.run(loss_current_iteration=it, use_pretrained=True)
        print("  ->", prev_folder)

    print("curriculum complete:", prev_folder)


if __name__ == "__main__":
    main()
