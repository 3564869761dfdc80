"""TPU probe: end-to-end mask/depth regeneration pipeline
(pdc_tpu/pipeline/preprocessing.py run_change_detection_pipeline — the
GL-free replacement for the reference's VTK/OpenGL change-detection +
DepthScanner loop).

Writes a synthetic on-disk dataset (fusion mesh + frames at 640x480), runs
the all-logs pipeline once to warm the compile cache, then times a --redo
pass: crop-box fit -> masks + cropped depth -> full depth re-render ->
parallel native PNG encode. Reports ms/frame end to end.

  PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python tools/tpu_probe_preprocess.py
"""

import json
import os
import shutil
import sys
import tempfile
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from pdc_tpu.data.synthetic import SyntheticScene
    from pdc_tpu.pipeline.preprocessing import run_change_detection_pipeline
    from pdc_tpu.utils.compilation_cache import enable as _cc

    _cc()
    assert jax.devices()[0].platform == "tpu"
    results = {"device": str(jax.devices()[0])}

    W, H = 640, 480
    n_scenes, n_frames = 2, 12
    root = tempfile.mkdtemp(prefix="pdc_preproc_probe_")
    try:
        total_frames = 0
        for i in range(n_scenes):
            scene = SyntheticScene(seed=i, width=W, height=H,
                                   num_frames=n_frames)
            sdir = os.path.join(root, f"scene_{i:03d}", "processed")
            scene.write_scene(os.path.dirname(sdir))
            scene.write_fusion_mesh(sdir)
            total_frames += n_frames
        results["scenes"] = n_scenes
        results["frames"] = total_frames

        t0 = time.perf_counter()
        run_change_detection_pipeline(root, redo=True)
        warm = time.perf_counter() - t0
        log(f"first (compile) pass: {warm:.1f}s")

        t0 = time.perf_counter()
        out = run_change_detection_pipeline(root, redo=True)
        dt = time.perf_counter() - t0
        assert sum(out.values()) == total_frames, out
        ms = dt / total_frames * 1e3
        results["end_to_end_s"] = round(dt, 2)
        results["ms_per_frame"] = round(ms, 2)
        results["frames_per_sec"] = round(1e3 / ms, 1)
        log(f"end to end: {dt:.2f}s = {ms:.1f} ms/frame "
            f"({total_frames} frames)")
        print(json.dumps(results, indent=1))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
