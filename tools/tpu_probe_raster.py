"""TPU probe: triangle-rasterizer throughput (preprocessing pipeline).

Reference baseline: the VTK/OpenGL DepthScanner renders per frame in an
interactive GUI loop; no published number, but the pipeline reprocesses
whole logs (hundreds of frames x masks + depth). This measures frames/sec of
the jitted rasterizer at 640x480 for a realistic TSDF-scale mesh.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pdc_tpu.data.synthetic import SyntheticScene, make_orbit_pose
    from pdc_tpu.pipeline.renderer import render_depth_from_mesh
    from pdc_tpu.utils.compilation_cache import enable as _cc

    _cc()
    assert jax.devices()[0].platform == "tpu"
    results = {"device": str(jax.devices()[0])}

    H, W = 480, 640
    # fine triangulation ~ TSDF voxel scale: ~0.6M faces
    scene = SyntheticScene(width=W, height=H)
    verts, faces = scene.fusion_mesh(plane_step=0.004, object_step=0.002)
    results["num_faces"] = int(len(faces))
    results["num_vertices"] = int(len(verts))
    log(f"mesh: {len(verts)} verts, {len(faces)} faces")

    verts_d = jax.device_put(verts)
    faces_d = jax.device_put(faces)
    K = jnp.asarray(scene.K, jnp.float32)

    # K frames per dispatch (scan over poses) for honest device timing
    poses = np.stack([make_orbit_pose(0.3 * i).astype(np.float32)
                      for i in range(8)])

    @jax.jit
    def render_all(verts, faces, poses):
        def body(c, pose):
            d = render_depth_from_mesh(verts, faces, pose, K, H, W)
            return c, jnp.sum(d)
        _, s = jax.lax.scan(body, 0, poses)
        return jnp.sum(s)

    t0 = time.perf_counter()
    float(render_all(verts_d, faces_d, jnp.asarray(poses)))
    log(f"compile+first: {time.perf_counter()-t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(render_all(verts_d, faces_d, jnp.asarray(poses)))
        times.append(time.perf_counter() - t0)
    ms = min(times) / len(poses) * 1e3
    results["render_ms_per_frame"] = round(ms, 2)
    results["frames_per_sec"] = round(1e3 / ms, 1)
    log(f"{ms:.2f} ms/frame ({1e3/ms:.0f} frames/s) at {len(faces)} faces")

    # size-binned rasterization (round 3): per-bin tiles instead of one
    # blanket tile -> ~tile_ratio^2 fewer z-buffer updates for the
    # voxel-scale bulk of a TSDF mesh; output exact (test_rasterizer.py)
    from pdc_tpu.pipeline.renderer import (
        bin_faces_by_extent,
        render_depth_from_mesh_binned_many,
    )

    bins = bin_faces_by_extent(verts, faces, poses, scene.K, H, W)
    updates_blanket = len(faces) * 64
    updates_binned = sum(len(fb) * t * t for fb, t in bins)
    log("bins: " + ", ".join(f"tile {t}: {len(fb)} faces" for fb, t in bins)
        + f"; scatter updates {updates_blanket/1e6:.1f}M -> "
        f"{updates_binned/1e6:.1f}M")
    results["bins"] = [[int(len(fb)), int(t)] for fb, t in bins]

    def run_binned():
        d = render_depth_from_mesh_binned_many(
            verts_d, faces_d, jnp.asarray(poses), K, H, W)
        return float(jnp.sum(d))

    t0 = time.perf_counter()
    run_binned()
    log(f"binned compile+first: {time.perf_counter()-t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_binned()
        times.append(time.perf_counter() - t0)
    ms_b = min(times) / len(poses) * 1e3
    results["binned_ms_per_frame"] = round(ms_b, 2)
    results["binned_frames_per_sec"] = round(1e3 / ms_b, 1)
    log(f"binned: {ms_b:.2f} ms/frame ({1e3/ms_b:.0f} frames/s, "
        f"{ms/ms_b:.2f}x)")

    # sort-based z-buffering (round 3): the TPU scatter-min measures
    # ~9 ns/update (~220 ms of the 254 ms frame); sorting the (pixel, depth)
    # fragments and segment-extracting replaces it entirely.
    # round 4 shrinks the fragment set itself: candidate-pixel-center
    # binning (exact anchor) + per-pose face culling
    from pdc_tpu.pipeline.renderer import (
        prepare_sorted_render,
        render_depth_from_mesh_sorted_many,
    )

    prep = prepare_sorted_render(verts, faces, poses, scene.K, H, W,
                                 min_tile=2)
    frag_union = sum((len(fb) - 1) * t * t for fb, _, t in prep)
    frag_culled = sum(idx.shape[1] * t * t for _, idx, t in prep)
    results["fragments_union"] = int(frag_union)
    results["fragments_per_pose_culled"] = int(frag_culled)
    log(f"fragments: union {frag_union/1e6:.1f}M -> per-pose culled "
        f"{frag_culled/1e6:.1f}M")

    def run_sorted():
        d = render_depth_from_mesh_sorted_many(
            verts_d, faces_d, poses, scene.K, H, W)
        return float(jnp.sum(d))

    t0 = time.perf_counter()
    run_sorted()
    log(f"sorted compile+first: {time.perf_counter()-t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_sorted()
        times.append(time.perf_counter() - t0)
    ms_s = min(times) / len(poses) * 1e3
    results["sorted_ms_per_frame"] = round(ms_s, 2)
    results["sorted_frames_per_sec"] = round(1e3 / ms_s, 1)
    log(f"sorted: {ms_s:.2f} ms/frame ({1e3/ms_s:.0f} frames/s, "
        f"{ms/ms_s:.2f}x vs blanket)")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
