"""JAX point-splat z-buffer depth renderer.

Self-contained replacement for the reference's VTK/OpenGL DepthScanner
(``modules/.../change_detection/depthscanner.py:25-160``): renders a metric
depth image of a point cloud (e.g. densely-sampled TSDF mesh vertices) from a
camera pose, using a scatter-min z-buffer — one jitted XLA program, no GL
context. Splat radius > 0 fills small holes by scattering each point into a
(2r+1)^2 pixel neighborhood.

The published pdc dataset ships precomputed depth/mask renders, so this is
the fallback path that keeps the preprocessing pipeline (change detection,
depth re-rendering) runnable without OpenGL.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pdc_tpu.geom.transforms import invert_se3, transform_points

INVALID_DEPTH = jnp.float32(1e9)


@functools.partial(jax.jit, static_argnames=("height", "width", "splat_radius"))
def render_depth_from_points(points_world, camera_to_world, K,
                             height: int, width: int, splat_radius: int = 1):
    """Render a depth image from world-frame points.

    :param points_world: [N, 3] float32
    :param camera_to_world: [4, 4]
    :param K: [3, 3]
    :return: [H, W] float32 metric depth; 0 where nothing projects
    """
    world_to_cam = invert_se3(jnp.asarray(camera_to_world, jnp.float32))
    pts_cam = transform_points(world_to_cam, points_world)
    z = pts_cam[:, 2]
    proj = pts_cam @ jnp.asarray(K, jnp.float32).T
    denom = jnp.where(jnp.abs(proj[:, 2]) < 1e-9, 1e-9, proj[:, 2])
    u = proj[:, 0] / denom
    v = proj[:, 1] / denom

    in_front = z > 1e-6
    zbuf = jnp.full((height * width,), INVALID_DEPTH)

    for du in range(-splat_radius, splat_radius + 1):
        for dv in range(-splat_radius, splat_radius + 1):
            ui = jnp.round(u).astype(jnp.int32) + du
            vi = jnp.round(v).astype(jnp.int32) + dv
            ok = in_front & (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height)
            flat = jnp.where(ok, vi * width + ui, 0)
            zval = jnp.where(ok, z, INVALID_DEPTH)
            zbuf = zbuf.at[flat].min(zval)

    depth = jnp.where(zbuf >= INVALID_DEPTH, 0.0, zbuf)
    return depth.reshape(height, width)


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "tile", "chunk"))
def render_depth_from_mesh(vertices_world, faces, camera_to_world, K,
                           height: int, width: int, tile: int = 8,
                           chunk: int = 65536):
    """Render a depth image by rasterizing mesh triangles — the full analog
    of the reference's VTK mesh rendering (point splats leave holes where
    vertices are sparse; triangles fill faces exactly).

    Screen-space edge-function rasterization with perspective-correct depth
    (barycentric interpolation of 1/z): each triangle rasterizes a static
    ``tile`` x ``tile`` pixel block anchored at its bbox corner and
    scatter-mins into the z-buffer; triangles are processed ``chunk`` at a
    time under ``lax.scan`` so memory stays bounded. TSDF fusion meshes have
    voxel-scale triangles (a few pixels), so the default tile covers them;
    raise ``tile`` for close-up renders of coarse meshes.

    :param vertices_world: [N, 3] float32
    :param faces: [F, 3] int32 vertex indices
    :return: [H, W] float32 metric depth; 0 where nothing projects
    """
    zbuf = _mesh_zbuf(vertices_world, faces, camera_to_world, K, height,
                      width, tile, chunk)
    depth = jnp.where(zbuf >= INVALID_DEPTH, 0.0, zbuf)
    return depth.reshape(height, width)


def _project_vertices(vertices_world, camera_to_world, K):
    """Screen-space (u, v) + camera depth z for all vertices under a pose."""
    world_to_cam = invert_se3(jnp.asarray(camera_to_world, jnp.float32))
    pts_cam = transform_points(world_to_cam, jnp.asarray(vertices_world,
                                                         jnp.float32))
    Kf = jnp.asarray(K, jnp.float32)
    z = pts_cam[:, 2]
    proj = pts_cam @ Kf.T
    denom = jnp.where(jnp.abs(proj[:, 2]) < 1e-9, 1e-9, proj[:, 2])
    return proj[:, 0] / denom, proj[:, 1] / denom, z


def _fragments_from_faces(u, v, z, f, height: int, width: int, tile: int,
                          masked_flat: int):
    """(flat [C*tile^2] pixel ids, val [C*tile^2] depths) for faces ``f``
    over pre-projected vertices: per-face bbox-anchored tile x tile block,
    edge-function coverage (both windings), perspective-correct 1/z depth.
    Masked/culled entries get (``masked_flat``, INVALID_DEPTH). Shared by
    the scatter-min and sort-based reducers, so their geometry is one code
    path."""
    off = jnp.arange(tile)
    du, dv = jnp.meshgrid(off, off, indexing="xy")
    du = du.reshape(-1)  # [tile*tile]
    dv = dv.reshape(-1)

    tu, tv, tz = u[f], v[f], z[f]
    in_front = jnp.all(tz > 1e-6, axis=1)  # [C]

    # anchor at the first IN-VIEWPORT pixel center that can be covered: a
    # center u+0.5 lies in the bbox iff u >= ceil(min-0.5), and centers below
    # 0 are masked out-of-bounds anyway, so clamping to 0 is exact. This
    # (instead of floor(min)) lets the binning metric count candidate
    # centers exactly — typically one power-of-two tile smaller than the
    # bbox-extent metric, i.e. 4x fewer fragments per downshifted face.
    u0 = jnp.maximum(
        jnp.ceil(jnp.min(tu, axis=1) - 0.5), 0.0).astype(jnp.int32)  # [C]
    v0 = jnp.maximum(
        jnp.ceil(jnp.min(tv, axis=1) - 0.5), 0.0).astype(jnp.int32)
    px = (u0[:, None] + du[None, :]).astype(jnp.float32) + 0.5  # [C, T2]
    py = (v0[:, None] + dv[None, :]).astype(jnp.float32) + 0.5

    # edge functions (signed areas); both windings accepted
    x1, x2, x3 = tu[:, 0:1], tu[:, 1:2], tu[:, 2:3]
    y1, y2, y3 = tv[:, 0:1], tv[:, 1:2], tv[:, 2:3]
    w0 = (x3 - x2) * (py - y2) - (y3 - y2) * (px - x2)
    w1 = (x1 - x3) * (py - y3) - (y1 - y3) * (px - x3)
    w2 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
    area = (x2 - x1) * (y3 - y1) - (y2 - y1) * (x3 - x1)  # [C, 1]
    pos = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
    neg = (w0 <= 0) & (w1 <= 0) & (w2 <= 0)
    ok_area = jnp.abs(area) > 1e-12
    inside = (pos | neg) & ok_area & in_front[:, None]

    # perspective-correct depth: interpolate 1/z with screen barycentrics
    safe_area = jnp.where(ok_area, area, 1.0)
    l0 = w0 / safe_area
    l1 = w1 / safe_area
    l2 = w2 / safe_area
    inv_z = (l0 / tz[:, 0:1] + l1 / tz[:, 1:2] + l2 / tz[:, 2:3])
    depth = 1.0 / jnp.maximum(inv_z, 1e-9)

    ui = u0[:, None] + du[None, :]
    vi = v0[:, None] + dv[None, :]
    ok = inside & (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height)
    flat = jnp.where(ok, vi * width + ui, masked_flat).reshape(-1)
    val = jnp.where(ok, depth, INVALID_DEPTH).reshape(-1)
    return flat, val


def _mesh_zbuf(vertices_world, faces, camera_to_world, K,
               height: int, width: int, tile: int, chunk: int):
    """Raw [H*W] z-buffer (INVALID_DEPTH where empty) for one pose —
    shared by the single-tile and size-binned render paths."""
    u, v, z = _project_vertices(vertices_world, camera_to_world, K)

    faces = jnp.asarray(faces, jnp.int32)
    n_faces = faces.shape[0]
    pad = (-n_faces) % chunk
    # padded entries point at vertex 0 -> degenerate, culled by the area test
    faces_p = jnp.concatenate(
        [faces, jnp.zeros((pad, 3), jnp.int32)], axis=0
    ).reshape(-1, chunk, 3)

    zbuf0 = jnp.full((height * width,), INVALID_DEPTH)

    def raster_chunk(zbuf, f):
        flat, val = _fragments_from_faces(u, v, z, f, height, width, tile,
                                          masked_flat=0)
        return zbuf.at[flat].min(val), None

    zbuf, _ = jax.lax.scan(raster_chunk, zbuf0, faces_p)
    return zbuf


def projected_face_pixel_counts(vertices_world, faces, camera_to_world, K,
                                height: int, width: int, eps: float = 1e-3):
    """Host-side per-face count of candidate pixel CENTERS under one pose —
    the exact tile size the rasterizer needs (its block is anchored at
    ``ceil(min-0.5)``; a center u+0.5 can be covered iff
    ``ceil(min-0.5) <= u <= floor(max-0.5)``). 0 for faces that cannot
    produce any fragment (behind the camera, bbox clear of the viewport, or
    no center inside the bbox) — safe to cull them entirely.

    ``eps`` (pixels) widens the range outward so the float64 host metric
    never undercounts the float32 device geometry at exact-boundary faces
    (keeps the scatter/sorted bit-exactness contract)."""
    import numpy as np

    V = np.asarray(vertices_world, np.float64)
    T = np.asarray(camera_to_world, np.float64)
    R, t = T[:3, :3], T[:3, 3]
    pts_cam = (V - t) @ R
    z = pts_cam[:, 2]
    proj = pts_cam @ np.asarray(K, np.float64).T
    denom = np.where(np.abs(proj[:, 2]) < 1e-9, 1e-9, proj[:, 2])
    u = proj[:, 0] / denom
    v = proj[:, 1] / denom

    f = np.asarray(faces, np.int64)
    tu, tv, tz = u[f], v[f], z[f]
    # device culls at z > 1e-6 in f32; keep anything that might pass
    in_front = np.all(tz > 0.5e-6, axis=1)
    lo_u = np.ceil(tu.min(axis=1) - 0.5 - eps)
    hi_u = np.floor(tu.max(axis=1) - 0.5 + eps)
    lo_v = np.ceil(tv.min(axis=1) - 0.5 - eps)
    hi_v = np.floor(tv.max(axis=1) - 0.5 + eps)
    # clip the candidate ranges to the viewport (out-of-range centers are
    # masked fragments on device; they need no tile coverage)
    cu = np.minimum(hi_u, width - 1) - np.maximum(lo_u, 0) + 1
    cv = np.minimum(hi_v, height - 1) - np.maximum(lo_v, 0) + 1
    count = np.maximum(np.maximum(cu, cv), 0)
    # a face needs BOTH axes to have a candidate center
    visible = in_front & (cu > 0) & (cv > 0)
    return np.where(visible, count, 0.0)


def bin_faces_by_extent(vertices_world, faces, poses, K, height: int,
                        width: int, min_tile: int = 4, max_tile: int = 64):
    """Partition faces into power-of-two tile bins by their worst-case
    (max-over-poses) candidate-pixel-center count (see
    :func:`projected_face_pixel_counts`). The fragment cost is
    faces x tile^2, so rendering each bin at its own tile instead of one
    blanket tile cuts the update count by ~tile_ratio^2 for the (typically
    ~95%) voxel-scale faces of a TSDF mesh.

    :return: list of (face_subset [Fi, 3] int32, tile) with Fi > 0; faces
        never visible under any pose are dropped entirely
    """
    import numpy as np

    poses = np.asarray(poses, np.float64)
    if poses.ndim == 2:
        poses = poses[None]
    ext = np.zeros(len(faces))
    for pose in poses:
        ext = np.maximum(ext, projected_face_pixel_counts(
            vertices_world, faces, pose, K, height, width))

    faces = np.asarray(faces, np.int32)
    bins = []
    lo = 0.0
    tile = min_tile
    while True:
        hi = tile if tile < max_tile else np.inf
        sel = (ext > lo) & (ext <= hi) if lo > 0 else (ext > 0) & (ext <= hi)
        if sel.any():
            bins.append((faces[sel], tile))
        if tile >= max_tile:
            break
        lo, tile = float(tile), tile * 2
    if not bins:  # nothing visible; keep shapes simple for callers
        bins.append((faces[:1] if len(faces) else faces, min_tile))
    n_trunc = int((ext > max_tile).sum())
    if n_trunc:
        import logging

        logging.getLogger(__name__).warning(
            "mesh rasterization: %d faces project larger than max_tile=%d "
            "and will render truncated", n_trunc, max_tile)
    return bins


def prepare_sorted_render(vertices_world, faces, poses, K, height: int,
                          width: int, min_tile: int = 2, max_tile: int = 64):
    """ONE host pass producing everything the sorted renderer needs: the
    per-pose candidate-center counts ([P, F], float64 numpy) drive both the
    worst-case-over-poses tile binning AND the per-pose face culling, so the
    mesh is projected once per pose instead of once for binning plus once
    per bin for culling.

    :return: list of (faces [Fi+1, 3] int32 with a trailing degenerate
        sentinel row, idx [P, Vmax_i] int32 per-pose visible-face indices
        padded with the sentinel index Fi, tile)
    """
    import numpy as np

    poses = np.asarray(poses, np.float64)
    if poses.ndim == 2:
        poses = poses[None]
    faces = np.asarray(faces, np.int32)
    counts = np.stack([
        projected_face_pixel_counts(vertices_world, faces, pose, K, height,
                                    width)
        for pose in poses])                       # [P, F]
    worst = counts.max(axis=0)

    prep = []
    lo = 0.0
    tile = min_tile
    while True:
        hi = tile if tile < max_tile else np.inf
        sel = (worst > lo) & (worst <= hi)
        if sel.any():
            fb = faces[sel]
            vis = counts[:, sel] > 0              # [P, Fi]
            vmax = max(int(vis.sum(axis=1).max()), 1)
            idx = np.full((len(poses), vmax), len(fb), np.int32)
            for pi in range(len(poses)):
                s = np.nonzero(vis[pi])[0]
                idx[pi, :len(s)] = s
            prep.append((
                np.concatenate([fb, np.zeros((1, 3), np.int32)]), idx,
                int(tile)))
        if tile >= max_tile:
            break
        lo, tile = float(tile), tile * 2
    if not prep:  # nothing visible under any pose
        prep.append((np.zeros((1, 3), np.int32),
                     np.zeros((len(poses), 1), np.int32), min_tile))
    n_trunc = int((worst > max_tile).sum())
    if n_trunc:
        import logging

        logging.getLogger(__name__).warning(
            "mesh rasterization: %d faces project larger than max_tile=%d "
            "and will render truncated", n_trunc, max_tile)
    return prep


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "tiles", "chunk"))
def _render_depth_binned_many(vertices_world, face_bins, poses, K,
                              height: int, width: int, tiles: tuple,
                              chunk: int = 65536):
    """[P, H, W] depth for a stack of poses, rasterizing each face bin at
    its own tile and min-combining the z-buffers (one dispatch)."""
    def body(c, pose):
        zbuf = jnp.full((height * width,), INVALID_DEPTH)
        for fb, tile in zip(face_bins, tiles):
            # per-bin chunk: a tiny bin must not pad to the full chunk (the
            # padded degenerate faces still cost scatter updates)
            c_bin = min(chunk, max(int(fb.shape[0]), 1))
            zbuf = jnp.minimum(
                zbuf, _mesh_zbuf(vertices_world, fb, pose, K, height, width,
                                 tile, c_bin))
        return c, jnp.where(zbuf >= INVALID_DEPTH, 0.0,
                            zbuf).reshape(height, width)

    _, depths = jax.lax.scan(body, 0, jnp.asarray(poses, jnp.float32))
    return depths


def render_depth_from_mesh_binned_many(vertices_world, faces, poses, K,
                                       height: int, width: int,
                                       min_tile: int = 4, max_tile: int = 64,
                                       chunk: int = 65536):
    """:func:`render_depth_from_mesh_many` with per-size-bin tiles — exact
    same output (each face rasterizes with a tile covering its extent; the
    z-buffer min is order-independent), several times fewer scatter updates
    on voxel-scale meshes."""
    poses = jnp.asarray(poses, jnp.float32)
    bins = bin_faces_by_extent(vertices_world, faces, poses, K, height,
                               width, min_tile=min_tile, max_tile=max_tile)
    face_bins = tuple(jnp.asarray(fb) for fb, _ in bins)
    tiles = tuple(int(t) for _, t in bins)
    return _render_depth_binned_many(
        jnp.asarray(vertices_world, jnp.float32), face_bins,
        poses if poses.ndim == 3 else poses[None], jnp.asarray(K, jnp.float32),
        height, width, tiles, chunk=chunk)


def _face_pixels(vertices_world, faces, camera_to_world, K,
                 height: int, width: int, tile: int):
    """Per-face tile rasterization WITHOUT the z-buffer reduction: returns
    (flat [F*tile^2] int32 pixel ids — H*W for culled/masked entries — and
    val [F*tile^2] float32 depths). Projection + fragment geometry shared
    with the scatter path (_fragments_from_faces)."""
    u, v, z = _project_vertices(vertices_world, camera_to_world, K)
    return _fragments_from_faces(u, v, z, jnp.asarray(faces, jnp.int32),
                                 height, width, tile,
                                 masked_flat=height * width)


def _reduce_min_fragments(flat, val, hw: int):
    """Per-pixel min over (pixel, depth) fragments WITHOUT a fragment-scale
    scatter: 2-key lexicographic sort (each pixel's nearest fragment is the
    FIRST of its run), then compact the run-start winners to the front with
    a second 1-key sort, leaving a <= hw scatter. Alternatives measured and
    rejected: searchsorted extraction (binary-search gathers cost 3x both
    sorts combined), segmented-min associative scan (>25 min compile).

    :param flat: [M] int32 pixel ids; ``hw`` = masked/invalid sentinel
    :param val: [M] float32 depths (INVALID_DEPTH on masked rows)
    :return: [hw] float32 depth, 0 where no fragment landed
    """
    flat_s, val_s = jax.lax.sort((flat, val), num_keys=2)
    start = jnp.concatenate([
        jnp.ones((1,), bool), flat_s[1:] != flat_s[:-1]])
    key2 = jnp.where(start & (flat_s < hw), flat_s, hw)
    win_px, win_val = jax.lax.sort((key2, val_s), num_keys=1)
    win_px = win_px[:hw]
    win_val = win_val[:hw]
    ok = (win_px < hw) & (win_val < INVALID_DEPTH)
    # masked rows write 0 at index 0; max keeps any real (positive) depth
    # regardless of duplicate-write ordering
    return jnp.zeros((hw,)).at[jnp.where(ok, win_px, 0)].max(
        jnp.where(ok, win_val, 0.0))


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "tiles"))
def _render_depth_sorted_many(vertices_world, face_bins, idx_bins, poses, K,
                              height: int, width: int, tiles: tuple):
    """[P, H, W] depth via SORT-based z-buffering: all (pixel, depth)
    fragments of a frame are sorted lexicographically (lax.sort, 2 keys), so
    each pixel's nearest fragment is the first of its run; winners are
    compacted to the front by a second 1-key sort and land with a <= H*W
    scatter. The TPU executes the fragment-scale scatter-min at ~9 ns/update
    (~220 ms of the 254 ms frame at TSDF scale) while the sorts cost ~30 ms
    each — measured 1.55x end to end at 392k faces
    (tools/tpu_probe_raster.py). Same min over the same fragment set:
    bit-exact vs the scatter path on CPU (tests/test_rasterizer.py); on TPU
    the two differently-fused geometry pipelines may differ in the last
    float ulp.

    ``idx_bins`` ([P, Vmax_i] per bin, from :func:`prepare_sorted_render`)
    gathers each pose's visible faces before fragment generation, so both
    the geometry math and the sorts run over the per-pose visible set
    instead of the all-poses union."""
    hw = height * width

    def body(c, xs):
        pose, idxs = xs
        parts = [
            _face_pixels(vertices_world, fb[idx], pose, K, height, width,
                         tile)
            for fb, idx, tile in zip(face_bins, idxs, tiles)
        ]
        flat = jnp.concatenate([p[0] for p in parts])
        val = jnp.concatenate([p[1] for p in parts])
        depth = _reduce_min_fragments(flat, val, hw)
        return c, depth.reshape(height, width)

    _, depths = jax.lax.scan(
        body, 0, (jnp.asarray(poses, jnp.float32), tuple(idx_bins)))
    return depths


def render_depth_from_mesh_sorted_many(vertices_world, faces, poses, K,
                                       height: int, width: int,
                                       min_tile: int = 2, max_tile: int = 64,
                                       max_fragments: int = 64_000_000):
    """Sort-based mesh depth rendering for a stack of poses (one dispatch),
    with per-extent face bins. Same output as the scatter renderers;
    measured 1.55x at TSDF scale (see _render_depth_sorted_many).

    The sort materializes every fragment of a frame at once (the scatter
    path is chunk-bounded instead); when the per-pose culled fragment count
    exceeds ``max_fragments`` — close-up poses pushing many faces into
    large-tile bins — this falls back to the memory-bounded binned scatter
    path."""
    poses = jnp.asarray(poses, jnp.float32)
    poses_b = poses if poses.ndim == 3 else poses[None]
    prep = prepare_sorted_render(vertices_world, faces, poses_b, K, height,
                                 width, min_tile=min_tile, max_tile=max_tile)
    n_fragments = sum(idx.shape[1] * t * t for _, idx, t in prep)
    if n_fragments > max_fragments:
        import logging

        logging.getLogger(__name__).info(
            "sorted renderer: %d fragments exceed the %d budget; using the "
            "chunk-bounded scatter path", n_fragments, max_fragments)
        # reuse prep's bins (strip the sentinel rows) — the same partition
        # bin_faces_by_extent would produce, without re-projecting the mesh
        # for every pose a second time
        return _render_depth_binned_many(
            jnp.asarray(vertices_world, jnp.float32),
            tuple(jnp.asarray(fb[:-1]) for fb, _, _ in prep), poses_b,
            jnp.asarray(K, jnp.float32), height, width,
            tuple(t for _, _, t in prep))
    return _render_depth_sorted_many(
        jnp.asarray(vertices_world, jnp.float32),
        tuple(jnp.asarray(fb) for fb, _, _ in prep),
        tuple(jnp.asarray(idx) for _, idx, _ in prep), poses_b,
        jnp.asarray(K, jnp.float32), height, width,
        tuple(t for _, _, t in prep))


@functools.partial(jax.jit, static_argnames=(
    "height", "width", "tiles_fg", "tiles_full", "depth_scale"))
def _render_scene_products(vertices_world, fg_faces, fg_idx, full_faces,
                           full_idx, poses, K, height: int, width: int,
                           tiles_fg: tuple, tiles_full: tuple,
                           depth_scale: float):
    """The preprocessing pipeline's whole per-scene device program: for every
    pose, rasterize the crop-filtered foreground mesh AND the full mesh
    (sorted z-buffering with per-pose culled face sets), derive the
    crop-strategy object mask (foreground renders anything -> 1), convert
    both depths to the on-disk uint16 millimetre encoding ON DEVICE, and
    bit-pack the mask — everything lands in ONE uint16 buffer.

    One dispatch and ONE fetch per scene, and the fetch is essentially the
    PNG payload: 2 uint16 depths + 1/16 uint16 of packed mask per pixel
    (~4.1 B/px) instead of three separate float32/uint8 fetches (8 B/px +
    two extra round trips). Through a thin host link the transfer is the
    pipeline's floor, so this matters as much as the rasterizer itself.

    :return: [P, 2*hw + ceil(hw/16)] uint16 — per frame
        ``concat(depth_cropped_mm, depth_full_mm, mask_bits)`` with mask
        bit i of word w = pixel ``w*16 + i``
    """
    hw = height * width
    n_words = -(-hw // 16)
    pad = n_words * 16 - hw
    bit_weights = (jnp.uint16(1) << jnp.arange(16, dtype=jnp.uint16))

    def one_depth(pose, fbs, idxs, tiles):
        parts = [
            _face_pixels(vertices_world, fb[i], pose, K, height, width, t)
            for fb, i, t in zip(fbs, idxs, tiles)
        ]
        flat = jnp.concatenate([p[0] for p in parts])
        val = jnp.concatenate([p[1] for p in parts])
        return _reduce_min_fragments(flat, val, hw)

    def to_mm(d):
        return jnp.clip(d * depth_scale, 0, 65535).astype(jnp.uint16)

    def body(c, xs):
        pose, ifg, ifull = xs
        d_fg = one_depth(pose, fg_faces, ifg, tiles_fg)
        d_full = one_depth(pose, full_faces, ifull, tiles_full)
        mask = (d_fg > 0).astype(jnp.uint16)
        mask = jnp.pad(mask, (0, pad)).reshape(n_words, 16)
        mask_bits = jnp.sum(mask * bit_weights[None, :], axis=1,
                            dtype=jnp.uint16)
        return c, jnp.concatenate([to_mm(d_fg), to_mm(d_full), mask_bits])

    _, out = jax.lax.scan(
        body, 0,
        (jnp.asarray(poses, jnp.float32), tuple(fg_idx), tuple(full_idx)))
    return out


def render_scene_products_start(vertices_world, fg_faces, full_faces, poses,
                                K, height: int, width: int,
                                depth_scale: float, min_tile: int = 2,
                                max_tile: int = 64,
                                max_fragments: int = 64_000_000):
    """Async half of :func:`render_scene_products`: host-side prep (one
    projection pass per mesh; see :func:`prepare_sorted_render`) + device
    DISPATCH. Returns the on-device packed buffer WITHOUT fetching — jax
    dispatch is asynchronous, so the caller can overlap the next scene's
    host work (prep, crop fit, PNG encode of the previous scene) with this
    scene's device render + transfer. Unpack with
    :func:`unpack_scene_products`.

    Returns None when the combined per-pose fragment count exceeds
    ``max_fragments`` (close-up poses pushing many faces into large-tile
    bins; the sort materializes every fragment at once) — the caller should
    fall back to the chunk-bounded two-pass flow. Pass
    ``max_fragments=None`` to disable the budget."""
    poses = jnp.asarray(poses, jnp.float32)
    poses_b = poses if poses.ndim == 3 else poses[None]
    prep_fg = prepare_sorted_render(vertices_world, fg_faces, poses_b, K,
                                    height, width, min_tile, max_tile)
    prep_full = prepare_sorted_render(vertices_world, full_faces, poses_b, K,
                                      height, width, min_tile, max_tile)
    n_fragments = sum(idx.shape[1] * t * t
                      for _, idx, t in prep_fg + prep_full)
    if max_fragments is not None and n_fragments > max_fragments:
        import logging

        logging.getLogger(__name__).info(
            "fused scene render: %d fragments exceed the %d budget; caller "
            "should use the chunk-bounded two-pass flow", n_fragments,
            max_fragments)
        return None
    return _render_scene_products(
        jnp.asarray(vertices_world, jnp.float32),
        tuple(jnp.asarray(fb) for fb, _, _ in prep_fg),
        tuple(jnp.asarray(idx) for _, idx, _ in prep_fg),
        tuple(jnp.asarray(fb) for fb, _, _ in prep_full),
        tuple(jnp.asarray(idx) for _, idx, _ in prep_full),
        poses_b, jnp.asarray(K, jnp.float32), height, width,
        tuple(t for _, _, t in prep_fg), tuple(t for _, _, t in prep_full),
        float(depth_scale))


def unpack_scene_products(packed, height: int, width: int):
    """Host half: fetch (if still on device) + unpack the single buffer.

    :return: (mask [P,H,W] uint8, depth_cropped_mm [P,H,W] uint16,
        depth_full_mm [P,H,W] uint16) host numpy arrays
    """
    import numpy as np

    packed = np.asarray(packed)                   # ONE device->host fetch
    P = packed.shape[0]
    hw = height * width
    depth_crop = packed[:, :hw].reshape(P, height, width)
    depth_full = packed[:, hw:2 * hw].reshape(P, height, width)
    words = packed[:, 2 * hw:]
    bits = (words[:, :, None] >> np.arange(16, dtype=np.uint16)) & 1
    mask = bits.reshape(P, -1)[:, :hw].reshape(
        P, height, width).astype(np.uint8)
    return mask, depth_crop, depth_full


def render_scene_products(vertices_world, fg_faces, full_faces, poses, K,
                          height: int, width: int, depth_scale: float,
                          min_tile: int = 2, max_tile: int = 64):
    """Synchronous start+unpack (no fragment budget — callers that need the
    memory-bounded fallback go through ``ChangeDetection.process_scene``).
    ``fg_faces`` and ``full_faces`` index the SAME vertex array (the
    foreground is a crop-box face subset)."""
    return unpack_scene_products(
        render_scene_products_start(vertices_world, fg_faces, full_faces,
                                    poses, K, height, width, depth_scale,
                                    min_tile, max_tile, max_fragments=None),
        height, width)


def render_scene_products_sharded(vertices_world, fg_faces, full_faces,
                                  poses, K, height: int, width: int,
                                  depth_scale: float, mesh, axis: str = "data",
                                  min_tile: int = 2, max_tile: int = 64):
    """Pod-scale preprocessing: the fused per-scene program with the POSES
    axis sharded over a mesh — each chip rasterizes its own 1/n of the
    frames (geometry + per-pose cull indices replicated; the per-frame
    programs are independent, so no collectives are needed until the
    gather-on-fetch). Reprocessing a whole dataset rides n chips at n x
    the single-chip frame rate.

    Output-identical to :func:`render_scene_products` (the per-frame
    program is the same; frames are merely partitioned across chips).

    :return: (mask [P,H,W] uint8, depth_cropped_mm [P,H,W] uint16,
        depth_full_mm [P,H,W] uint16) host numpy arrays
    """
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pdc_tpu.parallel.mesh import get_shard_map

    n = mesh.shape[axis]
    poses = np.asarray(poses, np.float32)
    if poses.ndim == 2:
        poses = poses[None]
    n_poses = len(poses)
    pad = (-n_poses) % n
    if pad:  # replicate the last pose; padded frames dropped after fetch
        poses = np.concatenate([poses, np.repeat(poses[-1:], pad, axis=0)])

    prep_fg = prepare_sorted_render(vertices_world, fg_faces, poses, K,
                                    height, width, min_tile, max_tile)
    prep_full = prepare_sorted_render(vertices_world, full_faces, poses, K,
                                      height, width, min_tile, max_tile)

    verts = jnp.asarray(vertices_world, jnp.float32)
    Kf = jnp.asarray(K, jnp.float32)
    fg_fb = tuple(jnp.asarray(fb) for fb, _, _ in prep_fg)
    fg_idx = tuple(jnp.asarray(idx) for _, idx, _ in prep_fg)
    full_fb = tuple(jnp.asarray(fb) for fb, _, _ in prep_full)
    full_idx = tuple(jnp.asarray(idx) for _, idx, _ in prep_full)
    tiles_fg = tuple(t for _, _, t in prep_fg)
    tiles_full = tuple(t for _, _, t in prep_full)

    sm = get_shard_map()

    def local(verts_r, kf_r, fg_fb_r, full_fb_r, poses_l, fg_idx_l,
              full_idx_l):
        return _render_scene_products(
            verts_r, fg_fb_r, fg_idx_l, full_fb_r, full_idx_l, poses_l,
            kf_r, height=height, width=width, tiles_fg=tiles_fg,
            tiles_full=tiles_full, depth_scale=float(depth_scale))

    repl, sharded = P(), P(axis)
    fn = jax.jit(sm(
        local, mesh=mesh,
        in_specs=(repl, repl, tuple(repl for _ in fg_fb),
                  tuple(repl for _ in full_fb), sharded,
                  tuple(sharded for _ in fg_idx),
                  tuple(sharded for _ in full_idx)),
        out_specs=sharded))
    packed = fn(verts, Kf, fg_fb, full_fb, jnp.asarray(poses), fg_idx,
                full_idx)
    mask, crop, full = unpack_scene_products(packed, height, width)
    return mask[:n_poses], crop[:n_poses], full[:n_poses]


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "splat_radius"))
def render_depth_from_points_sorted_many(points_world, poses, K, height: int,
                                         width: int, splat_radius: int = 1):
    """:func:`render_depth_from_points_many` with the sort-based fragment
    reducer instead of the scatter-min z-buffer (same output; see
    _reduce_min_fragments)."""
    hw = height * width
    pts = jnp.asarray(points_world, jnp.float32)
    Kf = jnp.asarray(K, jnp.float32)

    def body(c, pose):
        world_to_cam = invert_se3(pose)
        pts_cam = transform_points(world_to_cam, pts)
        z = pts_cam[:, 2]
        proj = pts_cam @ Kf.T
        denom = jnp.where(jnp.abs(proj[:, 2]) < 1e-9, 1e-9, proj[:, 2])
        u = proj[:, 0] / denom
        v = proj[:, 1] / denom
        in_front = z > 1e-6
        flats, vals = [], []
        for du in range(-splat_radius, splat_radius + 1):
            for dv in range(-splat_radius, splat_radius + 1):
                ui = jnp.round(u).astype(jnp.int32) + du
                vi = jnp.round(v).astype(jnp.int32) + dv
                ok = in_front & (ui >= 0) & (ui < width) & (vi >= 0) & (vi < height)
                flats.append(jnp.where(ok, vi * width + ui, hw))
                vals.append(jnp.where(ok, z, INVALID_DEPTH))
        depth = _reduce_min_fragments(jnp.concatenate(flats),
                                      jnp.concatenate(vals), hw)
        return c, depth.reshape(height, width)

    _, depths = jax.lax.scan(body, 0, jnp.asarray(poses, jnp.float32))
    return depths


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "splat_radius"))
def render_depth_from_points_many(points_world, poses, K, height: int,
                                  width: int, splat_radius: int = 1):
    """:func:`render_depth_from_points` for a stack of poses in ONE dispatch
    (lax.scan) — a whole scene's renders per host round trip.

    :param poses: [P, 4, 4]
    :return: [P, H, W] float32
    """
    def body(c, pose):
        return c, render_depth_from_points(points_world, pose, K, height,
                                           width, splat_radius=splat_radius)

    _, depths = jax.lax.scan(body, 0, jnp.asarray(poses, jnp.float32))
    return depths


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "tile", "chunk"))
def render_depth_from_mesh_many(vertices_world, faces, poses, K, height: int,
                                width: int, tile: int = 8,
                                chunk: int = 65536):
    """:func:`render_depth_from_mesh` for a stack of poses in ONE dispatch.

    :param poses: [P, 4, 4]
    :return: [P, H, W] float32
    """
    def body(c, pose):
        return c, render_depth_from_mesh(vertices_world, faces, pose, K,
                                         height, width, tile=tile,
                                         chunk=chunk)

    _, depths = jax.lax.scan(body, 0, jnp.asarray(poses, jnp.float32))
    return depths


def projected_face_extents(vertices_world, faces, camera_to_world, K,
                           height: int, width: int):
    """Host-side screen-space bbox extent (max of width/height, px) of every
    face under one pose. Faces with a vertex behind the camera or whose bbox
    misses the viewport return 0 (the rasterizer culls / never shows them).
    Used to detect tile truncation (the rasterizer only fills a static
    ``tile`` x ``tile`` block per triangle)."""
    import numpy as np

    V = np.asarray(vertices_world, np.float64)
    T = np.asarray(camera_to_world, np.float64)
    R, t = T[:3, :3], T[:3, 3]
    pts_cam = (V - t) @ R  # R^T (V - t)
    z = pts_cam[:, 2]
    proj = pts_cam @ np.asarray(K, np.float64).T
    denom = np.where(np.abs(proj[:, 2]) < 1e-9, 1e-9, proj[:, 2])
    u = proj[:, 0] / denom
    v = proj[:, 1] / denom

    f = np.asarray(faces, np.int64)
    tu, tv, tz = u[f], v[f], z[f]
    in_front = np.all(tz > 1e-6, axis=1)
    u0, u1 = tu.min(axis=1), tu.max(axis=1)
    v0, v1 = tv.min(axis=1), tv.max(axis=1)
    on_screen = (u1 >= 0) & (u0 < width) & (v1 >= 0) & (v0 < height)
    ext = np.maximum(u1 - u0, v1 - v0) + 1.0
    return np.where(in_front & on_screen, ext, 0.0)


def pick_raster_tile(vertices_world, faces, poses, K, height: int, width: int,
                     min_tile: int = 8, max_tile: int = 64):
    """Choose the smallest power-of-two ``tile`` covering every visible
    triangle's screen bbox across ``poses`` (the z-buffer scatter cost scales
    with tile^2, so auto-selection beats a blanket large tile). Logs a
    warning with the truncated-face count when the needed tile exceeds
    ``max_tile`` — the silent-truncation failure mode this guards against is
    coarse/close meshes rendered with the TSDF-scale default."""
    import logging

    import numpy as np

    poses = np.asarray(poses, np.float64)
    if poses.ndim == 2:
        poses = poses[None]
    max_ext = 0.0
    worst = None
    for pose in poses:
        ext = projected_face_extents(vertices_world, faces, pose, K,
                                     height, width)
        m = float(ext.max()) if ext.size else 0.0
        if m > max_ext:
            max_ext, worst = m, ext
    tile = min_tile
    while tile < max_ext and tile < max_tile:
        tile *= 2
    if max_ext > tile:
        n_trunc = int((worst > tile).sum())
        logging.getLogger(__name__).warning(
            "mesh rasterization: %d faces project larger than the maximum "
            "tile (%d px; largest %.0f px) and will render truncated — "
            "subdivide the mesh or raise max_tile", n_trunc, tile, max_ext)
    return tile


def mesh_vertices_from_ply(path: str):
    """Vertices only (back-compat wrapper around :func:`read_ply_mesh`)."""
    return read_ply_mesh(path)[0]


def read_ply_mesh(path: str):
    """Minimal ASCII/binary-little-endian PLY reader (the reference loads
    fusion_mesh.ply via VTK): vertices + triangular faces.

    :return: (vertices [N, 3] float32, faces [F, 3] int32 or None when the
        file has no face element — point-splat rendering handles that case)
    """
    import numpy as np

    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            header.append(line)
            if line == "end_header":
                break
        n_vertex = 0
        n_face = 0
        fmt = "ascii"
        props = []
        face_list_types = ("uchar", "int")
        reading_vertex_props = False
        for line in header:
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element vertex"):
                n_vertex = int(line.split()[-1])
                reading_vertex_props = True
            elif line.startswith("element face"):
                n_face = int(line.split()[-1])
                reading_vertex_props = False
            elif line.startswith("element"):
                reading_vertex_props = False
            elif line.startswith("property") and reading_vertex_props:
                parts = line.split()
                props.append((parts[-1], parts[1]))
            elif line.startswith("property list"):
                parts = line.split()  # property list <count_t> <index_t> name
                face_list_types = (parts[2], parts[3])

        type_map = {
            "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
            "uchar": "u1", "uint8": "u1", "char": "i1", "int8": "i1",
            "short": "i2", "ushort": "u2", "int": "i4", "uint": "u4",
            "int32": "i4", "uint32": "u4",
        }
        if fmt == "ascii":
            rows = []
            for _ in range(n_vertex):
                rows.append([float(x) for x in f.readline().split()[:3]])
            verts = np.asarray(rows, np.float32).reshape(n_vertex, 3)
            faces = None
            if n_face:
                frows = []
                for _ in range(n_face):
                    vals = [int(x) for x in f.readline().split()]
                    if vals[0] == 3:  # triangles only
                        frows.append(vals[1:4])
                faces = np.asarray(frows, np.int32).reshape(-1, 3)
            return verts, faces

        dtype = np.dtype([(name, "<" + type_map[t]) for name, t in props])
        data = np.frombuffer(f.read(dtype.itemsize * n_vertex), dtype=dtype)
        verts = np.stack(
            [data["x"].astype(np.float32), data["y"].astype(np.float32),
             data["z"].astype(np.float32)], axis=-1,
        )
        faces = None
        if n_face:
            fdtype = np.dtype([
                ("n", "<" + type_map[face_list_types[0]]),
                ("idx", "<" + type_map[face_list_types[1]], (3,)),
            ])
            raw = f.read(fdtype.itemsize * n_face)
            fdata = np.frombuffer(raw, dtype=fdtype, count=n_face)
            if not np.all(fdata["n"] == 3):
                raise ValueError(
                    f"non-triangular faces in {path} (counts "
                    f"{np.unique(fdata['n'])}); triangulate the mesh first")
            faces = fdata["idx"].astype(np.int32)
        return verts, faces
