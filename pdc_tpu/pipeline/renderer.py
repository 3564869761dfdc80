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


def mesh_vertices_from_ply(path: str):
    """Minimal ASCII/binary-little-endian PLY vertex reader (the reference
    loads fusion_mesh.ply via VTK; we only need vertices for point-splat
    rendering)."""
    import numpy as np

    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            header.append(line)
            if line == "end_header":
                break
        n_vertex = 0
        fmt = "ascii"
        props = []
        reading_vertex_props = False
        for line in header:
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element vertex"):
                n_vertex = int(line.split()[-1])
                reading_vertex_props = True
            elif line.startswith("element"):
                reading_vertex_props = False
            elif line.startswith("property") and reading_vertex_props:
                parts = line.split()
                props.append((parts[-1], parts[1]))

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
            return np.asarray(rows, np.float32)
        dtype = np.dtype([(name, "<" + type_map[t]) for name, t in props])
        data = np.frombuffer(f.read(dtype.itemsize * n_vertex), dtype=dtype)
        return np.stack(
            [data["x"].astype(np.float32), data["y"].astype(np.float32),
             data["z"].astype(np.float32)], axis=-1,
        )
