"""On-device best-match search over descriptor images.

The reference pulls the whole [H, W, D] descriptor image to the host and runs
a numpy argmin per query (``dense_correspondence_network.py:488-550``) — the
single biggest perf loss in its inference path. Here the search stays on
device and is formulated for the MXU:

    dist2(p, q) = ||res[p]||^2 - 2 <res[p], q> + ||q||^2

so a batch of Q queries against HW pixels is one [HW, D] x [D, Q] matmul
followed by an argmin over the pixel axis. A Pallas kernel
(:mod:`pdc_tpu.ops.pallas_kernels`) streams the descriptor image through VMEM
tile-by-tile with a running min, avoiding the [HW, Q] distance matrix in HBM.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def norm_diffs_for_descriptor(descriptor, res):
    """Per-pixel L2 distance image between a descriptor and a descriptor image.

    :param descriptor: [D]
    :param res: [H, W, D]
    :return: [H, W] float32 (same as the reference's ``norm_diffs``,
        dense_correspondence_network.py:517)
    """
    d = jnp.asarray(descriptor, jnp.float32)
    res = jnp.asarray(res, jnp.float32)
    return jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(res - d), axis=-1), 0.0))


def best_match_for_descriptor(descriptor, res):
    """Single-query best match (reference ``find_best_match_for_descriptor``).

    :return: (uv [2] int32, best_dist scalar float32, norm_diffs [H, W])
    """
    H, W, _ = res.shape
    nd = norm_diffs_for_descriptor(descriptor, res)
    flat_idx = jnp.argmin(nd.reshape(-1))
    uv = jnp.stack([flat_idx % W, flat_idx // W]).astype(jnp.int32)
    return uv, nd.reshape(-1)[flat_idx], nd


def best_matches_batch(queries, res, mask=None, prefer_pallas: bool = True):
    """Batched best-match search: Q query descriptors against one image.

    MXU formulation — dist2 via a single matmul; argmin over the flattened
    pixel axis. With ``mask`` given, masked-out pixels get +1e6 before the
    argmin (the reference's masked best match, evaluation.py:1052-1059).

    On TPU the unmasked case dispatches to the streaming Pallas kernel
    (:func:`pdc_tpu.ops.pallas_kernels.pallas_best_match`) — measured 1.3x
    (Q=128) to 2.4x (Q=1024) faster than the XLA [HW, Q] formulation on a
    v5e at 640x480, with exact argmin agreement (BENCHMARKS.md round 2).

    :param queries: [Q, D]
    :param res: [H, W, D]
    :param mask: optional [H, W]; nonzero = allowed
    :return: (uv [Q, 2] int32, best_dist [Q] float32)
    """
    H, W, D = res.shape
    if (prefer_pallas and mask is None
            and jax.devices()[0].platform == "tpu"):
        from pdc_tpu.ops.pallas_kernels import pallas_best_match

        flat_idx, dist = pallas_best_match(res.reshape(H * W, D), queries)
        uv = jnp.stack([flat_idx % W, flat_idx // W], axis=-1).astype(jnp.int32)
        return uv, dist
    queries = jnp.asarray(queries, jnp.float32)
    res_flat = res.reshape(H * W, D).astype(jnp.float32)

    rnorm = jnp.sum(jnp.square(res_flat), axis=1)  # [HW]
    qnorm = jnp.sum(jnp.square(queries), axis=1)  # [Q]
    # [HW, Q] cross term on the MXU
    # precision=HIGHEST: the TPU MXU multiplies in bf16 by default, and the
    # rnorm - 2*cross + qnorm cancellation near zero amplifies that to
    # ~1e-1 distance error on near-matches (caught by bench.py's native
    # Pallas gate, round 5). D <= 16 makes this matmul bandwidth-bound, so
    # the extra passes are free; eval-facing distances must be fp32-true.
    cross = jnp.dot(res_flat, queries.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    dist2 = rnorm[:, None] - 2.0 * cross + qnorm[None, :]
    if mask is not None:
        blocked = (jnp.asarray(mask).reshape(-1) == 0).astype(jnp.float32)
        dist2 = dist2 + blocked[:, None] * 1e6
    flat_idx = jnp.argmin(dist2, axis=0)  # [Q]
    best = jnp.sqrt(jnp.maximum(jnp.take_along_axis(dist2, flat_idx[None, :], axis=0)[0], 0.0))
    uv = jnp.stack([flat_idx % W, flat_idx // W], axis=-1).astype(jnp.int32)
    return uv, best


def gaussian_heatmap_from_norm_diffs(norm_diffs, variance: float = 0.03):
    """exp(-d / variance) heatmap in [0, 1] (reference
    ``visualization.py:8-33``; colormapping stays host-side)."""
    return jnp.exp(-jnp.asarray(norm_diffs, jnp.float32) / variance)


# Pixel-axis-sharded argmin lives in pdc_tpu.parallel.sharded_train
# (make_pixel_sharded_best_match) — explicit shard_map + all_gather.
