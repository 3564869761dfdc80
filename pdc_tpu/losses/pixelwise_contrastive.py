"""Pixelwise contrastive loss — validity-masked, fully jittable.

Rebuild of ``pixelwise_contrastive_loss.py:5-411``. The reference operates on
dynamically-sized index lists gathered with ``index_select``; here every index
set has a static size plus a boolean validity mask, and invalid entries
contribute exactly zero. Counts (``num_matches``, ``num_hard_negatives``)
become mask sums, so the scaled losses equal the reference's values whenever
the valid subset equals the reference's pruned set.

Shapes (single sample; the train step vmaps over the batch):
    image_pred:   [H*W, D]  flattened descriptor image, n = v*W + u
    indices:      [N]       int32 flat pixel indices
    valid:        [N]       bool
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Mirrors the reference's ``loss_function`` config block
    (config/dense_correspondence/training/training.yaml)."""

    M_masked: float = 0.5
    M_background: float = 0.5
    M_pixel: float = 50.0
    match_loss_weight: float = 1.0
    non_match_loss_weight: float = 1.0
    use_l2_pixel_loss_on_masked_non_matches: bool = False
    use_l2_pixel_loss_on_background_non_matches: bool = False
    scale_by_hard_negatives: bool = True
    scale_by_hard_negatives_DIFFERENT_OBJECT: bool = True
    alpha_triplet: float = 0.1

    @staticmethod
    def from_dict(d: dict) -> "LossConfig":
        fields = {f.name for f in dataclasses.fields(LossConfig)}
        return LossConfig(**{k: v for k, v in d.items() if k in fields})


def _gather(image_pred, indices, valid):
    """Safe descriptor gather: invalid rows read index 0 but are masked out
    downstream. Gathered rows are upcast to float32 so loss numerics are
    independent of the network's compute dtype (the model returns bf16 under
    compute_dtype=bfloat16; the gather output is tiny, so this is free).

    Uses :func:`pdc_tpu.ops.scatter_free.take_rows`: the autodiff backward of
    a plain ``jnp.take`` is a scatter-add that TPUs execute at ~0.1 us/row —
    measured as the largest single cost of the train-step loss. take_rows
    keeps the forward gather but computes the dense cotangent as factorized
    one-hot matmuls on the MXU (3.5x faster at the loss's row counts)."""
    from pdc_tpu.ops.scatter_free import take_rows

    idx = jnp.where(valid, indices, 0).astype(jnp.int32)
    return take_rows(image_pred, idx).astype(jnp.float32)


def match_loss_from_rows(da, db, valid):
    """:func:`match_loss` on pre-gathered float32 rows."""
    sq = jnp.sum(jnp.square(da - db), axis=-1)
    num = jnp.sum(valid)
    loss = jnp.sum(jnp.where(valid, sq, 0.0)) / jnp.maximum(num, 1)
    return loss, num


def hinge_from_rows(da, db, valid, M: float = 0.5, invert: bool = False):
    """(summed hinge^2, num_hard) over pre-gathered row pairs — the core of
    :func:`non_match_loss_descriptor_only`, factored out so callers can reuse
    one gather across several margins (the composer evaluates the blind set
    under three different (M, invert) configurations)."""
    dist = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(da - db), axis=-1), 1e-24))
    if invert:
        hinge = jnp.maximum(dist - M, 0.0)
    else:
        hinge = jnp.maximum(M - dist, 0.0)
    loss_vec = jnp.where(valid, jnp.square(hinge), 0.0)
    num_hard = jnp.sum(valid & (hinge > 0.0))
    return jnp.sum(loss_vec), num_hard


def match_loss(image_a_pred, image_b_pred, matches_a, matches_b, valid):
    """1/num_matches * sum ||d_a - d_b||_2^2 over valid matches
    (reference ``match_loss``, :131-167).

    :return: (loss scalar, num_valid scalar)
    """
    da = _gather(image_a_pred, matches_a, valid)
    db = _gather(image_b_pred, matches_b, valid)
    sq = jnp.sum(jnp.square(da - db), axis=-1)
    num = jnp.sum(valid)
    loss = jnp.sum(jnp.where(valid, sq, 0.0)) / jnp.maximum(num, 1)
    return loss, num


def non_match_descriptor_loss(
    image_a_pred, image_b_pred, non_matches_a, non_matches_b, valid,
    M: float = 0.5, invert: bool = False,
):
    """Per-element hinge max(0, M - ||d_a - d_b||)^2 (or the inverted
    "at most M" variant) — reference :170-213.

    :return: (loss_vec [N] with invalid entries zeroed, num_hard_negatives)
    """
    da = _gather(image_a_pred, non_matches_a, valid)
    db = _gather(image_b_pred, non_matches_b, valid)
    dist = jnp.sqrt(jnp.maximum(jnp.sum(jnp.square(da - db), axis=-1), 1e-24))
    if invert:
        hinge = jnp.maximum(dist - M, 0.0)
    else:
        hinge = jnp.maximum(M - dist, 0.0)
    loss_vec = jnp.where(valid, jnp.square(hinge), 0.0)
    num_hard = jnp.sum(valid & (hinge > 0.0))
    return loss_vec, num_hard


def non_match_loss_descriptor_only(
    image_a_pred, image_b_pred, non_matches_a, non_matches_b, valid,
    M: float = 0.5, invert: bool = False,
):
    """Summed hinge loss (reference :271-304).

    :return: (loss scalar, num_hard_negatives)
    """
    loss_vec, num_hard = non_match_descriptor_loss(
        image_a_pred, image_b_pred, non_matches_a, non_matches_b, valid,
        M=M, invert=invert,
    )
    return jnp.sum(loss_vec), num_hard


def l2_pixel_loss(matches_b, non_matches_b, valid, image_width: int,
                  M_pixel: float = 50.0):
    """Pixel-space weighting in [0, 1]: 1/M_pixel * min(||uv_gt - uv||, M_pixel)
    (reference :307-334).

    :param matches_b: [N] flat ground-truth index per non-match (already
        replicated to the non-match multiplicity)
    :param non_matches_b: [N] flat sampled non-match index
    """
    def to_uv(flat):
        flat = flat.astype(jnp.float32)
        w = float(image_width)
        return jnp.stack([jnp.mod(flat, w), jnp.floor(flat / w)], axis=-1)

    gt_uv = to_uv(jnp.where(valid, matches_b, 0))
    uv = to_uv(jnp.where(valid, non_matches_b, 0))
    dist = jnp.linalg.norm(gt_uv - uv, axis=-1)
    return jnp.where(valid, jnp.minimum(dist, M_pixel) / M_pixel, 0.0)


def non_match_loss_with_l2_pixel_norm(
    image_a_pred, image_b_pred, matches_b_rep, non_matches_a, non_matches_b,
    valid, image_width: int, M_descriptor: float = 0.5, M_pixel: float = 50.0,
):
    """Descriptor hinge weighted by pixel distance (reference :215-269).

    :param matches_b_rep: [N] the ground-truth match index replicated per
        non-match (row-major repetition, as the reference's
        ``create_non_matches`` produces)
    :return: (loss scalar, num_hard_negatives)
    """
    loss_vec, num_hard = non_match_descriptor_loss(
        image_a_pred, image_b_pred, non_matches_a, non_matches_b, valid,
        M=M_descriptor,
    )
    pix = l2_pixel_loss(matches_b_rep, non_matches_b, valid, image_width, M_pixel)
    return jnp.sum(loss_vec * pix), num_hard


def triplet_loss(
    image_a_pred, image_b_pred, matches_a_rep, matches_b_rep,
    non_matches_b, valid, alpha: float = 0.1,
):
    """sum max(0, ||d_a - d_b_match||^2 - ||d_a - d_b_nonmatch||^2 + alpha)
    / num_non_matches (reference ``get_triplet_loss``, :103-129).

    All index arrays are at non-match multiplicity [N]; ``matches_*_rep`` are
    the match indices replicated per non-match.
    """
    da = _gather(image_a_pred, matches_a_rep, valid)
    db_m = _gather(image_b_pred, matches_b_rep, valid)
    db_n = _gather(image_b_pred, non_matches_b, valid)
    pos = jnp.sum(jnp.square(da - db_m), axis=-1)
    neg = jnp.sum(jnp.square(da - db_n), axis=-1)
    per = jnp.maximum(pos - neg + alpha, 0.0)
    num = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, per, 0.0)) / num


def get_loss_original(
    image_a_pred, image_b_pred, matches_a, matches_b,
    non_matches_a, non_matches_b,
    matches_valid=None, non_matches_valid=None,
    M_margin: float = 0.5, non_match_loss_weight: float = 1.0,
):
    """The reference's pinned legacy loss (``get_loss_original``,
    pixelwise_contrastive_loss.py:357-411, pegged to sha 87abdb6) — kept for
    regression comparisons against pre-2018 checkpoints. Differs from the
    current loss in the non-match hinge: ``max(0, M - ||d_a - d_b||^2)``
    (margin against the SQUARED distance, not the squared hinge of the
    distance) and mean normalization by the full non-match count rather than
    hard-negative scaling.

    :param image_*_pred: [HW, D] flattened descriptor images
    :param matches_* / non_matches_*: [N] flat pixel indices
    :param *_valid: optional [N] bool masks (static-shape pdc_tpu batches;
        None = all valid, the reference's dynamic-shape behavior)
    :return: (loss, match_loss, non_match_loss) scalars
    """
    if matches_valid is None:
        matches_valid = jnp.ones(matches_a.shape[0], bool)
    if non_matches_valid is None:
        non_matches_valid = jnp.ones(non_matches_a.shape[0], bool)

    da = _gather(image_a_pred, matches_a, matches_valid)
    db = _gather(image_b_pred, matches_b, matches_valid)
    n_m = jnp.maximum(jnp.sum(matches_valid), 1)
    match_loss = jnp.sum(jnp.where(
        matches_valid, jnp.sum(jnp.square(da - db), axis=-1), 0.0)) / n_m

    na = _gather(image_a_pred, non_matches_a, non_matches_valid)
    nb = _gather(image_b_pred, non_matches_b, non_matches_valid)
    d2 = jnp.sum(jnp.square(na - nb), axis=-1)
    hinge = jnp.maximum(M_margin - d2, 0.0)
    n_n = jnp.maximum(jnp.sum(non_matches_valid), 1)
    non_match_loss = non_match_loss_weight * jnp.sum(
        jnp.where(non_matches_valid, hinge, 0.0)) / n_n

    return match_loss + non_match_loss, match_loss, non_match_loss
