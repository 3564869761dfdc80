"""Loss composition and dispatch over sample types.

Rebuild of ``loss_composer.py:7-218``. The reference dispatches on the sample
type with python ``if``s (one compiled graph per branch, batch_size 1); here
every branch is computed with validity masks and the result is selected with
``jnp.where`` on the per-sample ``match_type``, so a *mixed* batch of sample
types runs in one jitted step — the key enabler for large-batch data-parallel
training that the reference's design precluded.

Sample type codes match the reference enum (``SpartanDatasetDataType``):
    0 SINGLE_OBJECT_WITHIN_SCENE   matches + masked + background + blind
    1 SINGLE_OBJECT_ACROSS_SCENE   inverted blind hinge (same-object pull)
    2 DIFFERENT_OBJECT             blind repulsion only
    3 MULTI_OBJECT                 same as 0
    4 SYNTHETIC_MULTI_OBJECT       same as 0
   -1 EMPTY                        contributes zero loss (reference
                                   training.py:304-306 'empty data, continue')
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pdc_tpu.losses.pixelwise_contrastive import (
    LossConfig,
    match_loss,
    non_match_loss_descriptor_only,
    non_match_loss_with_l2_pixel_norm,
)

MATCH_TYPE_SINGLE_OBJECT_WITHIN_SCENE = 0
MATCH_TYPE_SINGLE_OBJECT_ACROSS_SCENE = 1
MATCH_TYPE_DIFFERENT_OBJECT = 2
MATCH_TYPE_MULTI_OBJECT = 3
MATCH_TYPE_SYNTHETIC_MULTI_OBJECT = 4
MATCH_TYPE_EMPTY = -1


class SampleIndices(NamedTuple):
    """Flat pixel indices + validity for one training sample (one image pair).

    The ``*_rep`` ground-truth indices needed by the l2-pixel weighting are
    the ``matches_b`` entries replicated to non-match multiplicity.
    """

    matches_a: jnp.ndarray          # [Nm]
    matches_b: jnp.ndarray          # [Nm]
    matches_valid: jnp.ndarray      # [Nm] bool
    masked_nm_a: jnp.ndarray        # [Nmm]
    masked_nm_b: jnp.ndarray        # [Nmm]
    masked_nm_valid: jnp.ndarray    # [Nmm]
    masked_nm_gt_b: jnp.ndarray     # [Nmm] replicated matches_b
    background_nm_a: jnp.ndarray    # [Nbg]
    background_nm_b: jnp.ndarray    # [Nbg]
    background_nm_valid: jnp.ndarray
    background_nm_gt_b: jnp.ndarray
    blind_nm_a: jnp.ndarray         # [Nbl]
    blind_nm_b: jnp.ndarray         # [Nbl]
    blind_nm_valid: jnp.ndarray
    match_type: jnp.ndarray         # scalar int32


class LossTerms(NamedTuple):
    loss: jnp.ndarray
    match_loss: jnp.ndarray
    masked_non_match_loss: jnp.ndarray
    background_non_match_loss: jnp.ndarray
    blind_non_match_loss: jnp.ndarray


def compose_loss(image_a_pred, image_b_pred, s: SampleIndices,
                 cfg: LossConfig, image_width: int) -> LossTerms:
    """Full loss for one sample; all branches masked + selected by type.

    :param image_a_pred, image_b_pred: [H*W, D]
    :return: LossTerms of scalars (the scaled per-term losses match the
        reference's returned diagnostics, loss_composer.py:143)
    """
    is_empty = s.match_type == MATCH_TYPE_EMPTY
    is_within = (
        (s.match_type == MATCH_TYPE_SINGLE_OBJECT_WITHIN_SCENE)
        | (s.match_type == MATCH_TYPE_MULTI_OBJECT)
        | (s.match_type == MATCH_TYPE_SYNTHETIC_MULTI_OBJECT)
    )
    is_across = s.match_type == MATCH_TYPE_SINGLE_OBJECT_ACROSS_SCENE
    is_diff = s.match_type == MATCH_TYPE_DIFFERENT_OBJECT

    # --- within-scene branch (loss_composer.py:70-143) ---------------------
    m_loss, _ = match_loss(
        image_a_pred, image_b_pred, s.matches_a, s.matches_b, s.matches_valid
    )

    if cfg.use_l2_pixel_loss_on_masked_non_matches:
        masked_loss, n_masked_hard = non_match_loss_with_l2_pixel_norm(
            image_a_pred, image_b_pred, s.masked_nm_gt_b,
            s.masked_nm_a, s.masked_nm_b, s.masked_nm_valid,
            image_width, M_descriptor=cfg.M_masked, M_pixel=cfg.M_pixel,
        )
    else:
        masked_loss, n_masked_hard = non_match_loss_descriptor_only(
            image_a_pred, image_b_pred, s.masked_nm_a, s.masked_nm_b,
            s.masked_nm_valid, M=cfg.M_masked,
        )

    if cfg.use_l2_pixel_loss_on_background_non_matches:
        bg_loss, n_bg_hard = non_match_loss_with_l2_pixel_norm(
            image_a_pred, image_b_pred, s.background_nm_gt_b,
            s.background_nm_a, s.background_nm_b, s.background_nm_valid,
            image_width, M_descriptor=cfg.M_background, M_pixel=cfg.M_pixel,
        )
    else:
        bg_loss, n_bg_hard = non_match_loss_descriptor_only(
            image_a_pred, image_b_pred, s.background_nm_a, s.background_nm_b,
            s.background_nm_valid, M=cfg.M_background,
        )

    blind_loss_w, n_blind_hard_w = non_match_loss_descriptor_only(
        image_a_pred, image_b_pred, s.blind_nm_a, s.blind_nm_b,
        s.blind_nm_valid, M=cfg.M_masked,
    )

    total_hard = jnp.maximum(n_masked_hard + n_bg_hard, 1)
    if cfg.scale_by_hard_negatives:
        scale = total_hard
        masked_scaled = masked_loss / jnp.maximum(n_masked_hard, 1)
        bg_scaled = bg_loss / jnp.maximum(n_bg_hard, 1)
        blind_scaled_w = blind_loss_w / jnp.maximum(n_blind_hard_w, 1)
    else:
        n_masked = jnp.maximum(jnp.sum(s.masked_nm_valid), 1)
        n_bg = jnp.maximum(jnp.sum(s.background_nm_valid), 1)
        n_blind = jnp.maximum(jnp.sum(s.blind_nm_valid), 1)
        scale = n_masked + n_bg
        masked_scaled = masked_loss / n_masked
        bg_scaled = bg_loss / n_bg
        blind_scaled_w = blind_loss_w / n_blind

    non_match = (masked_loss + bg_loss) / scale
    within_loss = cfg.match_loss_weight * m_loss + cfg.non_match_loss_weight * non_match

    # --- DIFFERENT_OBJECT branch (loss_composer.py:168-191) ----------------
    diff_blind, n_diff_hard = non_match_loss_descriptor_only(
        image_a_pred, image_b_pred, s.blind_nm_a, s.blind_nm_b,
        s.blind_nm_valid, M=cfg.M_background,
    )
    if cfg.scale_by_hard_negatives_DIFFERENT_OBJECT:
        diff_scale = jnp.maximum(n_diff_hard, 1)
    else:
        diff_scale = jnp.maximum(jnp.sum(s.blind_nm_valid), 1)
    diff_loss = diff_blind / diff_scale

    # --- SINGLE_OBJECT_ACROSS_SCENE branch (loss_composer.py:193-212) ------
    across_blind, n_across_hard = non_match_loss_descriptor_only(
        image_a_pred, image_b_pred, s.blind_nm_a, s.blind_nm_b,
        s.blind_nm_valid, M=cfg.M_masked, invert=True,
    )
    if cfg.scale_by_hard_negatives:
        across_scale = jnp.maximum(n_across_hard, 1)
    else:
        across_scale = jnp.maximum(jnp.sum(s.blind_nm_valid), 1)
    across_loss = across_blind / across_scale

    # --- select by type ------------------------------------------------------
    zero = jnp.zeros(())
    loss = jnp.where(
        is_empty, zero,
        jnp.where(is_within, within_loss,
                  jnp.where(is_diff, diff_loss,
                            jnp.where(is_across, across_loss, zero))),
    )
    blind_reported = jnp.where(
        is_within, blind_scaled_w,
        jnp.where(is_diff, diff_loss, jnp.where(is_across, across_loss, zero)),
    )
    w = jnp.where(is_within & ~is_empty, 1.0, 0.0)
    return LossTerms(
        loss=loss,
        match_loss=m_loss * w,
        masked_non_match_loss=masked_scaled * w,
        background_non_match_loss=bg_scaled * w,
        blind_non_match_loss=jnp.where(is_empty, zero, blind_reported),
    )
