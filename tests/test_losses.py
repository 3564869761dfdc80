"""Loss layer vs hand-computed numpy values."""

import jax.numpy as jnp
import numpy as np
import pytest

from pdc_tpu.losses import (
    LossConfig,
    MATCH_TYPE_DIFFERENT_OBJECT,
    MATCH_TYPE_EMPTY,
    MATCH_TYPE_SINGLE_OBJECT_ACROSS_SCENE,
    MATCH_TYPE_SINGLE_OBJECT_WITHIN_SCENE,
    compose_loss,
    match_loss,
    non_match_descriptor_loss,
    non_match_loss_descriptor_only,
    triplet_loss,
)
from pdc_tpu.losses.composer import SampleIndices
from pdc_tpu.losses.pixelwise_contrastive import l2_pixel_loss

W, H, D = 8, 6, 3
HW = W * H


def _preds(rng):
    a = rng.randn(HW, D).astype(np.float32)
    b = rng.randn(HW, D).astype(np.float32)
    return jnp.asarray(a), jnp.asarray(b), a, b


def test_match_loss_matches_numpy(rng):
    ja, jb, a, b = _preds(rng)
    idx_a = np.array([0, 5, 17, 40])
    idx_b = np.array([3, 2, 30, 44])
    valid = np.array([True, True, True, False])

    loss, num = match_loss(ja, jb, jnp.asarray(idx_a), jnp.asarray(idx_b), jnp.asarray(valid))
    expected = np.mean(
        [np.sum((a[idx_a[i]] - b[idx_b[i]]) ** 2) for i in range(3)]
    )
    assert int(num) == 3
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def test_match_loss_all_invalid(rng):
    ja, jb, _, _ = _preds(rng)
    loss, num = match_loss(ja, jb, jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32),
                           jnp.zeros(4, bool))
    assert float(loss) == 0.0 and int(num) == 0


def test_non_match_hinge(rng):
    ja, jb, a, b = _preds(rng)
    idx_a = np.arange(10)
    idx_b = np.arange(10, 20)
    valid = np.ones(10, bool)
    M = 0.5

    loss_vec, num_hard = non_match_descriptor_loss(
        ja, jb, jnp.asarray(idx_a), jnp.asarray(idx_b), jnp.asarray(valid), M=M
    )
    dist = np.linalg.norm(a[idx_a] - b[idx_b], axis=1)
    expected = np.maximum(M - dist, 0) ** 2
    np.testing.assert_allclose(np.asarray(loss_vec), expected, rtol=1e-4, atol=1e-7)
    assert int(num_hard) == int((dist < M).sum())


def test_non_match_hinge_inverted(rng):
    ja, jb, a, b = _preds(rng)
    idx = np.arange(6)
    valid = np.ones(6, bool)
    M = 0.5
    loss, num_hard = non_match_loss_descriptor_only(
        ja, jb, jnp.asarray(idx), jnp.asarray(idx + 1), jnp.asarray(valid),
        M=M, invert=True,
    )
    dist = np.linalg.norm(a[idx] - b[idx + 1], axis=1)
    expected = (np.maximum(dist - M, 0) ** 2).sum()
    np.testing.assert_allclose(float(loss), expected, rtol=1e-4)
    assert int(num_hard) == int((dist > M).sum())


def test_l2_pixel_loss():
    # match at flat index 0 -> uv (0,0); non-match at flat index (v=3,u=4)
    gt = jnp.array([0, 0])
    nm = jnp.array([3 * W + 4, 0])
    valid = jnp.array([True, True])
    out = np.asarray(l2_pixel_loss(gt, nm, valid, W, M_pixel=50.0))
    np.testing.assert_allclose(out[0], 5.0 / 50.0, rtol=1e-6)  # 3-4-5 triangle
    assert out[1] == 0.0


def test_triplet_loss_positive(rng):
    ja, jb, a, b = _preds(rng)
    idx = np.arange(5)
    valid = np.ones(5, bool)
    out = triplet_loss(ja, jb, jnp.asarray(idx), jnp.asarray(idx),
                       jnp.asarray(idx + 7), jnp.asarray(valid), alpha=0.1)
    pos = np.sum((a[idx] - b[idx]) ** 2, axis=1)
    neg = np.sum((a[idx] - b[idx + 7]) ** 2, axis=1)
    expected = np.maximum(pos - neg + 0.1, 0).sum() / 5
    np.testing.assert_allclose(float(out), expected, rtol=1e-4)


def _sample(match_type, rng, n=6, nm=12, blind=10, all_valid=True):
    v = np.ones if all_valid else np.zeros
    return SampleIndices(
        matches_a=jnp.asarray(rng.randint(0, HW, n)),
        matches_b=jnp.asarray(rng.randint(0, HW, n)),
        matches_valid=jnp.asarray(v(n, bool)),
        masked_nm_a=jnp.asarray(rng.randint(0, HW, nm)),
        masked_nm_b=jnp.asarray(rng.randint(0, HW, nm)),
        masked_nm_valid=jnp.asarray(v(nm, bool)),
        masked_nm_gt_b=jnp.asarray(rng.randint(0, HW, nm)),
        background_nm_a=jnp.asarray(rng.randint(0, HW, nm)),
        background_nm_b=jnp.asarray(rng.randint(0, HW, nm)),
        background_nm_valid=jnp.asarray(v(nm, bool)),
        background_nm_gt_b=jnp.asarray(rng.randint(0, HW, nm)),
        blind_nm_a=jnp.asarray(rng.randint(0, HW, blind)),
        blind_nm_b=jnp.asarray(rng.randint(0, HW, blind)),
        blind_nm_valid=jnp.asarray(v(blind, bool)),
        match_type=jnp.asarray(match_type, jnp.int32),
    )


def test_compose_within_scene_structure(rng):
    ja, jb, a, b = _preds(rng)
    cfg = LossConfig()
    s = _sample(MATCH_TYPE_SINGLE_OBJECT_WITHIN_SCENE, rng)
    out = compose_loss(ja, jb, s, cfg, W)
    # loss = match + (masked_sum + bg_sum)/total_hard ; all terms finite > 0
    assert float(out.loss) > 0
    m, _ = match_loss(ja, jb, s.matches_a, s.matches_b, s.matches_valid)
    masked_sum, n_m = non_match_loss_descriptor_only(
        ja, jb, s.masked_nm_a, s.masked_nm_b, s.masked_nm_valid, M=cfg.M_masked)
    bg_sum, n_b = non_match_loss_descriptor_only(
        ja, jb, s.background_nm_a, s.background_nm_b, s.background_nm_valid,
        M=cfg.M_background)
    expected = float(m) + (float(masked_sum) + float(bg_sum)) / max(
        int(n_m) + int(n_b), 1)
    np.testing.assert_allclose(float(out.loss), expected, rtol=1e-5)


def test_compose_different_object(rng):
    ja, jb, a, b = _preds(rng)
    cfg = LossConfig()
    s = _sample(MATCH_TYPE_DIFFERENT_OBJECT, rng)
    out = compose_loss(ja, jb, s, cfg, W)
    blind_sum, n_hard = non_match_loss_descriptor_only(
        ja, jb, s.blind_nm_a, s.blind_nm_b, s.blind_nm_valid, M=cfg.M_background)
    expected = float(blind_sum) / max(int(n_hard), 1)
    np.testing.assert_allclose(float(out.loss), expected, rtol=1e-5)
    assert float(out.match_loss) == 0.0  # no match term for this type


def test_compose_across_scene_pulls_together(rng):
    ja, jb, a, b = _preds(rng)
    cfg = LossConfig()
    s = _sample(MATCH_TYPE_SINGLE_OBJECT_ACROSS_SCENE, rng)
    out = compose_loss(ja, jb, s, cfg, W)
    blind_sum, n_hard = non_match_loss_descriptor_only(
        ja, jb, s.blind_nm_a, s.blind_nm_b, s.blind_nm_valid,
        M=cfg.M_masked, invert=True)
    expected = float(blind_sum) / max(int(n_hard), 1)
    np.testing.assert_allclose(float(out.loss), expected, rtol=1e-5)


def test_compose_empty_sample(rng):
    ja, jb, _, _ = _preds(rng)
    s = _sample(MATCH_TYPE_EMPTY, rng)
    out = compose_loss(ja, jb, s, LossConfig(), W)
    assert float(out.loss) == 0.0


def test_compose_is_jittable_and_differentiable(rng):
    import jax

    cfg = LossConfig()
    s = _sample(MATCH_TYPE_SINGLE_OBJECT_WITHIN_SCENE, rng)

    def f(a, b):
        return compose_loss(a, b, s, cfg, W).loss

    ja, jb, _, _ = _preds(rng)
    g = jax.jit(jax.grad(f))(ja, jb)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_get_loss_original_oracle():
    """Legacy pinned loss vs a direct numpy transcription of the reference
    formula (pixelwise_contrastive_loss.py:357-411): margin against the
    SQUARED distance, mean over full counts."""
    import numpy as np

    from pdc_tpu.losses.pixelwise_contrastive import get_loss_original

    rng = np.random.RandomState(0)
    HW, D = 96, 3
    a = rng.randn(HW, D).astype(np.float32)
    b = rng.randn(HW, D).astype(np.float32)
    m_a = rng.randint(0, HW, 20)
    m_b = rng.randint(0, HW, 20)
    n_a = rng.randint(0, HW, 50)
    n_b = rng.randint(0, HW, 50)
    M = 0.5

    expect_match = np.mean(np.sum((a[m_a] - b[m_b]) ** 2, axis=1))
    d2 = np.sum((a[n_a] - b[n_b]) ** 2, axis=1)
    expect_nm = np.mean(np.maximum(M - d2, 0.0))

    loss, ml, nml = get_loss_original(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(m_a), jnp.asarray(m_b),
        jnp.asarray(n_a), jnp.asarray(n_b), M_margin=M)
    assert float(ml) == pytest.approx(expect_match, rel=1e-5)
    assert float(nml) == pytest.approx(expect_nm, rel=1e-5)
    assert float(loss) == pytest.approx(expect_match + expect_nm, rel=1e-5)

    # validity masking: invalid rows contribute nothing, counts shrink
    mv = np.zeros(20, bool); mv[:10] = True
    nv = np.zeros(50, bool); nv[:25] = True
    _, ml2, nml2 = get_loss_original(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(m_a), jnp.asarray(m_b),
        jnp.asarray(n_a), jnp.asarray(n_b),
        matches_valid=jnp.asarray(mv), non_matches_valid=jnp.asarray(nv),
        M_margin=M)
    expect_match2 = np.mean(np.sum((a[m_a[:10]] - b[m_b[:10]]) ** 2, axis=1))
    expect_nm2 = np.mean(np.maximum(M - d2[:25], 0.0))
    assert float(ml2) == pytest.approx(expect_match2, rel=1e-5)
    assert float(nml2) == pytest.approx(expect_nm2, rel=1e-5)
