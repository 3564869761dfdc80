"""Matrix (pooled) loss vs naive numpy double loop + estimator consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from pdc_tpu.losses.matrix_loss import (
    MatrixSampleIndices,
    compose_loss_matrix,
    pooled_non_match_loss,
)
from pdc_tpu.losses.pixelwise_contrastive import LossConfig

W, H, D = 8, 6, 3
HW = W * H


def test_pooled_hinge_matches_numpy(rng):
    a = rng.randn(HW, D).astype(np.float32)
    b = rng.randn(HW, D).astype(np.float32)
    Nm, P = 5, 7
    matches_a = rng.randint(0, HW, Nm)
    pool_b = rng.randint(0, HW, P)
    uv_b = rng.randint(0, [W, H], size=(Nm, 2)).astype(np.float32)
    M = 0.5

    loss, num_hard = pooled_non_match_loss(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(matches_a),
        jnp.asarray(uv_b), jnp.ones(Nm, bool),
        jnp.asarray(pool_b), jnp.ones(P, bool), W, M=M,
    )

    expected = 0.0
    expected_hard = 0
    for i in range(Nm):
        for j in range(P):
            pu, pv = pool_b[j] % W, pool_b[j] // W
            if abs(uv_b[i, 0] - pu) < 1 and abs(uv_b[i, 1] - pv) < 1:
                continue  # collision-masked
            dist = np.linalg.norm(a[matches_a[i]] - b[pool_b[j]])
            h = max(M - dist, 0.0)
            expected += h * h
            if h > 0:
                expected_hard += 1
    np.testing.assert_allclose(float(loss), expected, rtol=1e-4, atol=1e-6)
    assert int(num_hard) == expected_hard


def test_pooled_hinge_l2_pixel_weighting(rng):
    a = rng.randn(HW, D).astype(np.float32)
    b = rng.randn(HW, D).astype(np.float32)
    matches_a = np.array([0])
    pool_b = np.array([3 * W + 4])  # pixel (4, 3)
    uv_b = np.array([[0.0, 0.0]], np.float32)
    loss_plain, _ = pooled_non_match_loss(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(matches_a),
        jnp.asarray(uv_b), jnp.ones(1, bool), jnp.asarray(pool_b),
        jnp.ones(1, bool), W, M=5.0,
    )
    loss_wt, _ = pooled_non_match_loss(
        jnp.asarray(a), jnp.asarray(b), jnp.asarray(matches_a),
        jnp.asarray(uv_b), jnp.ones(1, bool), jnp.asarray(pool_b),
        jnp.ones(1, bool), W, M=5.0, use_l2_pixel_loss=True, M_pixel=50.0,
    )
    # pixel distance is the 3-4-5 triangle -> weight 5/50
    np.testing.assert_allclose(float(loss_wt), float(loss_plain) * 0.1, rtol=1e-5)


def test_pooled_invalid_masked_out(rng):
    a = rng.randn(HW, D).astype(np.float32)
    b = rng.randn(HW, D).astype(np.float32)
    loss, num_hard = pooled_non_match_loss(
        jnp.asarray(a), jnp.asarray(b), jnp.zeros(4, jnp.int32),
        jnp.zeros((4, 2), jnp.float32), jnp.zeros(4, bool),
        jnp.zeros(6, jnp.int32), jnp.ones(6, bool), W, M=0.5,
    )
    assert float(loss) == 0.0 and int(num_hard) == 0


def _matrix_sample(rng, match_type=0, n=6, pm=10, pb=10, blind=8):
    return MatrixSampleIndices(
        matches_a=jnp.asarray(rng.randint(0, HW, n)),
        matches_b=jnp.asarray(rng.randint(0, HW, n)),
        matches_uv_b=jnp.asarray(rng.randint(0, [W, H], size=(n, 2)).astype(np.float32)),
        matches_valid=jnp.ones(n, bool),
        masked_pool_b=jnp.asarray(rng.randint(0, HW, pm)),
        masked_pool_valid=jnp.ones(pm, bool),
        background_pool_b=jnp.asarray(rng.randint(0, HW, pb)),
        background_pool_valid=jnp.ones(pb, bool),
        blind_nm_a=jnp.asarray(rng.randint(0, HW, blind)),
        blind_nm_b=jnp.asarray(rng.randint(0, HW, blind)),
        blind_nm_valid=jnp.ones(blind, bool),
        match_type=jnp.asarray(match_type, jnp.int32),
    )


def test_compose_matrix_structure(rng):
    a = jnp.asarray(rng.randn(HW, D), jnp.float32)
    b = jnp.asarray(rng.randn(HW, D), jnp.float32)
    cfg = LossConfig()
    s = _matrix_sample(rng)
    out = compose_loss_matrix(a, b, s, cfg, W)
    assert float(out.loss) > 0
    assert np.isfinite(float(out.match_loss))

    # empty -> exact zero
    s_empty = _matrix_sample(rng, match_type=-1)
    out0 = compose_loss_matrix(a, b, s_empty, cfg, W)
    assert float(out0.loss) == 0.0


def test_compose_matrix_grad(rng):
    cfg = LossConfig()
    s = _matrix_sample(rng)
    a = jnp.asarray(rng.randn(HW, D), jnp.float32)
    b = jnp.asarray(rng.randn(HW, D), jnp.float32)
    g = jax.jit(jax.grad(lambda x, y: compose_loss_matrix(x, y, s, cfg, W).loss))(a, b)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_matrix_vs_legacy_estimator_agreement(rng):
    """For the same match set, the matrix estimator must agree with the
    legacy per-pair estimator in expectation (both are hard-negative-
    normalized means of the same hinge distribution)."""
    from pdc_tpu.losses.pixelwise_contrastive import non_match_loss_descriptor_only

    a = jnp.asarray(rng.randn(HW, D), jnp.float32)
    b = jnp.asarray(rng.randn(HW, D), jnp.float32)
    M = 1.2
    Nm = 32

    matches_a = rng.randint(0, HW, Nm)
    # legacy: 200 iid non-matches per match
    legacy_vals = []
    for trial in range(5):
        nm_a = np.repeat(matches_a, 200)
        nm_b = rng.randint(0, HW, Nm * 200)
        s, h = non_match_loss_descriptor_only(
            a, b, jnp.asarray(nm_a), jnp.asarray(nm_b),
            jnp.ones(Nm * 200, bool), M=M,
        )
        legacy_vals.append(float(s) / max(int(h), 1))

    matrix_vals = []
    for trial in range(5):
        pool = rng.randint(0, HW, 300)
        s, h = pooled_non_match_loss(
            a, b, jnp.asarray(matches_a),
            jnp.asarray(np.full((Nm, 2), -10.0, np.float32)),  # no collisions
            jnp.ones(Nm, bool), jnp.asarray(pool), jnp.ones(300, bool), W, M=M,
        )
        matrix_vals.append(float(s) / max(int(h), 1))

    # both are finite-sample ratio estimators of the same quantity; the
    # tolerance covers their joint sampling noise at this size
    np.testing.assert_allclose(np.mean(legacy_vals), np.mean(matrix_vals), rtol=0.05)
