"""Fused Pallas pooled-hinge kernel vs the XLA reference formulation.

Runs in interpret mode (CPU); on TPU the same kernel compiles natively and
`pooled_non_match_loss_from_rows` dispatches to it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdc_tpu.losses.matrix_loss import pooled_non_match_loss_from_rows
from pdc_tpu.ops.pallas_loss import pooled_hinge

W_IMG = 64


def make_case(rng, Nm=700, P=256, D=3, valid_frac=0.8):
    da = jnp.asarray(rng.standard_normal((Nm, D)), jnp.float32) * 0.3
    db = jnp.asarray(rng.standard_normal((P, D)), jnp.float32) * 0.3
    uv_b = jnp.asarray(
        np.stack([rng.integers(0, W_IMG, Nm), rng.integers(0, 48, Nm)], 1),
        jnp.float32)
    mvalid = jnp.asarray(rng.random(Nm) < valid_frac)
    pool_b = jnp.asarray(
        rng.integers(0, W_IMG * 48, P), jnp.int32)
    pvalid = jnp.asarray(rng.random(P) < valid_frac)
    return da, db, uv_b, mvalid, pool_b, pvalid


def xla_loss(da, db, uv_b, mvalid, pool_b, pvalid, M=0.5,
             use_pix=False, M_pixel=50.0):
    return pooled_non_match_loss_from_rows(
        da, db, uv_b, mvalid, pool_b, pvalid, W_IMG, M=M,
        use_l2_pixel_loss=use_pix, M_pixel=M_pixel)


def pallas_loss(da, db, uv_b, mvalid, pool_b, pvalid, M=0.5,
                use_pix=False, M_pixel=50.0):
    pu = (pool_b % W_IMG).astype(jnp.float32)
    pv = (pool_b // W_IMG).astype(jnp.float32)
    return pooled_hinge(
        da, db, uv_b[:, 0].astype(jnp.float32),
        uv_b[:, 1].astype(jnp.float32), mvalid.astype(jnp.float32),
        pu, pv, pvalid.astype(jnp.float32), M, use_pix, M_pixel, True)


@pytest.mark.parametrize("use_pix", [False, True])
def test_forward_matches_xla(use_pix):
    rng = np.random.default_rng(0)
    case = make_case(rng)
    l_ref, h_ref = xla_loss(*case, use_pix=use_pix)
    l_pal, h_pal = pallas_loss(*case, use_pix=use_pix)
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=1e-5)
    assert float(h_pal) == float(h_ref)


def test_grads_match_xla():
    rng = np.random.default_rng(1)
    da, db, uv_b, mvalid, pool_b, pvalid = make_case(rng)

    def f_ref(da, db):
        return xla_loss(da, db, uv_b, mvalid, pool_b, pvalid)[0]

    def f_pal(da, db):
        return pallas_loss(da, db, uv_b, mvalid, pool_b, pvalid)[0]

    g_ref = jax.grad(f_ref, argnums=(0, 1))(da, db)
    g_pal = jax.grad(f_pal, argnums=(0, 1))(da, db)
    np.testing.assert_allclose(np.asarray(g_pal[0]), np.asarray(g_ref[0]),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g_pal[1]), np.asarray(g_ref[1]),
                               atol=1e-5, rtol=1e-4)


def test_grads_match_xla_pixel_weighted():
    rng = np.random.default_rng(2)
    da, db, uv_b, mvalid, pool_b, pvalid = make_case(rng, Nm=300, P=128)

    def f_ref(da):
        return xla_loss(da, db, uv_b, mvalid, pool_b, pvalid,
                        use_pix=True, M_pixel=20.0)[0]

    def f_pal(da):
        return pallas_loss(da, db, uv_b, mvalid, pool_b, pvalid,
                           use_pix=True, M_pixel=20.0)[0]

    np.testing.assert_allclose(
        np.asarray(jax.grad(f_pal)(da)), np.asarray(jax.grad(f_ref)(da)),
        atol=1e-5, rtol=1e-4)


def test_collision_exclusion():
    """A pool pixel within 1 px (u AND v) of a row's true match contributes
    nothing for that row."""
    rng = np.random.default_rng(3)
    da, db, uv_b, mvalid, pool_b, pvalid = make_case(rng, Nm=64, P=128,
                                                     valid_frac=1.0)
    # make pool entry 0 collide with row 0's true match
    u0, v0 = int(uv_b[0, 0]), int(uv_b[0, 1])
    pool_b = pool_b.at[0].set(v0 * W_IMG + u0)
    l_ref, h_ref = xla_loss(da, db, uv_b, mvalid, pool_b, pvalid)
    l_pal, h_pal = pallas_loss(da, db, uv_b, mvalid, pool_b, pvalid)
    np.testing.assert_allclose(float(l_pal), float(l_ref), rtol=1e-5)
    assert float(h_pal) == float(h_ref)


def test_all_invalid_is_zero():
    rng = np.random.default_rng(4)
    da, db, uv_b, _, pool_b, _ = make_case(rng, Nm=64, P=128)
    mvalid = jnp.zeros((64,), bool)
    pvalid = jnp.ones((128,), bool)
    l_pal, h_pal = pallas_loss(da, db, uv_b, mvalid, pool_b, pvalid)
    assert float(l_pal) == 0.0 and float(h_pal) == 0.0


def test_vmap_matches_loop():
    rng = np.random.default_rng(5)
    cases = [make_case(rng, Nm=200, P=128) for _ in range(3)]
    stacked = [jnp.stack(x) for x in zip(*cases)]

    def one(da, db, uv_b, mvalid, pool_b, pvalid):
        return pallas_loss(da, db, uv_b, mvalid, pool_b, pvalid)[0]

    batched = jax.vmap(one)(*stacked)
    for i, case in enumerate(cases):
        np.testing.assert_allclose(float(batched[i]), float(one(*case)),
                                   rtol=1e-5)


def test_identical_descriptors_zero_grad():
    """d2 clamped at 1e-24: coincident descriptors must not blow up the
    gradient (matches autodiff of the clamped XLA formulation)."""
    D = 3
    da = jnp.zeros((8, D), jnp.float32)
    db = jnp.zeros((16, D), jnp.float32)
    uv_b = jnp.full((8, 2), 30.0, jnp.float32)
    mvalid = jnp.ones((8,), bool)
    pool_b = jnp.arange(16, dtype=jnp.int32)  # far from (30, 30)
    pvalid = jnp.ones((16,), bool)

    g = jax.grad(
        lambda da: pallas_loss(da, db, uv_b, mvalid, pool_b, pvalid)[0]
    )(da)
    assert bool(jnp.all(jnp.isfinite(g)))
    np.testing.assert_allclose(np.asarray(g), 0.0)
