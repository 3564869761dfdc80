"""take_rows: forward equals jnp.take; backward equals the scatter-add
cotangent (exactly, in both fp32 and bf16)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdc_tpu.ops.scatter_free import take_rows


@pytest.fixture
def data():
    HW, D, N = 3100, 3, 700
    p = jax.random.normal(jax.random.PRNGKey(0), (HW, D), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, HW, jnp.int32)
    return p, idx


def test_forward_equals_take(data):
    p, idx = data
    np.testing.assert_array_equal(
        np.asarray(take_rows(p, idx)), np.asarray(jnp.take(p, idx, axis=0))
    )


def test_grad_equals_scatter_add(data):
    p, idx = data

    def lf_ref(x):
        return jnp.sum(jnp.sin(jnp.take(x, idx, axis=0)) ** 2)

    def lf_new(x):
        return jnp.sum(jnp.sin(take_rows(x, idx)) ** 2)

    g_ref = jax.grad(lf_ref)(p)
    g_new = jax.grad(lf_new)(p)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-6, rtol=1e-6)


def test_grad_bf16_exact(data):
    p, idx = data
    pb = p.astype(jnp.bfloat16)

    def lf(take):
        def f(x):
            return jnp.sum(take(x, idx).astype(jnp.float32) ** 2)
        return f

    g_ref = jax.grad(lf(lambda x, i: jnp.take(x, i, axis=0)))(pb)
    g_new = jax.grad(lf(take_rows))(pb)
    assert g_new.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(g_new.astype(jnp.float32)),
        np.asarray(g_ref.astype(jnp.float32)),
    )


def test_vmap_grad(data):
    p, idx = data
    B = 3
    pb = jnp.stack([p * (i + 1) for i in range(B)])
    idxb = jnp.stack([jnp.roll(idx, i) for i in range(B)])

    def batched(take):
        def f(x):
            return jnp.sum(jax.vmap(
                lambda xx, ii: jnp.sum(take(xx, ii) ** 2))(x, idxb))
        return f

    g_ref = jax.grad(batched(lambda x, i: jnp.take(x, i, axis=0)))(pb)
    g_new = jax.grad(batched(take_rows))(pb)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-5, rtol=1e-5)


def test_duplicate_indices_accumulate(data):
    p, _ = data
    idx = jnp.array([5, 5, 5, 7], jnp.int32)
    g = jax.grad(lambda x: jnp.sum(take_rows(x, idx)))(p)
    np.testing.assert_allclose(np.asarray(g[5]), 3.0)
    np.testing.assert_allclose(np.asarray(g[7]), 1.0)
    assert float(jnp.sum(jnp.abs(g))) == pytest.approx(4.0 * p.shape[1])


def test_small_hw_under_lane_tile():
    HW, D = 200, 4
    p = jax.random.normal(jax.random.PRNGKey(2), (HW, D))
    idx = jax.random.randint(jax.random.PRNGKey(3), (50,), 0, HW, jnp.int32)
    g_ref = jax.grad(lambda x: jnp.sum(jnp.take(x, idx, axis=0) ** 3))(p)
    g_new = jax.grad(lambda x: jnp.sum(take_rows(x, idx) ** 3))(p)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               atol=1e-6, rtol=1e-6)
