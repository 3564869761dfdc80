"""Pallas kernels vs the XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdc_tpu.ops.matching import best_matches_batch
from pdc_tpu.ops.pallas_kernels import pallas_best_match


@pytest.mark.parametrize("hw,q,d", [(2048, 8, 3), (3072, 16, 8), (5000, 4, 3)])
def test_pallas_best_match_matches_xla(hw, q, d):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    res_flat = jax.random.normal(k1, (hw, d))
    queries = jax.random.normal(k2, (q, d))

    idx, dist = pallas_best_match(res_flat, queries, interpret=True)

    d2 = jnp.sum((res_flat[:, None, :] - queries[None, :, :]) ** 2, axis=-1)
    expect_idx = np.asarray(jnp.argmin(d2, axis=0))
    expect_dist = np.sqrt(np.asarray(jnp.min(d2, axis=0)))

    np.testing.assert_array_equal(np.asarray(idx), expect_idx)
    np.testing.assert_allclose(np.asarray(dist), expect_dist, rtol=1e-3, atol=1e-4)


def test_pallas_best_match_padding_safe():
    """HW not divisible by the tile: padded sentinel pixels must never win."""
    hw = 2048 + 77
    res_flat = jnp.zeros((hw, 3)).at[hw - 1].set(jnp.array([5.0, 5.0, 5.0]))
    queries = jnp.array([[5.0, 5.0, 5.0]])
    idx, dist = pallas_best_match(res_flat, queries, interpret=True)
    assert int(idx[0]) == hw - 1
    assert float(dist[0]) < 1e-3
