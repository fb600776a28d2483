"""Blockwise attention kernel vs dense reference math (kernel runs in
interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from calodiffusion_tpu.ops.pallas_attention import (
    _dense_attention,
    blockwise_attention,
)


@pytest.mark.parametrize("n,block_q,block_k", [
    (256, 64, 64),
    (640, 128, 128),   # N % block_q != 0 -> Q padding path
    (45 * 50 * 2, 512, 512),  # ds3-like divisibility (N=4500 -> block_k 500?)
])
def test_blockwise_matches_dense(n, block_q, block_k):
    b, h, d = 2, 4, 32
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, h, n, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, n, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, n, d), jnp.float32)

    dense = _dense_attention(q, k, v, d ** -0.5)
    blocked = blockwise_attention(q, k, v, block_q=block_q, block_k=block_k,
                                  force=True)
    np.testing.assert_allclose(np.asarray(blocked), np.asarray(dense),
                               atol=2e-5, rtol=1e-4)


def test_small_n_uses_dense_fallback():
    b, h, n, d = 1, 2, 128, 16
    q = k = v = jnp.ones((b, h, n, d))
    out = blockwise_attention(q, k, v)
    # uniform attention over identical values: output == v
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-5)
