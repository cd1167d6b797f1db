"""Fused short-kv cross-attention kernel vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lavie_tpu.kernels.attention import _xla_attention
from lavie_tpu.kernels.cross_attention import cross_attention, cross_supported_shape


@pytest.mark.parametrize("s,kv,h,d", [(1024, 77, 2, 64), (2048, 77, 4, 40), (1024, 128, 2, 128)])
def test_cross_attention_matches_xla(s, kv, h, d):
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    b = 2
    q = jax.random.normal(kq, (b, s, h, d), jnp.float32)
    k = jax.random.normal(kk, (b, kv, h, d), jnp.float32)
    v = jax.random.normal(kv_, (b, kv, h, d), jnp.float32)
    scale = d ** -0.5
    ref = _xla_attention(q, k, v, None, scale)
    out = cross_attention(q, k, v, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_cross_attention_bf16():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (1, 1024, 2, 64), jnp.bfloat16)
    k = jax.random.normal(key, (1, 77, 2, 64), jnp.bfloat16)
    v = jax.random.normal(key, (1, 77, 2, 64), jnp.bfloat16)
    scale = 64 ** -0.5
    ref = _xla_attention(q, k, v, None, scale).astype(jnp.float32)
    out = cross_attention(q, k, v, scale=scale, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_gating():
    q = jnp.zeros((1, 2048, 2, 64))
    assert cross_supported_shape(q, jnp.zeros((1, 77, 2, 64)))
    assert not cross_supported_shape(jnp.zeros((1, 100, 2, 64)), jnp.zeros((1, 77, 2, 64)))
    assert not cross_supported_shape(q, jnp.zeros((1, 512, 2, 64)))
    # ragged query length that no 128-multiple block divides
    assert not cross_supported_shape(jnp.zeros((1, 1100, 2, 64)), jnp.zeros((1, 77, 2, 64)))
