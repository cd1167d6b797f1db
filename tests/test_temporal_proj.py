"""Channel-major boundary kernels (kernels/temporal_proj.py) vs the XLA
composition, interpret mode (CPU-runnable)."""

import jax
import jax.numpy as jnp
import numpy as np

from lavie_tpu.kernels.temporal_proj import (
    ln_qkv_cmajor,
    ln_qkv_supported,
    out_proj_residual,
    out_proj_supported,
)


def _ln(x, gamma, beta, eps=1e-5):
    f32 = jnp.float32
    mean = jnp.mean(x, axis=-1, dtype=f32, keepdims=True)
    mean_sq = jnp.mean(jnp.square(x.astype(f32)), axis=-1, dtype=f32, keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    return (x - mean.astype(x.dtype)) * inv.astype(x.dtype) * gamma.astype(
        x.dtype
    ) + beta.astype(x.dtype)


def test_ln_qkv_matches_reference():
    b, f, s, c = 2, 4, 256, 128
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    x = jax.random.normal(ks[0], (b, f, s, c))
    gamma = jax.random.normal(ks[1], (c,)) * 0.1 + 1.0
    beta = jax.random.normal(ks[2], (c,)) * 0.1
    wq, wk, wv = (jax.random.normal(k, (c, c)) * c**-0.5 for k in ks[3:6])

    xn = _ln(x, gamma, beta)
    refs = [
        jax.lax.dot_general(w.T, xn, (((1,), (3,)), ((), ())))
        for w in (wq, wk, wv)
    ]
    outs = ln_qkv_cmajor(x, gamma, beta, wq, wk, wv, interpret=True)
    for ref, out in zip(refs, outs):
        assert out.shape == (c, b, f, s)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
        )


def test_out_proj_residual_matches_reference():
    b, f, s, e, o = 2, 4, 256, 128, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    ocm = jax.random.normal(ks[0], (e, b, f, s))
    r = jax.random.normal(ks[1], (b, f, s, o))
    wo = jax.random.normal(ks[2], (e, o)) * e**-0.5
    bo = jax.random.normal(ks[3], (o,)) * 0.1
    ref = jax.lax.dot_general(ocm, wo, (((0,), (0,)), ((), ()))) + bo + r
    out = out_proj_residual(ocm, r, wo, bo, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_supported_gates():
    assert ln_qkv_supported(8, 40960, 512, 512)
    assert out_proj_supported(8, 40960, 512, 512)
    assert not ln_qkv_supported(8, 40961, 512, 512)
    assert not ln_qkv_supported(8, 40960, 520, 512)
    assert not out_proj_supported(40, 40960, 4096, 4096)
