"""Fused transformer-block kernels (kernels/cross_block.py) vs the unfused
XLA composition, interpret mode (CPU-runnable)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lavie_tpu.kernels.cross_block import (
    cross_attention_head,
    cross_block_supported,
    fused_ln_cross_attention,
    tail_supported,
    transformer_tail,
)


def _ln(x, gamma, beta, eps=1e-5):
    mean = jnp.mean(x, axis=-1, dtype=jnp.float32, keepdims=True)
    mean_sq = jnp.mean(
        jnp.square(x.astype(jnp.float32)), axis=-1, dtype=jnp.float32, keepdims=True
    )
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    xn = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
    return xn * gamma.astype(x.dtype) + beta.astype(x.dtype)


def _attn_ref(x, gamma, beta, wq, wo, bo, k, v, heads, scale):
    b, s, c = x.shape
    d = c // heads
    xn = _ln(x, gamma, beta)
    q = (xn @ wq).reshape(b, s, heads, d)
    kk = k.reshape(b, -1, heads, d)
    vv = v.reshape(b, -1, heads, d)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, kk) * scale
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vv).reshape(b, s, c)
    return (out @ wo) + bo + x


def _params(key, c, lkv, b):
    ks = jax.random.split(key, 7)
    return (
        jax.random.normal(ks[0], (c,)) * 0.2 + 1.0,
        jax.random.normal(ks[1], (c,)) * 0.2,
        jax.random.normal(ks[2], (c, c)) * c**-0.5,
        jax.random.normal(ks[3], (c, c)) * c**-0.5,
        jax.random.normal(ks[4], (c,)) * 0.1,
        jax.random.normal(ks[5], (b, lkv, c)),
        jax.random.normal(ks[6], (b, lkv, c)),
    )


@pytest.mark.parametrize("lkv", [77, 128])
def test_single_matches_reference(lkv):
    b, s, c, heads = 2, 256, 256, 4
    x = jax.random.normal(jax.random.PRNGKey(0), (b, s, c))
    p = _params(jax.random.PRNGKey(1), c, lkv, b)
    scale = (c // heads) ** -0.5
    ref = _attn_ref(x, *p, heads, scale)
    out = fused_ln_cross_attention(
        x, p[0], p[1], p[2], p[3], p[4], p[5], p[6],
        heads=heads, scale=scale, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_head_matches_reference():
    b, s, c, heads, lkv = 2, 256, 256, 4, 77
    x = jax.random.normal(jax.random.PRNGKey(2), (b, s, c))
    a1 = _params(jax.random.PRNGKey(3), c, lkv, b)
    a2 = _params(jax.random.PRNGKey(4), c, lkv, b)
    wpi = jax.random.normal(jax.random.PRNGKey(5), (c, c)) * c**-0.5
    bpi = jax.random.normal(jax.random.PRNGKey(6), (c,)) * 0.1
    scale = (c // heads) ** -0.5
    xp = (x @ wpi) + bpi
    ref = _attn_ref(_attn_ref(xp, *a1, heads, scale), *a2, heads, scale)
    out = cross_attention_head(
        x, wpi, bpi, a1, a2, heads=heads, scale=scale, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_tail_matches_reference():
    b, s, c = 2, 256, 256
    inner = 4 * c
    ks = jax.random.split(jax.random.PRNGKey(7), 10)
    x = jax.random.normal(ks[0], (b, s, c))
    r = jax.random.normal(ks[1], (b, s, c))
    g3 = jax.random.normal(ks[2], (c,)) * 0.2 + 1.0
    b3 = jax.random.normal(ks[3], (c,)) * 0.2
    w0 = jax.random.normal(ks[4], (c, 2 * inner)) * c**-0.5
    b0 = jax.random.normal(ks[5], (2 * inner,)) * 0.1
    w2 = jax.random.normal(ks[6], (inner, c)) * inner**-0.5
    b2 = jax.random.normal(ks[7], (c,)) * 0.1
    wpo = jax.random.normal(ks[8], (c, c)) * c**-0.5
    bpo = jax.random.normal(ks[9], (c,)) * 0.1

    xn = _ln(x, g3, b3)
    h = (xn @ w0) + b0
    hidden, gate = h[:, :, :inner], h[:, :, inner:]
    import flax.linen as nn

    y = (hidden * nn.gelu(gate, approximate=False)) @ w2 + b2 + x
    ref = (y @ wpo) + bpo + r

    out = transformer_tail(
        x, r, g3, b3, w0, b0, w2, b2, wpo, bpo, interpret=True
    )
    # polynomial erf inside the kernel: |err| < 1.5e-7 per element, amplified
    # by the two downstream GEMMs
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3, rtol=1e-4)


def test_gating():
    assert cross_block_supported(40960 * 8, 512, 8, 64, 77)
    assert not cross_block_supported(40960, 512, 8, 128, 77)  # d must be 64
    assert not cross_block_supported(40960, 320, 8, 40, 77)  # lane alignment
    assert not cross_block_supported(100, 512, 8, 64, 77)  # too few tokens
    assert not cross_block_supported(40960, 512, 8, 64, 256)  # kv too long
    assert tail_supported(40960 * 8, 512, 2048)
    assert not tail_supported(40960, 1024, 4096)  # weights exceed VMEM budget


def test_fused_only_cross_transformer_matches_unfused(monkeypatch):
    """Whole-Transformer3D equivalence: the fused only-cross path (forced,
    interpret mode) vs the standard XLA composition, fp32."""
    from lavie_tpu.nn.transformer import Transformer3D

    c, heads = 256, 4  # head_dim 64 — the kernel's shape class
    model = Transformer3D(
        in_channels=c,
        heads=heads,
        head_dim=c // heads,
        cross_attention_dim=96,
        only_cross_attention=True,
        norm_num_groups=8,
        temporal_attention="rope_relbias",
        use_temporal_resblock=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16, c))
    ehs = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 96))
    params = model.init(jax.random.PRNGKey(2), x, ehs)

    monkeypatch.setenv("LAVIE_CROSS_BLOCK", "0")
    ref = model.apply(params, x, ehs)
    monkeypatch.setenv("LAVIE_CROSS_BLOCK", "force")
    out = model.apply(params, x, ehs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-4)


def test_single_all_negative_scores():
    """Regression: with every real score strongly negative, the old padded-kv
    denominator correction cancelled to 0 in fp32 and produced NaN; the −1e9
    mask must keep the output finite and equal to the reference.

    Construction: gamma=0, beta=1 makes LN(x) == 1 for every token, wq=I
    makes q == 1, and k == −1 makes every real score exactly −scale·d < −17
    — under the old code m=0 (padded zeros), Σexp == the subtracted padded
    mass in fp32, denominator 0 → NaN."""
    b, s, c, heads, lkv = 1, 256, 256, 4, 77
    x = jax.random.normal(jax.random.PRNGKey(7), (b, s, c))
    gamma = jnp.zeros((c,))
    beta = jnp.ones((c,))
    wq = jnp.eye(c)
    wo = jnp.eye(c)
    bo = jnp.zeros((c,))
    k = -3.0 * jnp.ones((b, lkv, c))  # per-head score = −3·64·scale = −24
    v = jax.random.normal(jax.random.PRNGKey(8), (b, lkv, c))
    scale = (c // heads) ** -0.5
    ref = _attn_ref(x, gamma, beta, wq, wo, bo, k, v, heads, scale)
    out = fused_ln_cross_attention(
        x, gamma, beta, wq, wo, bo, k, v, heads=heads, scale=scale,
        interpret=True,
    )
    assert np.isfinite(np.asarray(out)).all(), "NaN/inf in fused output"
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4
    )
