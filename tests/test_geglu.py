"""Fused GEGLU kernel vs the plain XLA path."""

import jax
import jax.numpy as jnp
import numpy as np

from lavie_tpu.kernels.geglu import geglu, geglu_supported_shape
from lavie_tpu.nn.transformer import FeedForward


def _ref(x, w0, b0, w2, b2):
    proj = x @ w0 + b0
    hidden, gate = jnp.split(proj, 2, axis=-1)
    return (hidden * jax.nn.gelu(gate, approximate=False)) @ w2 + b2


def test_geglu_matches_reference():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    n, c, inner = 512, 256, 1024
    x = jax.random.normal(ks[0], (n, c), jnp.float32)
    w0 = jax.random.normal(ks[1], (c, 2 * inner), jnp.float32) * 0.05
    b0 = jax.random.normal(ks[2], (2 * inner,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[3], (inner, c), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[4], (c,), jnp.float32) * 0.1
    ref = _ref(x, w0, b0, w2, b2)
    out = geglu(x, w0, b0, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=5e-4)


def test_geglu_3d_and_bf16():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (2, 256, 128), jnp.bfloat16)
    w0 = (jax.random.normal(key, (128, 1024), jnp.float32) * 0.05).astype(jnp.bfloat16)
    b0 = jnp.zeros((1024,), jnp.float32)
    w2 = (jax.random.normal(key, (512, 128), jnp.float32) * 0.05).astype(jnp.bfloat16)
    b2 = jnp.zeros((128,), jnp.float32)
    ref = _ref(x.astype(jnp.float32), w0.astype(jnp.float32), b0, w2.astype(jnp.float32), b2)
    out = geglu(x, w0, b0, w2, b2, interpret=True).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0.15, rtol=0.1)


def test_geglu_c320_partial_lane_tile():
    """C=320 (TSR/base L0) is NOT a lane multiple — Mosaic masks the partial
    last tile; the kernel must still match the reference."""
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 5)
    n, c, inner = 512, 320, 1280
    x = jax.random.normal(ks[0], (n, c), jnp.float32)
    w0 = jax.random.normal(ks[1], (c, 2 * inner), jnp.float32) * 0.05
    b0 = jax.random.normal(ks[2], (2 * inner,), jnp.float32) * 0.1
    w2 = jax.random.normal(ks[3], (inner, c), jnp.float32) * 0.05
    b2 = jax.random.normal(ks[4], (c,), jnp.float32) * 0.1
    ref = _ref(x, w0, b0, w2, b2)
    out = geglu(x, w0, b0, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-4, rtol=5e-4)


def test_supported_shape_gating():
    assert geglu_supported_shape(40960 * 8, 512, 2048)
    assert geglu_supported_shape(4096, 320, 1280)  # TSR/base L0 (partial lane tile)
    assert not geglu_supported_shape(1000, 512, 2048)  # ragged N
    assert not geglu_supported_shape(4096, 260, 1280)  # not sublane aligned
    assert not geglu_supported_shape(4096, 64, 256)  # below one lane tile
    assert not geglu_supported_shape(4096, 1280, 5120)  # weights too big for VMEM
    assert not geglu_supported_shape(4096, 1024, 4096)  # weights too big for VMEM


def test_feedforward_param_tree_unchanged():
    """The fused FeedForward must keep nn.Dense param paths for the converter."""
    ff = FeedForward(dim=64)
    p = ff.init(jax.random.PRNGKey(0), jnp.zeros((2, 8, 64)))["params"]
    assert set(p.keys()) == {"net_0_proj", "net_2"}
    assert set(p["net_0_proj"].keys()) == {"kernel", "bias"}
    assert p["net_0_proj"]["kernel"].shape == (64, 512)
    assert p["net_2"]["kernel"].shape == (256, 64)
    # fallback path numerics = plain dense GEGLU
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64))
    out = ff.apply({"params": p}, x)
    ref = _ref(x, p["net_0_proj"]["kernel"], p["net_0_proj"]["bias"],
               p["net_2"]["kernel"], p["net_2"]["bias"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)
