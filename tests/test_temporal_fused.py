"""Channel-major fused temporal attention (kernels/temporal_fused.py) vs the
XLA reference math, in Pallas interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lavie_tpu.kernels.attention import dot_product_attention
from lavie_tpu.kernels.temporal_fused import (
    channel_permutation,
    pick_layout,
    rope_tables_cmajor,
    temporal_attention_cmajor,
    temporal_fused_supported,
)
from lavie_tpu.nn.embeddings import apply_rope_half, rope_half_frequencies


def reference(q_cm, k_cm, v_cm, bias, cos, sin, scale, heads):
    """Same math as nn.attention.TemporalAttention's XLA path, on
    standard-basis channel-major inputs."""
    c, b, f, s = q_cm.shape
    d = c // heads

    def rows(x):  # (C,B,F,S) → (B·S, F, H, D)
        return jnp.transpose(x, (1, 3, 2, 0)).reshape(b * s, f, heads, d)

    q = apply_rope_half(rows(q_cm), cos, sin)
    k = apply_rope_half(rows(k_cm), cos, sin)
    out = dot_product_attention(q, k, v=rows(v_cm), bias=bias, scale=scale,
                                implementation="xla")
    return jnp.transpose(out.reshape(b, s, f, c), (3, 0, 2, 1))


@pytest.mark.parametrize("version", ["2", "4", "5"])
@pytest.mark.parametrize(
    "f,heads,d,rope,s",
    [
        (4, 2, 8, 4, 128),   # tiny
        (8, 2, 64, 32, 128),  # vsr-like head shape
        (8, 2, 16, 8, 256),   # multi-lane-block grid
        (5, 2, 40, 32, 128),  # odd frame count, base head_dim
    ],
)
def test_matches_xla_reference(f, heads, d, rope, s, version, monkeypatch):
    # pin the kernel version (v4/v5 fall back to v2 on non-pow2 shapes)
    monkeypatch.setenv("LAVIE_TF_V5", "1" if version == "5" else "0")
    monkeypatch.setenv("LAVIE_TF_V4", "1" if version == "4" else "0")
    c = heads * d
    scale = d**-0.5
    assert temporal_fused_supported(f, heads, d, s)
    _, hg = pick_layout(c, f, s, heads)
    perm = channel_permutation(heads, d, hg)
    inv = np.argsort(perm)
    rng = np.random.RandomState(0)
    q, k, v = [jnp.asarray(rng.randn(c, 1, f, s), jnp.float32) for _ in range(3)]
    bias = jnp.asarray(rng.randn(heads, f, f).astype(np.float32) * 0.2)
    cos_np, sin_np = rope_half_frequencies(f, rope)
    cs = jnp.asarray(rope_tables_cmajor(f, heads, d, rope, hg, cos_np, sin_np))

    out = temporal_attention_cmajor(
        q[perm], k[perm], v[perm], bias, cs,
        heads=heads, scale=scale, rope_dim=rope, interpret=True,
    )[inv]

    cos = jnp.asarray(cos_np)[:, None, :]
    sin = jnp.asarray(sin_np)[:, None, :]
    ref = reference(q, k, v, bias, cos, sin, scale, heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_plain_variant_no_rope_no_bias():
    f, heads, d, s = 8, 2, 16, 128
    c = heads * d
    scale = d**-0.5
    rng = np.random.RandomState(1)
    q, k, v = [jnp.asarray(rng.randn(c, 1, f, s), jnp.float32) for _ in range(3)]
    cs = jnp.ones((c, 2 * f), jnp.float32)
    _, hg = pick_layout(c, f, s, heads)
    perm = channel_permutation(heads, d, hg)
    inv = np.argsort(perm)
    out = temporal_attention_cmajor(
        q[perm], k[perm], v[perm], None, cs,
        heads=heads, scale=scale, rope_dim=0, interpret=True,
    )[inv]

    def rows(x):
        return jnp.transpose(x, (1, 3, 2, 0)).reshape(s, f, heads, d)

    ref = dot_product_attention(rows(q), rows(k), rows(v), scale=scale,
                                implementation="xla")
    ref = jnp.transpose(ref.reshape(1, s, f, c), (3, 0, 2, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_unsupported_shapes():
    # d=64 at 61 frames blows the VMEM estimate even at hg=1
    assert not temporal_fused_supported(61, 8, 64, 2560)
    assert not temporal_fused_supported(8, 8, 63, 2560)  # unaligned head_dim
    assert not temporal_fused_supported(8, 8, 64, 100)  # untileable positions
    assert not temporal_fused_supported(65, 8, 40, 2560)  # above the frame cap


def test_tsr_long_frame_shape_supported():
    """TSR's f=61 d=40 runs the kernel at hg=1 (measured in-model win:
    _apply_temporal 27.4 → 20.7 ms per L0 block)."""
    assert temporal_fused_supported(61, 8, 40, 2560)
    blk, hg = pick_layout(8 * 40, 61, 2560, 8)
    assert (blk, hg) == (128, 1)


@pytest.mark.slow  # 61-frame interpret run (~24s); short-frame variants stay fast
def test_long_frame_hg1_matches_xla(monkeypatch):
    """Correctness of the f=61 hg=1 long-frame path (v5 only — the v2
    fallback's f² unroll is prohibitively slow under interpret)."""
    monkeypatch.setenv("LAVIE_TF_V5", "1")
    f, heads, d, s = 61, 1, 40, 128
    c = heads * d
    scale = d**-0.5
    assert temporal_fused_supported(f, heads, d, s)
    rng = np.random.RandomState(2)
    q, k, v = [jnp.asarray(rng.randn(c, 1, f, s), jnp.float32) for _ in range(3)]
    cs = jnp.ones((c, 2 * f), jnp.float32)
    out = temporal_attention_cmajor(
        q, k, v, None, cs, heads=heads, scale=scale, rope_dim=0,
        interpret=True,
    )

    def rows(x):
        return jnp.transpose(x, (1, 3, 2, 0)).reshape(s, f, heads, d)

    ref = dot_product_attention(rows(q), rows(k), rows(v), scale=scale,
                                implementation="xla")
    ref = jnp.transpose(ref.reshape(1, s, f, c), (3, 0, 2, 1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_permutation_roundtrip():
    for heads, d, hg in [(8, 64, 2), (8, 40, 2), (8, 128, 1), (2, 16, 2)]:
        perm = channel_permutation(heads, d, hg)
        assert sorted(perm.tolist()) == list(range(heads * d))


@pytest.mark.parametrize("variant", ["rope_relbias", "plain"])
def test_module_channel_major_matches_standard_path(monkeypatch, variant):
    """The integrated TemporalAttention.channel_major path (weights read via
    .variables, rope tables in the module's basis, out-proj bias) must match
    the standard rows path. Init must also succeed with the fused path
    enabled (it reads params that don't exist while initializing — the
    transformer block gates on is_initializing)."""
    import flax.linen as nn

    import lavie_tpu.kernels.attention as katt
    import lavie_tpu.kernels.temporal_fused as ktf
    from lavie_tpu.nn.attention import TemporalAttention
    from lavie_tpu.nn.transformer import BasicTransformerBlock

    monkeypatch.setenv("LAVIE_TEMPORAL_FUSED", "1")
    monkeypatch.setattr(katt, "_on_tpu", lambda: True)
    real = ktf.temporal_attention_cmajor
    monkeypatch.setattr(
        ktf, "temporal_attention_cmajor",
        lambda *a, **kw: real(*a, **{**kw, "interpret": True}),
    )

    b, f, s, heads, d = 1, 8, 128, 2, 16
    c = heads * d
    attn = TemporalAttention(query_dim=c, heads=heads, head_dim=d,
                             variant=variant, rope_dim=8)
    rng = np.random.RandomState(2)
    rows = jnp.asarray(rng.randn(b * s, f, c), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), rows)
    # non-zero out-proj so the comparison is meaningful
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.randn(*p.shape), jnp.float32) * 0.05, params
    )
    ref = attn.apply(params, rows)  # (B·S, F, C)
    x4 = jnp.transpose(rows.reshape(b, s, f, c), (0, 2, 1, 3))  # (B,F,S,C)
    assert attn.apply(params, f, s, method=TemporalAttention.channel_major_supported)
    out = attn.apply(params, x4, method=TemporalAttention.channel_major)
    out_rows = jnp.transpose(out, (0, 2, 1, 3)).reshape(b * s, f, c)
    np.testing.assert_allclose(
        np.asarray(out_rows), np.asarray(ref), rtol=2e-4, atol=2e-4
    )

    # init through the full transformer block with the fused path enabled
    block = BasicTransformerBlock(
        dim=c, heads=heads, head_dim=d, cross_attention_dim=c,
        temporal_attention=variant, rope_dim=8,
    )
    bp = block.init(
        jax.random.PRNGKey(1),
        jnp.zeros((b * f, s, c)), jnp.zeros((b * f, 7, c)), f,
    )
    assert "params" in bp
