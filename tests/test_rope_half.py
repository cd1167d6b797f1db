"""Half-split RoPE re-basis: equivalence with the reference's interleaved
layout under the converter's q/k channel permutation."""

import jax
import jax.numpy as jnp
import numpy as np

from lavie_tpu.nn.embeddings import (
    apply_rope,
    apply_rope_half,
    rope_channel_permutation,
    rope_frequencies,
    rope_half_frequencies,
)
from lavie_tpu.io.convert import permute_rope_channels
from lavie_tpu.nn.attention import TemporalAttention


def test_half_rope_equals_interleaved_after_permutation():
    f, h, d, rot = 8, 2, 16, 8
    x = np.random.RandomState(0).randn(5, f, h, d).astype(np.float32)
    cos_i, sin_i = rope_frequencies(f, rot)
    ref = apply_rope(
        jnp.asarray(x), jnp.asarray(cos_i)[:, None, :], jnp.asarray(sin_i)[:, None, :]
    )
    perm = rope_channel_permutation(d, rot)
    cos_h, sin_h = rope_half_frequencies(f, rot)
    out = apply_rope_half(
        jnp.asarray(x[..., perm]),
        jnp.asarray(cos_h)[:, None, :],
        jnp.asarray(sin_h)[:, None, :],
    )
    # rotating the permuted channels = permuting the rotated channels
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref)[..., perm], atol=1e-6)


def test_rope_scores_invariant_under_rebasis():
    """q·kᵀ scores — the only thing attention consumes — are identical whether
    computed interleaved or half-split-after-permutation."""
    f, h, d, rot = 6, 2, 16, 8
    rng = np.random.RandomState(1)
    q = rng.randn(3, f, h, d).astype(np.float32)
    k = rng.randn(3, f, h, d).astype(np.float32)
    cos_i, sin_i = rope_frequencies(f, rot)
    ci, si = jnp.asarray(cos_i)[:, None, :], jnp.asarray(sin_i)[:, None, :]
    qi = apply_rope(jnp.asarray(q), ci, si)
    ki = apply_rope(jnp.asarray(k), ci, si)
    ref_scores = jnp.einsum("bqhd,bkhd->bhqk", qi, ki)

    perm = rope_channel_permutation(d, rot)
    cos_h, sin_h = rope_half_frequencies(f, rot)
    ch, sh = jnp.asarray(cos_h)[:, None, :], jnp.asarray(sin_h)[:, None, :]
    qh = apply_rope_half(jnp.asarray(q[..., perm]), ch, sh)
    kh = apply_rope_half(jnp.asarray(k[..., perm]), ch, sh)
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh)
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores), atol=1e-5)


def _interleaved_temporal_attention(params, x, heads, head_dim, rot):
    """Oracle: TemporalAttention math with the ORIGINAL interleaved rope on
    the ORIGINAL (unpermuted) weights."""
    b, f, c = x.shape
    p = params["params"]
    q = (x @ p["to_q"]["kernel"]).reshape(b, f, heads, head_dim)
    k = (x @ p["to_k"]["kernel"]).reshape(b, f, heads, head_dim)
    v = (x @ p["to_v"]["kernel"]).reshape(b, f, heads, head_dim)
    cos_i, sin_i = rope_frequencies(f, rot)
    ci, si = jnp.asarray(cos_i)[:, None, :], jnp.asarray(sin_i)[:, None, :]
    q, k = apply_rope(q, ci, si), apply_rope(k, ci, si)
    from lavie_tpu.nn.embeddings import relative_position_buckets

    buckets = jnp.asarray(relative_position_buckets(f, 32, 32))
    bias_table = p["time_rel_pos_bias"]["relative_attention_bias"]["embedding"]
    bias = jnp.transpose(bias_table[buckets], (2, 0, 1))
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (head_dim ** -0.5) + bias[None]
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, f, heads * head_dim)
    return out @ p["to_out_0"]["kernel"] + p["to_out_0"]["bias"]


def test_temporal_attention_matches_interleaved_oracle_after_conversion():
    """End-to-end: torch-style weights (interleaved rope) + converter
    permutation → our half-rope module reproduces the interleaved result."""
    heads, head_dim, rot, f = 2, 16, 8, 8
    m = TemporalAttention(query_dim=32, heads=heads, head_dim=head_dim, rope_dim=rot)
    x = jnp.asarray(np.random.RandomState(2).randn(4, f, 32), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    # give the zero-init out projection real values so the test is non-trivial
    params = jax.tree_util.tree_map(lambda v: v, params)
    p = dict(params["params"])
    p["to_out_0"] = dict(p["to_out_0"])
    p["to_out_0"]["kernel"] = jnp.asarray(
        np.random.RandomState(3).randn(32, 32) * 0.1, jnp.float32
    )
    params = {"params": p}

    ref = _interleaved_temporal_attention(params, x, heads, head_dim, rot)

    permuted = permute_rope_channels(
        {"attn_temp": params["params"]}, heads=heads, rot_dim=rot
    )["attn_temp"]
    out = m.apply({"params": permuted}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
