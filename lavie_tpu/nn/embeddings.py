"""Positional/timestep embedding primitives.

Pure functions (no params) used by the flax modules:
  - sinusoidal timestep embedding (diffusers `Timesteps` semantics used by the
    reference UNets; reference: base/models/unet.py:153)
  - rotary position embedding matching rotary_embedding_torch's interleaved
    convention (reference: base/models/unet.py:185 builds RotaryEmbedding(32)
    shared by every temporal attention)
  - T5-style relative position buckets for the temporal attention bias
    (reference: base/models/attention.py:681-699)
"""

from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def sinusoidal_timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    *,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """diffusers-exact sinusoidal embedding: (B,) int/float → (B, dim) fp32."""
    half_dim = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)[None, :] * timesteps.astype(jnp.float32)[:, None]
    sin, cos = jnp.sin(emb), jnp.cos(emb)
    if flip_sin_to_cos:
        out = jnp.concatenate([cos, sin], axis=-1)
    else:
        out = jnp.concatenate([sin, cos], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


def rope_frequencies(seq_len: int, rot_dim: int, theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin tables of shape (seq_len, rot_dim), interleaved-pair convention
    (rotary_embedding_torch: freqs repeated elementwise ×2)."""
    inv_freq = 1.0 / (theta ** (np.arange(0, rot_dim, 2, dtype=np.float64) / rot_dim))
    t = np.arange(seq_len, dtype=np.float64)
    freqs = np.outer(t, inv_freq)  # (seq, rot_dim/2)
    freqs = np.repeat(freqs, 2, axis=-1)  # (seq, rot_dim) interleaved pairs
    return np.cos(freqs).astype(np.float32), np.sin(freqs).astype(np.float32)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate the first rot_dim channels of x (..., seq, head_dim); the rest
    pass through (partial rotary, rotary_embedding_torch semantics)."""
    rot_dim = cos.shape[-1]
    x_rot, x_pass = x[..., :rot_dim], x[..., rot_dim:]
    # rotate_half for interleaved pairs: (x0, x1) -> (-x1, x0)
    x1 = x_rot[..., 0::2]
    x2 = x_rot[..., 1::2]
    half_rotated = jnp.stack([-x2, x1], axis=-1).reshape(x_rot.shape)
    x_rot = x_rot * cos + half_rotated * sin
    return jnp.concatenate([x_rot, x_pass], axis=-1)


def rope_half_frequencies(
    seq_len: int, rot_dim: int, theta: float = 10000.0
) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin tables of shape (seq_len, rot_dim/2): one entry per rotation
    pair, for the half-split channel layout (see apply_rope_half)."""
    inv_freq = 1.0 / (theta ** (np.arange(0, rot_dim, 2, dtype=np.float64) / rot_dim))
    freqs = np.outer(np.arange(seq_len, dtype=np.float64), inv_freq)
    return np.cos(freqs).astype(np.float32), np.sin(freqs).astype(np.float32)


def apply_rope_half(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """RoPE in the half-split channel layout: rotation pair j = channels
    (j, rot/2+j) instead of the interleaved (2j, 2j+1).

    Mathematically identical to apply_rope after a static per-head channel
    permutation of q AND k (attention scores are invariant to a shared q/k
    channel permutation); the permutation is folded into the to_q/to_k
    projection weights at conversion time
    (io.convert.permute_rope_channels). The win is TPU lane layout: the
    interleaved form needs strided even/odd gathers + stack + concat on the
    minor dim (measured 2×4.5 ms per VSR 512-ch block); this form is
    contiguous slices and elementwise math (measured 2×1.7 ms)."""
    half = cos.shape[-1]
    a, b, x_pass = x[..., :half], x[..., half : 2 * half], x[..., 2 * half :]
    ra = a * cos - b * sin
    rb = b * cos + a * sin
    return jnp.concatenate([ra, rb, x_pass], axis=-1)


def rope_channel_permutation(head_dim: int, rot_dim: int) -> np.ndarray:
    """Permutation p such that x_half[..., i] = x_interleaved[..., p[i]]:
    evens of the rotated span, then odds, then the pass-through tail."""
    evens = np.arange(0, rot_dim, 2)
    odds = np.arange(1, rot_dim, 2)
    tail = np.arange(rot_dim, head_dim)
    return np.concatenate([evens, odds, tail])


def relative_position_buckets(
    n: int, num_buckets: int = 32, max_distance: int = 128
) -> np.ndarray:
    """Bucketed (query, key) relative positions, T5-bidirectional style,
    computed statically with numpy (frame count is static under jit).

    Matches the reference's bucketing: negative direction gets the upper half
    of buckets, small distances exact, large distances log-spaced
    (reference: base/models/attention.py:681-699).
    """
    q_pos = np.arange(n)[:, None]
    k_pos = np.arange(n)[None, :]
    rel = k_pos - q_pos
    n_ = -rel

    half = num_buckets // 2
    ret = (n_ < 0).astype(np.int64) * half
    n_abs = np.abs(n_)

    max_exact = half // 2
    is_small = n_abs < max_exact
    # avoid log(0); masked by is_small anyway
    safe = np.maximum(n_abs, 1)
    val_if_large = max_exact + (
        np.log(safe.astype(np.float64) / max_exact)
        / math.log(max_distance / max_exact)
        * (half - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, half - 1)
    ret = ret + np.where(is_small, n_abs, val_if_large)
    return ret.astype(np.int32)
