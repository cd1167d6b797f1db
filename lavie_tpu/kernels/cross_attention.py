"""Pallas fused cross-attention for short key/value sequences (text tokens).

Every cross-attention in the cascade attends to at most 77 text tokens
(reference: base/models/attention.py:524-534; the VSR 512-channel levels are
only-cross blocks, reference: vsr/configs/unet_3d_config.json
only_cross_attention=[T,T,T,F]). The XLA path materializes the
(queries × 77) score tensor to HBM — at VSR's 40960-token levels that is a
4 GB round trip per block and pad-limited matmuls (~28 TF/s measured). Here
k/v (77×D per head) live entirely in VMEM, scores/softmax/weighted-sum fuse
into one pass over the query tiles, and nothing but q/out touches HBM.

Layout: q (BH, S, D), k/v (BH, Lkv, D); D and Lkv are zero-padded to lane
multiples by the wrapper; padded kv columns are masked to -inf before the
softmax. fp32 score/softmax accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _cross_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    q = q_ref[0]  # (blk_q, D)
    k = k_ref[0]  # (Lpad, D)
    v = v_ref[0]  # (Lpad, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale  # (blk_q, Lpad)
    lpad = k.shape[0]
    if kv_len < lpad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    p = p / denom
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _pick_block(seq: int, target: int = 1024) -> int:
    blk = target
    while blk >= 128:
        if seq % blk == 0:
            return blk
        blk //= 2
    return 0


def cross_supported_shape(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    """Engage for long query sequences against short kv (text states): the
    score tensor would be large in HBM while kv fits VMEM whole."""
    seq_q, kv = q.shape[1], k.shape[1]
    return kv <= 256 and seq_q >= 1024 and _pick_block(seq_q) >= 128


@functools.partial(jax.jit, static_argnames=("scale", "kv_len", "interpret"))
def _cross_bhsd(q, k, v, scale, kv_len, interpret=False):
    bh, seq_q, d = q.shape
    lpad = k.shape[1]
    blk_q = _pick_block(seq_q)
    grid = (bh, seq_q // blk_q)
    return pl.pallas_call(
        functools.partial(_cross_kernel, scale=scale, kv_len=kv_len),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, lpad, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, lpad, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, seq_q, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v)


def cross_attention(
    q: jnp.ndarray,  # (B, S, H, D)
    k: jnp.ndarray,  # (B, Lkv, H, D)
    v: jnp.ndarray,
    *,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused short-kv cross attention over (B, S, H, D). No explicit
    padding: Mosaic pads the sub-128 minor dim and the 77-row kv sublane
    dim inside VMEM tiles, so no padded HBM copies are materialized (the
    original wrapper's jnp.pad of q to d=128 doubled its HBM traffic) and
    no -inf column mask is needed."""
    b, s, h, d = q.shape
    kv_len = k.shape[1]

    def to_bhsd(x):
        sk = x.shape[1]
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, sk, d)

    out = _cross_bhsd(to_bhsd(q), to_bhsd(k), to_bhsd(v), scale, kv_len,
                      interpret)
    out = out.reshape(b, h, s, d)
    return jnp.transpose(out, (0, 2, 1, 3))
