"""Pallas fused temporal attention — the frame-axis attention of every
transformer block (reference: base/models/attention.py:562-667).

Shape reality: f ≤ 61 frames of attention, batched over every spatial
position — millions of (f×d)·(d×f) matmuls far too small for the MXU. The
XLA path runs at 10-24 TF/s and spends most of its time materializing
q/k/v transposes, fp32 scores and probs in HBM (measured 43.7 ms/fwd on the
base UNet, 23% of the step).

This kernel flips the layout: spatial positions live on the LANES, frames
and channels unroll in VMEM. Per (batch, position-tile) grid cell it
computes scores, adds the relative-position bias, softmaxes over frames and
applies the values — everything vectorized across 128+ positions at once,
one HBM pass over q/k/v/out and nothing else.

Layout: q/k/v/out (B, F, C, S) with C = heads·head_dim; bias (F, F, H, 1)
fp32. RoPE is applied by the caller (half-split layout — cheap contiguous
slices). fp32 scores/softmax/accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _temporal_kernel(
    q_ref, k_ref, v_ref, bias_ref, ind_ref, o_ref, *, heads: int, scale: float
):
    # Mosaic-safe formulation: strictly 2D ops. Per-head channel reductions
    # and head→channel broadcasts go through a tiny (H, C) indicator matmul
    # (Mosaic rejects >2D multi_reductions); softmax over frames is unrolled
    # elementwise on (H, blk) arrays.
    f_, c, blk = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    q = q_ref[0]  # (F, C, blk)
    k = k_ref[0]
    v = v_ref[0]
    ind = ind_ref[...]  # (H, C) 0/1 head-indicator

    def head_sum(x):  # (C, blk) → (H, blk)
        return jax.lax.dot_general(
            ind, x, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    def head_expand(w):  # (H, blk) → (C, blk)
        return jax.lax.dot_general(
            ind, w, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    # one query frame at a time — keeps the live set to F×(H, blk) score rows
    # instead of F²×, which overflows VMEM at F=16
    for f in range(f_):
        qf = q[f].astype(jnp.float32) * scale
        row = [
            head_sum(qf * k[g].astype(jnp.float32)) + bias_ref[f, g]
            for g in range(f_)
        ]  # each (H, blk); bias (H, 1) broadcasts over lanes
        m = row[0]
        for g in range(1, f_):
            m = jnp.maximum(m, row[g])
        exps = [jnp.exp(s - m) for s in row]
        denom = exps[0]
        for g in range(1, f_):
            denom = denom + exps[g]
        inv = 1.0 / denom
        acc = head_expand(exps[0] * inv) * v[0].astype(jnp.float32)
        for g in range(1, f_):
            acc = acc + head_expand(exps[g] * inv) * v[g].astype(jnp.float32)
        o_ref[0, f] = acc.astype(o_ref.dtype)


def _pick_block(s: int, vmem_budget_elems: int) -> int:
    blk = 512
    while blk >= 128:
        if s % blk == 0 and blk <= vmem_budget_elems:
            return blk
        blk //= 2
    return 0


def temporal_supported_shape(frames: int, heads: int, head_dim: int, s: int) -> bool:
    """F small enough to unroll F² in VMEM, channels sublane-aligned,
    positions tileable to lanes, tiles within VMEM."""
    if frames > 16 or head_dim % 8 != 0:
        return False
    c = heads * head_dim
    # VMEM estimate per tile (elems): 4 tensors (F·C·blk bf16→fp32 working) +
    # scores (F·F·H·blk fp32); budget ~12 MB
    blk = _blk_for(frames, c, heads, s)
    return blk >= 128


def _blk_for(frames: int, c: int, heads: int, s: int) -> int:
    for blk in (512, 256, 128):
        if s % blk != 0:
            continue
        bytes_est = (
            3 * frames * c * blk * 2  # q/k/v bf16
            + frames * frames * heads * blk * 4  # scores fp32
            + 2 * c * blk * 4  # accumulators
        )
        # Pallas double-buffers input windows and fp32 temporaries roughly
        # double the live set — budget well under the 16 MB VMEM
        if bytes_est <= 6 * 1024 * 1024:
            return blk
    return 0


@functools.partial(jax.jit, static_argnames=("heads", "scale", "interpret"))
def _temporal_bfcs(q, k, v, bias, heads, scale, interpret=False):
    b, f, c, s = q.shape
    blk = _blk_for(f, c, heads, s)
    grid = (b, s // blk)
    d = c // heads
    ind = jnp.repeat(jnp.eye(heads, dtype=jnp.float32), d, axis=1)  # (H, C)
    return pl.pallas_call(
        functools.partial(_temporal_kernel, heads=heads, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, f, c, blk), lambda b, i: (b, 0, 0, i)),
            pl.BlockSpec((1, f, c, blk), lambda b, i: (b, 0, 0, i)),
            pl.BlockSpec((1, f, c, blk), lambda b, i: (b, 0, 0, i)),
            pl.BlockSpec((f, f, heads, 1), lambda b, i: (0, 0, 0, 0)),
            pl.BlockSpec((heads, c), lambda b, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, f, c, blk), lambda b, i: (b, 0, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b, f, c, s), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v, bias, ind)


def temporal_attention(
    q: jnp.ndarray,  # (B, F, S, H, D) — frame-major, positions, heads
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,  # (H, F, F) additive score bias
    *,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused frame-axis attention; returns (B, F, S, H, D)."""
    b, f, s, h, d = q.shape

    def to_bfcs(x):
        # (B, F, S, H, D) → (B, F, H·D, S)
        return jnp.transpose(x.reshape(b, f, s, h * d), (0, 1, 3, 2))

    qb, kb, vb = to_bfcs(q), to_bfcs(k), to_bfcs(v)
    bias_k = jnp.transpose(bias.astype(jnp.float32), (1, 2, 0))[..., None]  # (F,F,H,1)
    out = _temporal_bfcs(qb, kb, vb, bias_k, h, scale, interpret)
    return jnp.transpose(out, (0, 1, 3, 2)).reshape(b, f, s, h, d)
