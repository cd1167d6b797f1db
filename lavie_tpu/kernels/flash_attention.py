"""Pallas flash attention for TPU — the xformers-CUDA replacement.

The reference offloads its O(S²)-memory attention to xformers'
memory_efficient_attention CUDA kernels (reference:
base/models/attention.py:284-291). On TPU the equivalent is this Pallas
kernel: online-softmax tiling so the (S, S) score matrix never hits HBM —
scores, running max/denominator and the output accumulator all live in VMEM.

Targets the spatial self-attention (S = h·w up to 2560 tokens at base
resolution). Cross-attention (77-token kv) and temporal attention (f ≤ 61,
with additive bias) stay on the fused-XLA path — their score tiles are tiny
and XLA handles them well.

Layout: q/k/v are (BH, S, D) with D padded to a lane multiple (128) by the
wrapper; fp32 accumulation throughout.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref,
    m_scratch, l_scratch, acc_scratch,
    *, scale: float, kv_blocks: int,
):
    kj = pl.program_id(2)

    @pl.when(kj == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # (blk_q, D)
    k = k_ref[0]  # (blk_k, D)
    v = v_ref[0]  # (blk_k, D)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale  # (blk_q, blk_k)

    m_prev = m_scratch[:, 0:1]  # (blk_q, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)

    p = jnp.exp(s - m_new)  # (blk_q, blk_k)
    correction = jnp.exp(m_prev - m_new)  # (blk_q, 1)

    l_prev = l_scratch[:, 0:1]
    l_new = correction * l_prev + jnp.sum(p, axis=1, keepdims=True)

    acc = acc_scratch[:] * correction
    acc = acc + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    m_scratch[:] = jnp.broadcast_to(m_new, m_scratch.shape)
    l_scratch[:] = jnp.broadcast_to(l_new, l_scratch.shape)
    acc_scratch[:] = acc

    @pl.when(kj == kv_blocks - 1)
    def _finalize():
        o_ref[0] = (acc_scratch[:] / l_scratch[:, 0:1]).astype(o_ref.dtype)


def _pick_block(seq: int, target: int = 1024) -> int:
    """Largest multiple-of-128 divisor of seq that is ≤ target. Bigger blocks
    matter: at TSR's 61-frame sparse-causal shape the old power-of-two picker
    produced a 48.8k-program grid whose per-program work was ~2 µs — grid
    overhead dominated the kernel (measured 261 ms/fwd)."""
    best = 0
    blk = 128
    while blk <= min(seq, target):
        if seq % blk == 0:
            best = blk
        blk += 128
    return best


def flash_supported_shape(
    q: jnp.ndarray, k: jnp.ndarray, allow_padding: bool = False
) -> bool:
    """Default gating: engage only where the kernel beats XLA — long
    self-attention with a lane-aligned head dim. The boundary is batch-
    dependent, not just head-dim (measured v5e, dedupe-proof chained
    harness, S=2560 d=40 8 heads): at B·H=128 flash wins 8.9 vs 27.0 ms,
    but at the production CFG-2 batch (B·H=256) XLA flips into a fused
    flash-like regime and wins 8.6 vs 14.8 ms (full-model bench 1.336 vs
    1.436 frames/s with the relaxed gate). d%128==0 keeps the kernel to the
    shapes where it wins at every batch (d=128 S=2560: 6.0 vs 15.9 ms).

    allow_padding=True relaxes the rules for callers where the alternative
    is materializing an O(Sq·Sk) score matrix that cannot fit
    (sparse-causal attention at 61 frames wants a 25.6 GB fp32 tensor)."""
    seq_q, seq_k, d = q.shape[1], k.shape[1], q.shape[-1]
    if seq_q < 1024 or d > 512 or d % 8 != 0:
        return False
    if not allow_padding and (seq_q != seq_k or d % 128 != 0):
        return False
    return _pick_block(seq_q) >= 128 and _pick_block(seq_k) >= 128


def _q_block_target(seq_q: int, d: int, override: int = 0) -> int:
    """Bigger q blocks amortize per-cell overhead when the per-cell MXU work
    is thin (sub-128 d pads to 128 lanes: at d=40 a 640×640 tile is only
    ~31% useful). The sequential kv axis makes blk_q the only per-cell work
    knob. `override` carries the LAVIE_FLASH_BLKQ experiment knob — read by
    the UN-jitted wrapper and passed here as a static arg, so changing the
    env var always takes effect (a read inside the jitted trace would be
    frozen by the compile cache and silently invalidate A/B measurements)."""
    if override:
        return override
    return 2048 if d < 128 else 1024


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "blkq_override"))
def _flash_bhsd(q, k, v, scale, interpret=False, blkq_override=0):
    """q: (BH, Sq, D), k/v: (BH, Sk, D) → (BH, Sq, D). Sk may differ from
    Sq (sparse-causal kv is 2·Sq). NOTE a (B,S,H,D)-native variant with
    heads as a grid axis is impossible: Pallas requires blocks to cover the
    array's last two dims (H, D) fully or in (8,128)-divisible pieces, and a
    single-head slice of the (H, D) tile plane is neither."""
    bh, seq_q, d = q.shape
    seq_k = k.shape[1]
    blk_q = _pick_block(seq_q, _q_block_target(seq_q, d, blkq_override))
    blk_k = _pick_block(seq_k)

    def vmem_est(bq, bk):
        # double-buffered bf16 q/k/v/o tiles + fp32 m/l/acc scratch + the
        # fp32 s and p score tiles the body materializes
        return ((2 * bq * d + 2 * bk * d) * 2 * 2
                + bq * (2 * 128 + d) * 4 + 2 * bq * bk * 4)

    # the VAE mid-attention (single head, S=163840, d=512) blows the 16 MB
    # scoped-vmem stack at 1024×1024 blocks (8 MB of fp32 scores alone) —
    # shrink the kv block (the sequential axis: smaller blocks only add
    # cheap grid steps), then the q block, until the estimate fits
    while vmem_est(blk_q, blk_k) > 13 * 1024 * 1024 and max(blk_q, blk_k) > 128:
        if blk_k >= blk_q and blk_k > 128:
            blk_k = _pick_block(seq_k, blk_k // 2)
        else:
            blk_q = _pick_block(seq_q, blk_q // 2)
    kv_blocks = seq_k // blk_k

    grid = (bh, seq_q // blk_q, kv_blocks)
    return pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_blocks=kv_blocks),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, blk_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, seq_q, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v)


def flash_attention(
    q: jnp.ndarray,  # (B, S, H, D)
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    *,
    scale: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Flash attention over (B, S, H, D). D needs no explicit padding: Mosaic
    pads sub-128 minor dims inside VMEM tiles, so handing the kernel raw
    D=40/64 blocks avoids the padded HBM copies (and their 3.2× read
    traffic) the old wrapper paid for."""
    assert bias is None, "flash path takes no bias (temporal attn stays XLA)"
    import os

    b, s, h, d = q.shape
    blkq_override = int(os.environ.get("LAVIE_FLASH_BLKQ", "0") or 0)

    def to_bhsd(x):
        sk = x.shape[1]
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, sk, d)

    out = _flash_bhsd(to_bhsd(q), to_bhsd(k), to_bhsd(v), scale,
                      interpret=interpret, blkq_override=blkq_override)
    out = out.reshape(b, h, s, d)
    return jnp.transpose(out, (0, 2, 1, 3))
