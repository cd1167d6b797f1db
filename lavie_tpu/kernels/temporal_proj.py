"""Pallas boundary kernels for the channel-major temporal attention path.

The v4 temporal attention kernel (temporal_fused.py) consumes q/k/v in
channel-major (E, B, F, S) layout. Producing that layout with XLA costs a
transposed-operand GEMM per projection — measured 89 TF/s (vs ~177 for
standard GEMMs) because the (B,F,S,C) activation must be read column-major —
plus a separate LayerNorm pass and, on the output side, another transposed
GEMM and an unfused residual add.

Two kernels close the gap by doing the transposes in VMEM next to the MXU:

  ln_qkv_cmajor:   x (B,F,S,C) → LN over C → three (C,E) GEMMs → emit
                   q/k/v (E,B,F,S). One read of x, LN fused, transposes are
                   per-block VMEM ops.
  out_proj_residual: attn output (E,B,F,S) + residual (B,F,S,C) →
                   out·Wo + bo + residual, emitted standard (B,F,S,C).

Weights arrive PRE-TRANSPOSED (E,C)/(C→ wo (E,O)) so the in-kernel dots are
plain (M,K)×(K,N) after one activation transpose per frame.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln(x, gamma, beta, epsilon):
    f32 = jnp.float32
    mean = jnp.mean(x, axis=-1, dtype=f32, keepdims=True)
    mean_sq = jnp.mean(jnp.square(x.astype(f32)), axis=-1, dtype=f32, keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + epsilon)
    xn = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
    return xn * gamma.astype(x.dtype) + beta.astype(x.dtype)


def _ln_qkv_kernel(x_ref, g_ref, b_ref, wq_ref, wk_ref, wv_ref,
                   q_ref, k_ref, v_ref, *, frames, epsilon):
    f32 = jnp.float32
    for f in range(frames):
        xn = _ln(x_ref[0, f], g_ref[0], b_ref[0], epsilon)  # (blk, C)
        xnt = xn.T  # (C, blk) — one VMEM transpose feeds all three dots
        for w_ref, o_ref in ((wq_ref, q_ref), (wk_ref, k_ref), (wv_ref, v_ref)):
            y = jax.lax.dot_general(
                w_ref[...], xnt, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )  # (E, blk)
            o_ref[:, 0, f, :] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("epsilon", "blk_target", "interpret")
)
def _ln_qkv(x, gamma, beta, wqt, wkt, wvt, epsilon, blk_target=128,
            interpret=False):
    b, f, s, c = x.shape
    e = wqt.shape[0]
    blk = blk_target
    while blk >= 128 and s % blk:
        blk //= 2
    w_spec = lambda shape: pl.BlockSpec(shape, lambda bb, i: (0,) * len(shape))
    o_spec = pl.BlockSpec((e, 1, f, blk), lambda bb, i: (0, bb, 0, i))
    o_shape = jax.ShapeDtypeStruct((e, b, f, s), x.dtype)
    return pl.pallas_call(
        functools.partial(_ln_qkv_kernel, frames=f, epsilon=epsilon),
        grid=(b, s // blk),
        in_specs=[
            pl.BlockSpec((1, f, blk, c), lambda bb, i: (bb, 0, i, 0)),
            w_spec((1, c)), w_spec((1, c)),
            w_spec((e, c)), w_spec((e, c)), w_spec((e, c)),
        ],
        out_specs=[o_spec, o_spec, o_spec],
        out_shape=[o_shape, o_shape, o_shape],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, gamma[None], beta[None], wqt, wkt, wvt)


def ln_qkv_supported(frames: int, s: int, c: int, e: int) -> bool:
    if c % 128 or e % 128 or not 2 <= frames <= 32:
        return False
    blk = 128
    if s % blk:
        return False
    # ×2 on the grid-windowed buffers: Mosaic double-buffers them
    est = (
        2 * frames * blk * c * 2      # x block (double-buffered)
        + frames * blk * c * 2        # transposed LN copy
        + 3 * e * c * 2               # weights
        + 2 * 3 * frames * blk * e * 2  # out blocks (double-buffered)
        + blk * e * 4                 # fp32 accumulator
    )
    return est <= 15 * 1024 * 1024


def ln_qkv_cmajor(
    x: jnp.ndarray,      # (B, F, S, C)
    gamma: jnp.ndarray, beta: jnp.ndarray,  # LN params (C,)
    wq: jnp.ndarray, wk: jnp.ndarray, wv: jnp.ndarray,  # (C, E)
    *,
    epsilon: float = 1e-5,
    interpret: bool = False,
):
    """LN over C + three projections, emitted channel-major (E, B, F, S)."""
    dt = x.dtype
    f32 = jnp.float32
    return _ln_qkv(
        x, gamma.astype(f32), beta.astype(f32),
        wq.T.astype(dt), wk.T.astype(dt), wv.T.astype(dt),
        epsilon, interpret=interpret,
    )


def _out_proj_kernel(o_ref, r_ref, wo_ref, bo_ref, y_ref, *, frames):
    f32 = jnp.float32
    for f in range(frames):
        of = o_ref[:, 0, f, :]  # (E, blk)
        y = jax.lax.dot_general(
            of.T, wo_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )  # (blk, O)
        y = y + bo_ref[0]
        y_ref[0, f] = y.astype(y_ref.dtype) + r_ref[0, f]


@functools.partial(jax.jit, static_argnames=("blk_target", "interpret"))
def _out_proj(o, r, wo, bo, blk_target=256, interpret=False):
    e, b, f, s = o.shape
    cout = wo.shape[1]
    blk = blk_target
    while blk >= 128 and s % blk:
        blk //= 2
    w_spec = lambda shape: pl.BlockSpec(shape, lambda bb, i: (0,) * len(shape))
    return pl.pallas_call(
        functools.partial(_out_proj_kernel, frames=f),
        grid=(b, s // blk),
        in_specs=[
            pl.BlockSpec((e, 1, f, blk), lambda bb, i: (0, bb, 0, i)),
            pl.BlockSpec((1, f, blk, cout), lambda bb, i: (bb, 0, i, 0)),
            w_spec((e, cout)), w_spec((1, cout)),
        ],
        out_specs=pl.BlockSpec((1, f, blk, cout), lambda bb, i: (bb, 0, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, f, s, cout), r.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(o, r, wo, bo[None])


def out_proj_residual(
    out_cm: jnp.ndarray,   # (E, B, F, S) attention output, channel-major
    residual: jnp.ndarray, # (B, F, S, O)
    wo: jnp.ndarray,       # (E, O)
    bo: jnp.ndarray,       # (O,)
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """residual + out·Wo + bo, emitted standard (B, F, S, O)."""
    dt = residual.dtype
    return _out_proj(
        out_cm.astype(dt), residual, wo.astype(dt),
        bo.astype(jnp.float32), interpret=interpret,
    )


def out_proj_supported(frames: int, s: int, e: int, cout: int) -> bool:
    if e % 128 or cout % 128 or not 2 <= frames <= 32:
        return False
    blk = 256
    while blk >= 128 and s % blk:
        blk //= 2
    if blk < 128:
        return False
    est = (
        frames * blk * e * 2          # out block
        + 2 * frames * blk * cout * 2 # residual + result blocks
        + e * cout * 2                # weights
        + blk * cout * 4
    )
    return est <= 13 * 1024 * 1024
