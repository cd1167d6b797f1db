"""Pallas fused GEGLU feed-forward: y = (gelu(x·Wg) ⊙ (x·Wh)) · W2 + b.

The transformer FeedForward (dim → 4·dim GEGLU → dim; reference:
base/models/attention.py:479, diffusers FeedForward/GEGLU) materializes a
hidden tensor 4× the activation to HBM and reads it back — at the VSR
512-channel levels that is a 5.4 GB round trip per block and the matmuls run
bandwidth-bound (~30 TF/s measured). This kernel keeps the hidden entirely in
VMEM: weights are resident across the grid, each token tile does
matmul → gate → matmul in one pass; HBM traffic is just x and y.

Shapes: x (N, C), W0 (C, 2·I) [hidden‖gate packed], b0 (2·I), W2 (I, C),
b2 (C). fp32 accumulation on both matmuls, erf-exact gelu.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Polynomial erf (Abramowitz–Stegun 7.1.26, |err| < 1.5e-7) — Mosaic has
    no erf primitive; exp it has."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _geglu_kernel(x_ref, w0_ref, b0_ref, w2_ref, b2_ref, o_ref, *, inner: int):
    x = x_ref[0]  # (blk_n, C)
    h = jax.lax.dot_general(
        x, w0_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    h = h + b0_ref[0].astype(jnp.float32)  # (blk_n, 2I)
    hidden = h[:, :inner]
    gate = h[:, inner:]
    # erf-exact gelu (diffusers GEGLU uses approximate=False)
    gate = 0.5 * gate * (1.0 + _erf(gate * (2.0 ** -0.5)))
    act = (hidden * gate).astype(x.dtype)  # (blk_n, I)
    y = jax.lax.dot_general(
        act, w2_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    y = y + b2_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def _pick_block(n: int, target: int) -> int:
    blk = target
    while blk >= 128:
        if n % blk == 0:
            return blk
        blk //= 2
    return 0


def geglu_supported_shape(n: int, c: int, inner: int) -> bool:
    """Weights must fit VMEM alongside a token tile: C·2I + I·C elements
    (bf16) ≲ 8 MB, dims sublane-aligned, N tileable. C need not be a lane
    multiple: Mosaic masks the partial last-lane tile (C=320 — TSR/base L0 —
    measured in-model on the TSR CFG-2 forward: ff 10.3 → 7.4 ms per L0
    block; the XLA path's 1.6 GB bf16 hidden round trip dominates its matmul
    padding)."""
    if c % 8 != 0 or c < 128 or inner % 128 != 0:
        return False
    weight_bytes = (c * 2 * inner + inner * c) * 2
    if weight_bytes > 8 * 1024 * 1024:
        return False
    return _pick_block(n, 256) >= 128


@functools.partial(jax.jit, static_argnames=("inner", "interpret"))
def _geglu_2d(x, w0, b0, w2, b2, inner, interpret=False):
    n, c = x.shape
    blk_n = _pick_block(n, 256)
    grid = (n // blk_n,)
    return pl.pallas_call(
        functools.partial(_geglu_kernel, inner=inner),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, blk_n, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, 2 * inner), lambda i: (0, 0)),
            pl.BlockSpec((1, 2 * inner), lambda i: (0, 0)),
            pl.BlockSpec((inner, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk_n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n // blk_n, blk_n, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(
        x.reshape(n // blk_n, blk_n, c), w0, b0.reshape(1, -1), w2, b2.reshape(1, -1)
    ).reshape(n, c)


def geglu(
    x: jnp.ndarray,  # (..., C)
    w0: jnp.ndarray,  # (C, 2I) hidden‖gate packed (diffusers net.0.proj order)
    b0: jnp.ndarray,  # (2I,)
    w2: jnp.ndarray,  # (I, C)
    b2: jnp.ndarray,  # (C,)
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    inner = w2.shape[0]
    lead = x.shape[:-1]
    c = x.shape[-1]
    xf = x.reshape(-1, c)
    out = _geglu_2d(
        xf, w0.astype(x.dtype), b0, w2.astype(x.dtype), b2, inner, interpret
    )
    return out.reshape(*lead, c)
