"""Pallas fused transformer-block kernels for the VSR only-cross levels.

The VSR 512-channel levels are only-cross transformer blocks that run TWO
sequential text cross-attentions per block (reference:
vsr/models/attention.py:489-506, :552-580; vsr/configs/unet_3d_config.json
only_cross_attention=[T,T,T,F]). On the XLA path every stage — proj_in, the
LayerNorms, q/out projections, the materialized (tokens×77) score tensors,
the GEGLU hidden, proj_out, and each residual add — is a separate pass over
a ~335 MB activation at the 8×160×256 level; the groups measure 45-48 TF/s,
bandwidth-bound. Two fused kernels cut the HBM round trips to the minimum
the dataflow allows (the frame-axis temporal attention between them forces a
boundary):

  cross_attention_head:  x ← GN'd input
      xp = x·Wpi + bpi                     (proj_in)
      x1 = xp + Attn(LN1(xp); k1,v1)       (attn1, text kv)
      x2 = x1 + Attn(LN2(x1); k2,v2)       (attn2, text kv)

  transformer_tail:      x ← post-temporal activation, r ← outer residual
      y  = (GEGLU_ff(LN3(x)) + x)·Wpo + bpo + r

k/v are precomputed outside (77-token GEMMs — negligible) and packed into
block-diagonal HEAD-PAIR matrices so all in-kernel ops are 128-lane aligned
with zero MXU padding waste for head_dim 64:

    K2[p] = [[k_{2p}ᵀ, 0], [0, k_{2p+1}ᵀ]]   (128, 256)
    V2[p] = [[v_{2p},  0], [0, v_{2p+1} ]]   (256, 128)

so q_pair (blk,128) · K2[p] yields both heads' scores side by side and the
two aligned probability tiles contract against V2[p]'s row blocks. The
per-pair q GEMM consumes contiguous 128-column slices of Wq (head-major),
and the out accumulation consumes contiguous 128-row slices of Wo — the
full q/out projections cost exactly one C×C GEMM each across the pair loop.

Padded kv columns are masked with a −1e9 additive bias before the softmax
(an exp(−m) denominator correction was tried and catastrophically cancels
in fp32 when every real score is strongly negative — see _pair_attention).

fp32: LN statistics, score/softmax, GEGLU hidden, and projection
accumulators.

A standalone single-attention variant (fused_ln_cross_attention) exists as
a tested baseline for non-only-cross attn2 sites with the same shape
constraints; it is NOT wired into any nn/ module (the XLA path serves
those blocks — only the two-attention only-cross fusion earns its kernel
boundary in-model).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAIR = 128  # two 64-lane heads per MXU-width group


def _layer_norm(x, gamma_ref, beta_ref, epsilon):
    """fp32 stats, elementwise in activation dtype (matches
    nn.transformer._LayerNormCore for parity)."""
    f32 = jnp.float32
    mean = jnp.mean(x, axis=-1, dtype=f32, keepdims=True)
    mean_sq = jnp.mean(jnp.square(x.astype(f32)), axis=-1, dtype=f32, keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + epsilon)
    xn = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
    return xn * gamma_ref[0].astype(x.dtype) + beta_ref[0].astype(x.dtype)


def _pair_attention(xn, wq_ref, wo_ref, bo_ref, k2_ref, v2_ref, *,
                    pairs, kv_len, scale):
    """softmax(LN'd x · Wq · Kᵀ · scale) · V · Wo + bo, head-pair loop.
    Returns fp32 (blk, C)."""
    f32 = jnp.float32
    if kv_len < PAIR:
        # −inf-style mask on the padded kv columns. (A denominator
        # correction — padded columns score exactly 0, subtract their
        # exp(−m) mass — was tried first and is WRONG: when every real
        # score is ≤ ~−17, fp32 rounds denom to exactly the subtracted
        # mass and the division yields inf·0 = NaN. Verified repro in
        # tests/test_cross_block.py::test_single_all_negative_scores.)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, PAIR), 1)
        neg = jnp.where(col < kv_len, 0.0, -1e9).astype(f32)
    else:
        neg = None
    acc = jnp.zeros((xn.shape[0], wo_ref.shape[1]), f32)
    for p in range(pairs):
        wq_p = wq_ref[:, p * PAIR:(p + 1) * PAIR]  # (C, 128)
        q = jax.lax.dot_general(
            xn, wq_p, (((1,), (0,)), ((), ())), preferred_element_type=f32
        )
        q = (q * scale).astype(xn.dtype)  # (blk, 128) — the pair's two heads
        s = jax.lax.dot_general(
            q, k2_ref[0, p], (((1,), (0,)), ((), ())), preferred_element_type=f32
        )  # (blk, 256) = [head 2p scores ‖ head 2p+1 scores]
        o = None
        for j in range(2):
            sj = s[:, j * PAIR:(j + 1) * PAIR]
            if neg is not None:
                sj = sj + neg
            m = jnp.max(sj, axis=1, keepdims=True)
            e = jnp.exp(sj - m)
            denom = jnp.sum(e, axis=1, keepdims=True)
            pj = (e / denom).astype(xn.dtype)
            oj = jax.lax.dot_general(
                pj, v2_ref[0, p, j * PAIR:(j + 1) * PAIR, :],
                (((1,), (0,)), ((), ())), preferred_element_type=f32,
            )
            o = oj if o is None else o + oj
        wo_p = wo_ref[p * PAIR:(p + 1) * PAIR, :]  # (128, C)
        acc = acc + jax.lax.dot_general(
            o.astype(xn.dtype), wo_p, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
    return acc + bo_ref[0]


# ---------------------------------------------------------------------------
# single fused LN + cross attention (non-only-cross blocks' attn2)
# ---------------------------------------------------------------------------


def _single_kernel(x_ref, gamma_ref, beta_ref, wq_ref, wo_ref, bo_ref,
                   k2_ref, v2_ref, o_ref, *, pairs, kv_len, scale, epsilon):
    x = x_ref[0]
    xn = _layer_norm(x, gamma_ref, beta_ref, epsilon)
    acc = _pair_attention(
        xn, wq_ref, wo_ref, bo_ref, k2_ref, v2_ref,
        pairs=pairs, kv_len=kv_len, scale=scale,
    )
    o_ref[0] = acc.astype(x.dtype) + x


# ---------------------------------------------------------------------------
# head kernel: proj_in + attn1 + attn2
# ---------------------------------------------------------------------------


def _head_kernel(
    x_ref, wpi_ref, bpi_ref,
    g1_ref, b1_ref, wq1_ref, wo1_ref, bo1_ref, k21_ref, v21_ref,
    g2_ref, b2_ref, wq2_ref, wo2_ref, bo2_ref, k22_ref, v22_ref,
    o_ref, *, pairs, kv_len, scale, epsilon,
):
    x = x_ref[0]  # (blk, C) — GroupNorm'd transformer input
    f32 = jnp.float32
    xp = jax.lax.dot_general(
        x, wpi_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    xp = (xp + bpi_ref[0]).astype(x.dtype)  # proj_in

    xn = _layer_norm(xp, g1_ref, b1_ref, epsilon)
    a1 = _pair_attention(xn, wq1_ref, wo1_ref, bo1_ref, k21_ref, v21_ref,
                         pairs=pairs, kv_len=kv_len, scale=scale)
    x1 = a1.astype(x.dtype) + xp

    xn = _layer_norm(x1, g2_ref, b2_ref, epsilon)
    a2 = _pair_attention(xn, wq2_ref, wo2_ref, bo2_ref, k22_ref, v22_ref,
                         pairs=pairs, kv_len=kv_len, scale=scale)
    o_ref[0] = a2.astype(x.dtype) + x1


# ---------------------------------------------------------------------------
# tail kernel: LN3 + GEGLU FF + residual + proj_out + outer residual
# ---------------------------------------------------------------------------


def _erf(x):
    """Polynomial erf (Abramowitz–Stegun 7.1.26, |err| < 1.5e-7) — Mosaic has
    no erf primitive (same as kernels/geglu.py)."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _tail_kernel(
    x_ref, r_ref, g3_ref, b3_ref, w0_ref, b0_ref, w2_ref, b2_ref,
    wpo_ref, bpo_ref, o_ref, *, inner, epsilon,
):
    x = x_ref[0]  # (blk, C) post-temporal activation
    r = r_ref[0]  # (blk, C) transformer outer residual
    f32 = jnp.float32
    xn = _layer_norm(x, g3_ref, b3_ref, epsilon)
    h = jax.lax.dot_general(
        xn, w0_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    h = h + b0_ref[0]  # (blk, 2I) hidden‖gate (diffusers net.0.proj order)
    hidden = h[:, :inner]
    gate = h[:, inner:]
    gate = 0.5 * gate * (1.0 + _erf(gate * (2.0 ** -0.5)))
    act = (hidden * gate).astype(x.dtype)
    y = jax.lax.dot_general(
        act, w2_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    y = (y + b2_ref[0]).astype(x.dtype) + x  # ff residual
    z = jax.lax.dot_general(
        y, wpo_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=f32
    )
    o_ref[0] = (z + bpo_ref[0]).astype(x.dtype) + r


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------


def _pick_block(n: int, target: int = 512) -> int:
    blk = target
    while blk >= 128:
        if n % blk == 0:
            return blk
        blk //= 2
    return 0


def cross_block_supported(n_tokens: int, c: int, heads: int, head_dim: int,
                          kv_len: int) -> bool:
    """C lane-aligned, head pairs fill an MXU width, kv fits one 128 tile,
    enough tokens to tile."""
    return (
        c % 128 == 0
        and heads % 2 == 0
        and head_dim == 64
        and heads * head_dim == c
        and kv_len <= PAIR
        and _pick_block(n_tokens) >= 128
    )


def tail_supported(n_tokens: int, c: int, inner: int,
                   itemsize: int = 2) -> bool:
    """GEGLU + proj_out weights resident in VMEM (~6.8 MB at C=512 bf16;
    itemsize = activation/weight dtype bytes)."""
    if c % 128 != 0 or inner % 128 != 0:
        return False
    weight_bytes = (c * 2 * inner + inner * c + c * c) * itemsize
    if weight_bytes > 8 * 1024 * 1024:
        return False
    return _pick_block(n_tokens) >= 128


def pack_kv_pairs(k: jnp.ndarray, v: jnp.ndarray, heads: int) -> tuple:
    """(B, Lkv, C) projected k/v → block-diagonal head-pair matrices
    K2 (B, H/2, 128, 256), V2 (B, H/2, 256, 128)."""
    b, lkv, c = k.shape
    d = c // heads
    pad = PAIR - lkv
    kp = jnp.pad(k, ((0, 0), (0, pad), (0, 0)))  # (B, 128, C)
    vp = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
    kh = jnp.transpose(kp.reshape(b, PAIR, heads, d), (0, 2, 3, 1))  # (B,H,d,128)
    kh = kh.reshape(b, heads // 2, 2, d, PAIR)
    k2 = jnp.zeros((b, heads // 2, 2, d, 2, PAIR), k.dtype)
    k2 = k2.at[:, :, 0, :, 0, :].set(kh[:, :, 0])
    k2 = k2.at[:, :, 1, :, 1, :].set(kh[:, :, 1])
    k2 = k2.reshape(b, heads // 2, 2 * d, 2 * PAIR)  # (B, H/2, 128, 256)

    vh = jnp.transpose(vp.reshape(b, PAIR, heads, d), (0, 2, 1, 3))  # (B,H,128,d)
    vh = vh.reshape(b, heads // 2, 2, PAIR, d)
    v2 = jnp.zeros((b, heads // 2, 2, PAIR, 2, d), v.dtype)
    v2 = v2.at[:, :, 0, :, 0, :].set(vh[:, :, 0])
    v2 = v2.at[:, :, 1, :, 1, :].set(vh[:, :, 1])
    v2 = v2.reshape(b, heads // 2, 2 * PAIR, 2 * d)  # (B, H/2, 256, 128)
    return k2, v2


def _blk_target(env: str, default: int = 512) -> int:
    return int(os.environ.get(env, str(default)) or default)


_row = lambda a: a.reshape(1, -1)


@functools.partial(
    jax.jit,
    static_argnames=("heads", "kv_len", "scale", "epsilon", "blk_target",
                     "interpret"),
)
def _single_3d(x, gamma, beta, wq, wo, bo, k2, v2, heads, kv_len, scale,
               epsilon, blk_target=512, interpret=False):
    b, s, c = x.shape
    blk = _pick_block(s, blk_target)
    pairs = heads // 2
    w_spec = lambda shape: pl.BlockSpec(shape, lambda b, i: (0,) * len(shape))
    return pl.pallas_call(
        functools.partial(
            _single_kernel, pairs=pairs, kv_len=kv_len, scale=scale,
            epsilon=epsilon,
        ),
        grid=(b, s // blk),
        in_specs=[
            pl.BlockSpec((1, blk, c), lambda b, i: (b, i, 0)),
            w_spec((1, c)), w_spec((1, c)),
            w_spec((c, c)), w_spec((c, c)), w_spec((1, c)),
            pl.BlockSpec((1, pairs, PAIR, 2 * PAIR), lambda b, i: (b, 0, 0, 0)),
            pl.BlockSpec((1, pairs, 2 * PAIR, PAIR), lambda b, i: (b, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, blk, c), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, _row(gamma), _row(beta), wq, wo, _row(bo), k2, v2)


def fused_ln_cross_attention(
    x: jnp.ndarray,        # (B, S, C) — B folds frames
    gamma: jnp.ndarray,    # (C,) LN scale (fp32)
    beta: jnp.ndarray,     # (C,) LN shift (fp32)
    wq: jnp.ndarray,       # (C, C) to_q kernel (head-major columns)
    wo: jnp.ndarray,       # (C, C) to_out kernel
    bo: jnp.ndarray,       # (C,) to_out bias
    k: jnp.ndarray,        # (B, Lkv, C) projected keys
    v: jnp.ndarray,        # (B, Lkv, C) projected values
    *,
    heads: int,
    scale: float,
    epsilon: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + to_out(attention(LN(x)·Wq, k, v)) in one fused pass."""
    kv_len = k.shape[1]
    k2, v2 = pack_kv_pairs(k.astype(x.dtype), v.astype(x.dtype), heads)
    return _single_3d(
        x, gamma.astype(jnp.float32), beta.astype(jnp.float32),
        wq.astype(x.dtype), wo.astype(x.dtype), bo.astype(jnp.float32),
        k2, v2, heads, kv_len, scale, epsilon,
        _blk_target("LAVIE_CB_BLK"), interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("heads", "kv_len", "scale", "epsilon", "blk_target",
                     "interpret"),
)
def _head_3d(x, wpi, bpi,
             g1, b1, wq1, wo1, bo1, k21, v21,
             g2, b2, wq2, wo2, bo2, k22, v22,
             heads, kv_len, scale, epsilon, blk_target=512, interpret=False):
    b, s, c = x.shape
    blk = _pick_block(s, blk_target)
    pairs = heads // 2
    w_spec = lambda shape: pl.BlockSpec(shape, lambda b, i: (0,) * len(shape))
    kv_spec = lambda last: pl.BlockSpec(
        (1, pairs, 2 * PAIR if last == PAIR else PAIR,
         last), lambda b, i: (b, 0, 0, 0))
    return pl.pallas_call(
        functools.partial(
            _head_kernel, pairs=pairs, kv_len=kv_len, scale=scale,
            epsilon=epsilon,
        ),
        grid=(b, s // blk),
        in_specs=[
            pl.BlockSpec((1, blk, c), lambda b, i: (b, i, 0)),
            w_spec((c, c)), w_spec((1, c)),
            w_spec((1, c)), w_spec((1, c)),
            w_spec((c, c)), w_spec((c, c)), w_spec((1, c)),
            kv_spec(2 * PAIR), kv_spec(PAIR),
            w_spec((1, c)), w_spec((1, c)),
            w_spec((c, c)), w_spec((c, c)), w_spec((1, c)),
            kv_spec(2 * PAIR), kv_spec(PAIR),
        ],
        out_specs=pl.BlockSpec((1, blk, c), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, wpi, _row(bpi), _row(g1), _row(b1), wq1, wo1, _row(bo1), k21, v21,
      _row(g2), _row(b2), wq2, wo2, _row(bo2), k22, v22)


def cross_attention_head(
    x: jnp.ndarray,                    # (B, S, C) GroupNorm'd input
    wpi: jnp.ndarray, bpi: jnp.ndarray,  # proj_in kernel/bias
    attn1: tuple,                      # (gamma, beta, wq, wo, bo, k, v)
    attn2: tuple,
    *,
    heads: int,
    scale: float,
    epsilon: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """proj_in → LN1+attn1 → LN2+attn2, one fused pass (VSR only-cross)."""
    g1, b1, wq1, wo1, bo1, k1, v1 = attn1
    g2, b2, wq2, wo2, bo2, k2_, v2_ = attn2
    kv_len = k1.shape[1]
    dt = x.dtype
    f32 = jnp.float32
    k21, v21 = pack_kv_pairs(k1.astype(dt), v1.astype(dt), heads)
    k22, v22 = pack_kv_pairs(k2_.astype(dt), v2_.astype(dt), heads)
    return _head_3d(
        x, wpi.astype(dt), bpi.astype(f32),
        g1.astype(f32), b1.astype(f32), wq1.astype(dt), wo1.astype(dt),
        bo1.astype(f32), k21, v21,
        g2.astype(f32), b2.astype(f32), wq2.astype(dt), wo2.astype(dt),
        bo2.astype(f32), k22, v22,
        heads, kv_len, scale, epsilon,
        _blk_target("LAVIE_CB_BLK"), interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("inner", "epsilon", "blk_target", "interpret")
)
def _tail_3d(x, r, g3, b3, w0, b0, w2, b2, wpo, bpo, inner, epsilon,
             blk_target=256, interpret=False):
    b, s, c = x.shape
    blk = _pick_block(s, blk_target)
    w_spec = lambda shape: pl.BlockSpec(shape, lambda b, i: (0,) * len(shape))
    return pl.pallas_call(
        functools.partial(_tail_kernel, inner=inner, epsilon=epsilon),
        grid=(b, s // blk),
        in_specs=[
            pl.BlockSpec((1, blk, c), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, blk, c), lambda b, i: (b, i, 0)),
            w_spec((1, c)), w_spec((1, c)),
            w_spec((c, 2 * inner)), w_spec((1, 2 * inner)),
            w_spec((inner, c)), w_spec((1, c)),
            w_spec((c, c)), w_spec((1, c)),
        ],
        out_specs=pl.BlockSpec((1, blk, c), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, r, _row(g3), _row(b3), w0, _row(b0), w2, _row(b2), wpo, _row(bpo))


def transformer_tail(
    x: jnp.ndarray,      # (B, S, C) post-temporal activation
    residual: jnp.ndarray,  # (B, S, C) transformer outer residual
    g3: jnp.ndarray, b3: jnp.ndarray,          # LN3 params
    w0: jnp.ndarray, b0: jnp.ndarray,          # GEGLU net.0.proj (C, 2I)
    w2: jnp.ndarray, b2: jnp.ndarray,          # GEGLU net.2 (I, C)
    wpo: jnp.ndarray, bpo: jnp.ndarray,        # proj_out
    *,
    epsilon: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    """proj_out(GEGLU_ff(LN3(x)) + x) + residual in one fused pass."""
    inner = w2.shape[0]
    dt = x.dtype
    f32 = jnp.float32
    return _tail_3d(
        x, residual, g3.astype(f32), b3.astype(f32),
        w0.astype(dt), b0.astype(f32), w2.astype(dt), b2.astype(f32),
        wpo.astype(dt), bpo.astype(f32), inner, epsilon,
        _blk_target("LAVIE_CB_TAIL_BLK", 256), interpret,
    )
