"""Pallas fused GN-apply → SiLU → k-tap temporal conv for ResnetBlock3DCNN.

The VSR TemporalModule3D's temporal resnet (reference:
vsr/models/resnet.py:220-316 — GN→SiLU→Conv3d(k,1,1)→(+temb)→GN→SiLU→
Conv3d(3,1,1)→+residual) is the UNet's only true 3D conv. Both XLA forms
measured poorly in context:

  - the 5D (k,1,1) `lax.conv` gets a frame-minor T(8,128) layout that
    forces ~1-6 ms layout copies at every module boundary and leaves the
    shift-conv residual add unfused (~10 ms pure-bandwidth at the L0 level);
  - the (C → k·O) GEMM-shift form keeps standard layouts but writes a
    k×-wide intermediate and re-reads it k times for the shifted adds —
    measured 47-103 TF/s at 580-670 GB/s (bandwidth-bound), and at the L0
    level the 6.7 GB intermediate OOMs HBM outright.

This kernel does the whole normalize→silu→conv chain per token block in
VMEM: grid (B, S/blk), block (1, F, blk, C) with F small (the VSR window is
8 frames). Each frame's normalized+silu'd activation is computed once, then
the k-tap conv is F·k (blk,C)×(C,O) MXU GEMMs accumulated in fp32 — no
wide intermediate, no shifted-add passes, standard row-major layouts at the
boundary. GroupNorm *statistics* stay outside as XLA per-channel reductions
(they need global (F,S) reductions — measured 0.64 ms each, near floor) and
are folded with gamma/beta into a per-(batch,channel) affine (w, u); the
time-embedding projection folds into the first conv's output bias and the
block residual into the second conv's accumulator.

HBM traffic per conv pass: read x + write y (+ read residual) — vs the
unfused chain's separate GN-apply, silu, conv, add passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024


def _pick_block(s: int, frames: int, cin: int, cout: int, ktaps: int,
                with_res: bool, itemsize: int = 2, quant: str = "none") -> int:
    """Largest power-of-2 token block (≥128) whose VMEM footprint fits:
    x + silu'd copy + out (+ residual) blocks, the (k,C,O) weights, and the
    fp32 accumulator. `itemsize` is the activation dtype's bytes (2 bf16 /
    4 fp32 — fp32 runs halve the admissible block). quant="int8" adds the
    int8 activation copies (weights shrink to 1 byte but the estimate keeps
    the bf16 figure as slack)."""
    blk = 512
    while blk >= 128:
        if s % blk == 0:
            est = (
                frames * blk * cin * itemsize * 2    # x block + normalized copy
                + frames * blk * cout * itemsize     # out block
                + (frames * blk * cout * itemsize if with_res else 0)
                + (frames * blk * cin if quant == "int8" else 0)  # int8 copies
                + ktaps * cin * cout * itemsize      # conv weights
                + blk * cout * 4                     # fp32/int32 accumulator
            )
            if est <= _VMEM_BUDGET:
                return blk
        blk //= 2
    return 0


def resblock_conv_supported(frames: int, s: int, cin: int, cout: int,
                            ktaps: int, with_res: bool = False,
                            itemsize: int = 2) -> bool:
    """Lane-aligned channels, modest frame count, and a fitting block."""
    return (
        cin % 128 == 0
        and cout % 128 == 0
        and 2 <= frames <= 32
        and _pick_block(s, frames, cin, cout, ktaps, with_res, itemsize) >= 128
    )


def _silu(x):
    return x * (1.0 / (1.0 + jnp.exp(-x)))


def _kernel(x_ref, wa_ref, ua_ref, wc_ref, bo_ref, *rest, frames, ktaps,
            with_res, activation, emit_stats):
    rest = list(rest)
    res_ref = rest.pop(0) if with_res else None
    o_ref = rest.pop(0)
    s1_ref = rest.pop(0) if emit_stats else None
    s2_ref = rest.pop(0) if emit_stats else None
    x = x_ref[0]  # (F, blk, C)
    pad = ktaps // 2
    f32 = jnp.float32
    if activation == "none":
        # plain conv (+residual) — e.g. the TemporalModule3D zero-init
        # shift conv fused with its module residual add
        xn = [x[u] for u in range(frames)]
    else:
        wa = wa_ref[0].astype(x.dtype)  # (1, C) per-batch GN affine scale
        ua = ua_ref[0].astype(x.dtype)  # (1, C) per-batch GN affine shift
        # normalize + silu each frame once (silu in fp32 — one VPU pass)
        xn = [
            _silu((x[u] * wa + ua).astype(f32)).astype(x.dtype)
            for u in range(frames)
        ]
    bo = bo_ref[0]  # (1, O) fp32: conv bias (+ folded temb)
    if emit_stats:
        ones = jnp.ones((1, x.shape[1]), f32)
        loc1 = jnp.zeros((1, bo.shape[-1]), f32)
        loc2 = jnp.zeros((1, bo.shape[-1]), f32)
    for f in range(frames):
        acc = jnp.broadcast_to(bo, (x.shape[1], bo.shape[-1])).astype(f32)
        for j in range(ktaps):
            u = f + j - pad
            if 0 <= u < frames:
                acc = acc + jax.lax.dot_general(
                    xn[u], wc_ref[j],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                )
        if with_res:
            acc = acc + res_ref[0, f].astype(f32)
        out = acc.astype(o_ref.dtype)
        o_ref[0, f] = out
        if emit_stats:
            # per-channel Σ and Σ² of the OUTPUT (at output precision, so
            # the stats equal a consumer reading o back) — cross-sublane
            # reduction via a (1,blk)·(blk,C) MXU dot (jnp.sum(axis=0)
            # crashes Mosaic on fp32 tiles)
            of = out.astype(f32)
            loc1 = loc1 + jax.lax.dot_general(
                ones, of, (((1,), (0,)), ((), ())), preferred_element_type=f32
            )
            loc2 = loc2 + jax.lax.dot_general(
                ones, of * of, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
    if emit_stats:
        @pl.when(pl.program_id(1) == 0)
        def _init():
            s1_ref[0] = loc1
            s2_ref[0] = loc2

        @pl.when(pl.program_id(1) != 0)
        def _acc():
            s1_ref[0] = s1_ref[0] + loc1
            s2_ref[0] = s2_ref[0] + loc2


def _kernel_sfc(x_ref, wa_ref, ua_ref, wc_ref, bo_ref, *rest, frames, ktaps,
                cin, cout, with_res, activation, emit_stats, quant="none"):
    """Token-major variant: blocks are (blk, F·C) with frames as lane
    slices. Same math as _kernel; the block's rows are S-contiguous so the
    HBM slab is contiguous in the (B, S, F, C) row-major layout — which is
    bit-identical to XLA's conv layout for (B, F, H, W, C) activations
    ({4,1,3,2,0}: memory order (H, W, F, C)), making the kernel boundary a
    bitcast instead of a 2–4 ms transpose copy at the VSR L0 level.

    quant="int8" (turbo, nn/quant.py semantics): the silu'd frame blocks
    share ONE symmetric activation scale (block abs-max / 127) so the k-tap
    accumulation stays int32 across taps; weights arrive pre-quantized with
    per-output-channel scales (ws_ref). Dequant = one fp32 scale-multiply
    per frame on the accumulator."""
    rest = list(rest)
    ws_ref = rest.pop(0) if quant == "int8" else None
    res_ref = rest.pop(0) if with_res else None
    o_ref = rest.pop(0)
    s1_ref = rest.pop(0) if emit_stats else None
    s2_ref = rest.pop(0) if emit_stats else None
    x = x_ref[0]  # (blk, F·C)
    pad = ktaps // 2
    f32 = jnp.float32
    if activation == "none":
        xn = [x[:, u * cin:(u + 1) * cin] for u in range(frames)]
    else:
        wa = wa_ref[0].astype(x.dtype)  # (1, C)
        ua = ua_ref[0].astype(x.dtype)
        xn = [
            _silu(((x[:, u * cin:(u + 1) * cin]) * wa + ua).astype(f32)).astype(x.dtype)
            for u in range(frames)
        ]
    if quant == "int8":
        am = jnp.max(jnp.abs(xn[0].astype(f32)), keepdims=True)
        for u in range(1, frames):
            am = jnp.maximum(am, jnp.max(jnp.abs(xn[u].astype(f32)), keepdims=True))
        a_scale = jnp.maximum(am, 1e-12) / 127.0  # (1, 1) fp32
        inv = 1.0 / a_scale
        xn = [
            jnp.clip(jnp.round(xn[u].astype(f32) * inv), -127.0, 127.0).astype(jnp.int8)
            for u in range(frames)
        ]
        deq = a_scale * ws_ref[0]  # (1, O) fp32
    bo = bo_ref[0]  # (1, O) fp32
    if emit_stats:
        ones = jnp.ones((1, x.shape[0]), f32)
        loc1 = jnp.zeros((1, cout), f32)
        loc2 = jnp.zeros((1, cout), f32)
    for f in range(frames):
        if quant == "int8":
            iacc = jnp.zeros((x.shape[0], cout), jnp.int32)
            for j in range(ktaps):
                u = f + j - pad
                if 0 <= u < frames:
                    iacc = iacc + jax.lax.dot_general(
                        xn[u], wc_ref[j],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
            acc = iacc.astype(f32) * deq + bo
        else:
            acc = jnp.broadcast_to(bo, (x.shape[0], cout)).astype(f32)
            for j in range(ktaps):
                u = f + j - pad
                if 0 <= u < frames:
                    acc = acc + jax.lax.dot_general(
                        xn[u], wc_ref[j],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32,
                    )
        if with_res:
            acc = acc + res_ref[0][:, f * cout:(f + 1) * cout].astype(f32)
        out = acc.astype(o_ref.dtype)
        o_ref[0, :, f * cout:(f + 1) * cout] = out
        if emit_stats:
            of = out.astype(f32)
            loc1 = loc1 + jax.lax.dot_general(
                ones, of, (((1,), (0,)), ((), ())), preferred_element_type=f32
            )
            loc2 = loc2 + jax.lax.dot_general(
                ones, of * of, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
    if emit_stats:
        @pl.when(pl.program_id(1) == 0)
        def _init():
            s1_ref[0] = loc1
            s2_ref[0] = loc2

        @pl.when(pl.program_id(1) != 0)
        def _acc():
            s1_ref[0] = s1_ref[0] + loc1
            s2_ref[0] = s2_ref[0] + loc2


@functools.partial(
    jax.jit,
    static_argnames=("frames", "ktaps", "with_res", "activation",
                     "emit_stats", "interpret", "quant"),
)
def _conv_sfc(x, wa, ua, wc, bo, res, frames, ktaps, with_res, activation,
              emit_stats, interpret, quant="none"):
    """x: (B, S, F·C) token-major. Returns (B, S, F·O) (+ stats)."""
    b, s, fc = x.shape
    cin = fc // frames
    cout = wc.shape[-1]
    blk = _pick_block(s, frames, cin, cout, ktaps, with_res,
                      jnp.dtype(x.dtype).itemsize, quant)
    w_spec = lambda shape: pl.BlockSpec(shape, lambda bb, i: (0,) * len(shape))
    in_specs = [
        pl.BlockSpec((1, blk, fc), lambda bb, i: (bb, i, 0)),
        pl.BlockSpec((1, 1, cin), lambda bb, i: (bb, 0, 0)),
        pl.BlockSpec((1, 1, cin), lambda bb, i: (bb, 0, 0)),
        w_spec((ktaps, cin, cout)),
        pl.BlockSpec((1, 1, cout), lambda bb, i: (bb, 0, 0)),
    ]
    if quant == "int8":
        # per-output-channel symmetric weight quant over (k, C) — matches
        # nn/quant.py::int8_conv2d; the pass over the (k,C,O) taps is tiny
        wf = wc.astype(jnp.float32)
        w_amax = jnp.max(jnp.abs(wf), axis=(0, 1), keepdims=True)
        w_scale = jnp.maximum(w_amax, 1e-12) / 127.0  # (1, 1, O)
        wc = jnp.clip(jnp.round(wf / w_scale), -127.0, 127.0).astype(jnp.int8)
    args = [x, wa[:, None], ua[:, None], wc, bo[:, None]]
    if quant == "int8":
        in_specs.append(w_spec((1, cout)))
        args.append(w_scale[0])
    if with_res:
        in_specs.append(pl.BlockSpec((1, blk, frames * cout), lambda bb, i: (bb, i, 0)))
        args.append(res)
    out_specs = [pl.BlockSpec((1, blk, frames * cout), lambda bb, i: (bb, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((b, s, frames * cout), x.dtype)]
    if emit_stats:
        out_specs += [pl.BlockSpec((1, 1, cout), lambda bb, i: (bb, 0, 0))] * 2
        out_shape += [jax.ShapeDtypeStruct((b, 1, cout), jnp.float32)] * 2
    out = pl.pallas_call(
        functools.partial(
            _kernel_sfc, frames=frames, ktaps=ktaps, cin=cin, cout=cout,
            with_res=with_res, activation=activation, emit_stats=emit_stats,
            quant=quant,
        ),
        grid=(b, s // blk),
        in_specs=in_specs,
        out_specs=out_specs if emit_stats else out_specs[0],
        out_shape=out_shape if emit_stats else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    if emit_stats:
        y, s1, s2 = out
        return y, s1[:, 0], s2[:, 0]
    return out


def gn_silu_tconv_sfc(
    x: jnp.ndarray,        # (B, S, F, C) token-major video activation
    wa: jnp.ndarray | None,  # (B, C) folded GN affine scale
    ua: jnp.ndarray | None,  # (B, C) folded GN affine shift
    conv_w: jnp.ndarray,   # (k, C, O) temporal conv taps
    out_bias: jnp.ndarray, # (B, O) conv bias (+ folded temb), fp32
    residual: jnp.ndarray | None = None,  # (B, S, F, O)
    *,
    activation: str = "silu",
    emit_stats: bool = False,
    interpret: bool = False,
    quant: str = "none",
):
    """gn_silu_tconv on the token-major (B, S, F, C) view. The (B,S,F,C)
    row-major layout matches XLA's conv layout for the same data as
    (B,F,H,W,C), so callers sitting between convolutions reach this kernel
    through bitcasts (see nn/resnet.py ResnetBlock3DCNN._fused 5D path).
    quant="int8" runs the taps on the 2×-rate int8 MXU (turbo mode)."""
    b, s, frames, c = x.shape
    ktaps = conv_w.shape[0]
    dt = x.dtype
    if wa is None:
        wa = jnp.ones((b, c), jnp.float32)
        ua = jnp.zeros((b, c), jnp.float32)
    res = (
        residual.reshape(b, s, -1) if residual is not None
        else jnp.zeros((), dt)
    )
    out = _conv_sfc(
        x.reshape(b, s, frames * c), wa.astype(jnp.float32),
        ua.astype(jnp.float32), conv_w.astype(dt),
        out_bias.astype(jnp.float32), res,
        frames, ktaps, residual is not None, activation, emit_stats, interpret,
        quant,
    )
    cout = conv_w.shape[-1]
    if emit_stats:
        y, s1, s2 = out
        return y.reshape(b, s, frames, cout), s1, s2
    return out.reshape(b, s, frames, cout)


@functools.partial(
    jax.jit,
    static_argnames=("frames", "ktaps", "with_res", "activation",
                     "emit_stats", "interpret"),
)
def _conv_4d(x, wa, ua, wc, bo, res, frames, ktaps, with_res, activation,
             emit_stats, interpret):
    b, f, s, cin = x.shape
    cout = wc.shape[-1]
    blk = _pick_block(s, frames, cin, cout, ktaps, with_res,
                      jnp.dtype(x.dtype).itemsize)
    w_spec = lambda shape: pl.BlockSpec(shape, lambda bb, i: (0,) * len(shape))
    in_specs = [
        pl.BlockSpec((1, f, blk, cin), lambda bb, i: (bb, 0, i, 0)),
        pl.BlockSpec((1, 1, cin), lambda bb, i: (bb, 0, 0)),
        pl.BlockSpec((1, 1, cin), lambda bb, i: (bb, 0, 0)),
        w_spec((ktaps, cin, cout)),
        pl.BlockSpec((1, 1, cout), lambda bb, i: (bb, 0, 0)),
    ]
    args = [x, wa[:, None], ua[:, None], wc, bo[:, None]]
    if with_res:
        in_specs.append(pl.BlockSpec((1, f, blk, cout), lambda bb, i: (bb, 0, i, 0)))
        args.append(res)
    out_specs = [pl.BlockSpec((1, f, blk, cout), lambda bb, i: (bb, 0, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((b, f, s, cout), x.dtype)]
    if emit_stats:
        # (B, 1, C) Σ / Σ² of the output, accumulated across the token-block
        # grid dim (sequential, index map constant in i)
        out_specs += [pl.BlockSpec((1, 1, cout), lambda bb, i: (bb, 0, 0))] * 2
        out_shape += [jax.ShapeDtypeStruct((b, 1, cout), jnp.float32)] * 2
    out = pl.pallas_call(
        functools.partial(
            _kernel, frames=frames, ktaps=ktaps, with_res=with_res,
            activation=activation, emit_stats=emit_stats,
        ),
        grid=(b, s // blk),
        in_specs=in_specs,
        out_specs=out_specs if emit_stats else out_specs[0],
        out_shape=out_shape if emit_stats else out_shape[0],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    if emit_stats:
        y, s1, s2 = out
        return y, s1[:, 0], s2[:, 0]
    return out


def gn_silu_tconv(
    x: jnp.ndarray,        # (B, F, S, C) token-flattened video activation
    wa: jnp.ndarray | None,  # (B, C) folded GN affine scale (inv·gamma)
    ua: jnp.ndarray | None,  # (B, C) folded GN affine shift (beta − mean·inv·gamma)
    conv_w: jnp.ndarray,   # (k, C, O) temporal conv taps
    out_bias: jnp.ndarray, # (B, O) conv bias (+ folded temb), fp32
    residual: jnp.ndarray | None = None,  # (B, F, S, O) added to the output
    *,
    activation: str = "silu",
    emit_stats: bool = False,
    interpret: bool = False,
    quant: str = "none",
):
    """silu(GN-affine(x)) ⊛_frames conv_w + out_bias (+ residual), fused.
    activation="none" skips the GN affine + silu (wa/ua may be None).
    emit_stats=True additionally returns per-channel (Σ, Σ²) of the output
    over (F, S) as two (B, C) fp32 arrays — a consumer GroupNorm's moments
    without re-reading the tensor."""
    if quant != "none":
        raise NotImplementedError(
            "int8 turbo is implemented only for the token-major sfc kernel"
        )
    frames = x.shape[1]
    ktaps = conv_w.shape[0]
    dt = x.dtype
    b = x.shape[0]
    if wa is None:
        wa = jnp.ones((b, x.shape[-1]), jnp.float32)
        ua = jnp.zeros((b, x.shape[-1]), jnp.float32)
    return _conv_4d(
        x, wa.astype(jnp.float32), ua.astype(jnp.float32), conv_w.astype(dt),
        out_bias.astype(jnp.float32),
        residual if residual is not None else jnp.zeros((), dt),
        frames, ktaps, residual is not None, activation, emit_stats, interpret,
    )
