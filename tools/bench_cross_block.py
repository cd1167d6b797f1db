"""Correctness + A/B bench for the fused transformer-block kernels
(kernels/cross_block.py): single LN+cross-attn, proj_in+attn1+attn2 head,
and LN3+GEGLU+proj_out tail — against the unfused XLA composition at the
real VSR shapes. Chained dedupe-proof harness (DESIGN.md benchmark hygiene).

Usage: python tools/bench_cross_block.py [--check-only] [--reps N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.lavie_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from lavie_tpu.kernels.attention import _xla_attention
from lavie_tpu.kernels.cross_block import (
    cross_attention_head,
    fused_ln_cross_attention,
    transformer_tail,
)

# (name, B, S, C, heads, Lkv) — B folds frames (VSR half-CFG batch-1)
SHAPES = [
    ("vsr_L1", 8, 160 * 256, 512, 8, 77),
    ("vsr_L2", 8, 80 * 128, 512, 8, 77),
]


def ln(x, gamma, beta, eps=1e-5):
    mean = jnp.mean(x, axis=-1, dtype=jnp.float32, keepdims=True)
    mean_sq = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       dtype=jnp.float32, keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    xn = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
    return xn * gamma.astype(x.dtype) + beta.astype(x.dtype)


def attn_unfused(x, gamma, beta, wq, wo, bo, k, v, heads, scale):
    b, s, c = x.shape
    d = c // heads
    xn = ln(x, gamma, beta)
    q = (xn @ wq).reshape(b, s, heads, d)
    kk = k.reshape(b, -1, heads, d)
    vv = v.reshape(b, -1, heads, d)
    out = _xla_attention(q, kk, vv, None, scale).reshape(b, s, c)
    return (out @ wo) + bo.astype(x.dtype) + x


def head_unfused(x, wpi, bpi, a1, a2, heads, scale):
    xp = (x @ wpi) + bpi.astype(x.dtype)
    x1 = attn_unfused(xp, *a1, heads, scale)
    return attn_unfused(x1, *a2, heads, scale)


def tail_unfused(x, r, g3, b3, w0, b0, w2, b2, wpo, bpo):
    inner = w2.shape[0]
    xn = ln(x, g3, b3)
    h = (xn @ w0) + b0.astype(x.dtype)
    hidden, gate = h[:, :, :inner], h[:, :, inner:]
    import flax.linen as nn

    y = (hidden * nn.gelu(gate, approximate=False)) @ w2 + b2.astype(x.dtype)
    y = y + x
    return (y @ wpo) + bpo.astype(x.dtype) + r


def bench(label, fn, x, reps, ws=()):
    """ws: arrays threaded as jit arguments so large weights don't bake into
    the program proto (the axon remote-compile endpoint caps body size)."""
    @jax.jit
    def run(x, *ws):
        acc = jnp.zeros((), jnp.float32)
        xx = x
        for it in range(reps):
            o = fn(xx + it * 1e-3, *ws)
            acc = acc + o[0, 0, 0].astype(jnp.float32)
            xx = x + o * 1e-6
        return acc

    np.asarray(run(x, *ws))  # warm
    t0 = time.perf_counter()
    np.asarray(run(x, *ws))
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"  {label:10s}: {dt:7.2f} ms/call")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--which", default="single,head,tail")
    args = ap.parse_args()
    which = args.which.split(",")

    for name, b, s, c, heads, lkv in SHAPES:
        keys = jax.random.split(jax.random.PRNGKey(0), 40)
        ki = iter(keys)
        nrm = lambda shape, scl=1.0, dt=jnp.bfloat16: (
            jax.random.normal(next(ki), shape, dt) * scl)
        x = nrm((b, s, c))
        scale = (c // heads) ** -0.5
        mk_attn = lambda: (
            nrm((c,), 0.1, jnp.float32) + 1.0, nrm((c,), 0.1, jnp.float32),
            nrm((c, c), c ** -0.5), nrm((c, c), c ** -0.5),
            nrm((c,), 0.1, jnp.float32), nrm((b, lkv, c)), nrm((b, lkv, c)),
        )
        a1, a2 = mk_attn(), mk_attn()
        a1_bf = a1[:4] + (a1[4].astype(jnp.bfloat16),) + a1[5:]
        a2_bf = a2[:4] + (a2[4].astype(jnp.bfloat16),) + a2[5:]
        wpi, bpi = nrm((c, c), c ** -0.5), nrm((c,), 0.1, jnp.float32)

        print(f"== {name} ==")
        if "single" in which:
            ref = attn_unfused(x, *a1_bf, heads, scale)
            out = fused_ln_cross_attention(
                x, a1[0], a1[1], a1[2], a1[3], a1[4], a1[5], a1[6],
                heads=heads, scale=scale)
            d = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - out.astype(jnp.float32))))
            print(f" single: max|Δ| = {d:.3e}")
            if not args.check_only:
                bench("xla", lambda xx: attn_unfused(xx, *a1_bf, heads, scale), x, args.reps)
                bench("fused", lambda xx: fused_ln_cross_attention(
                    xx, a1[0], a1[1], a1[2], a1[3], a1[4], a1[5], a1[6],
                    heads=heads, scale=scale), x, args.reps)
        if "head" in which:
            ref = head_unfused(x, wpi, bpi, a1_bf, a2_bf, heads, scale)
            out = cross_attention_head(x, wpi, bpi, a1, a2, heads=heads, scale=scale)
            d = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - out.astype(jnp.float32))))
            rel = d / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
            print(f" head: max|Δ| = {d:.3e} (rel {rel:.2e})")
            if not args.check_only:
                bench("xla", lambda xx: head_unfused(xx, wpi, bpi, a1_bf, a2_bf, heads, scale), x, args.reps)
                bench("fused", lambda xx: cross_attention_head(
                    xx, wpi, bpi, a1, a2, heads=heads, scale=scale), x, args.reps)
        if "tail" in which:
            inner = 4 * c
            r = nrm((b, s, c))
            g3 = nrm((c,), 0.1, jnp.float32) + 1.0
            b3 = nrm((c,), 0.1, jnp.float32)
            w0, b0 = nrm((c, 2 * inner), c ** -0.5), nrm((2 * inner,), 0.1, jnp.float32)
            w2, b2 = nrm((inner, c), inner ** -0.5), nrm((c,), 0.1, jnp.float32)
            wpo, bpo = nrm((c, c), c ** -0.5), nrm((c,), 0.1, jnp.float32)
            ref = tail_unfused(x, r, g3, b3, w0, b0.astype(jnp.bfloat16), w2,
                               b2.astype(jnp.bfloat16), wpo, bpo)
            out = transformer_tail(x, r, g3, b3, w0, b0, w2, b2, wpo, bpo)
            d = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - out.astype(jnp.float32))))
            rel = d / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
            print(f" tail: max|Δ| = {d:.3e} (rel {rel:.2e})")
            if not args.check_only:
                bench("xla", lambda xx, r, w0, w2: tail_unfused(
                    xx, r, g3, b3, w0, b0.astype(jnp.bfloat16), w2,
                    b2.astype(jnp.bfloat16), wpo, bpo), x, args.reps,
                    ws=(r, w0, w2))
                bench("fused", lambda xx, r, w0, w2: transformer_tail(
                    xx, r, g3, b3, w0, b0, w2, b2, wpo, bpo), x, args.reps,
                    ws=(r, w0, w2))


if __name__ == "__main__":
    main()
