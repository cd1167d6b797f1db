"""A/B: XLA int8 (k,1)-window temporal conv vs the Pallas fused resblock conv.

VERDICT r3 #3: XLA's int8 CONV lowering measured 1.93x on the VSR spatial
conv bucket while Mosaic int8 dots run at ~1x bf16 rate
(tools/bench_int8_pallas.py, DESIGN.md) — so the remaining 257.7 ms/fwd of
Pallas custom-calls can only reach the 2x int8 MXU if their math is
reformulated as XLA ops. This tool measures that option for the biggest
custom-call family, the temporal-resblock (k,1,1) convs
(reference: vsr/models/resnet.py:220-316 Conv3d k=(5,1,1)/(3,1,1)):

  a) Pallas gn_silu_tconv_sfc bf16  — the shipped fused path
     (GN-apply + SiLU + k-tap conv in one VMEM pass)
  b) XLA conv bf16: lax.conv_general_dilated on (B, F, S, C) with window
     (k, 1) — what the unfused graph would run (PLUS it needs a separate
     GN-apply+SiLU bandwidth pass, measured separately below)
  c) XLA conv int8 (pre-quantized operands, int32 accum) — the turbo
     candidate (PLUS GN-apply+SiLU+quantize pass)
  d) the standalone GN-apply+SiLU(+quantize) elementwise pass, to price
     the fusion the Pallas kernel provides

Shapes: the VSR UNet's temporal modules at 8x320x512 half-CFG
(L0 163840x256, L1 40960x512, L2 10240x512, L3/mid 2560x1024).

Timing: `reps` applications CHAINED inside one jit program (single
dispatch — per-dispatch tunnel latency otherwise swamps the op; see
.claude/skills/verify and tools/bench_temporal.py's chain harness).

Usage: python tools/bench_int8_tconv.py [--reps 20] [--taps 5]
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

from lavie_tpu.kernels.temporal_resblock import (  # noqa: E402
    gn_silu_tconv_sfc,
    resblock_conv_supported,
)

F = 8


CHAIN = 3        # applications chained per program (payload-bounded: the
                 # remote compiler 413s on long pallas chains)
DISPATCHES = 8   # timed dispatches, inputs varied per dispatch (tunnel dedup)


def time_chain(fn, reps=None):
    """fn(it) is a jitted CHAIN-long application chain whose inputs vary with
    `it`; times DISPATCHES dispatches pipelined back-to-back. Returns ms per
    single application."""
    r = fn(0)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(DISPATCHES):
        r = fn(i + 1)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / (DISPATCHES * CHAIN) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--taps", type=int, default=5)
    args = ap.parse_args()
    k = args.taps

    print(f"device: {jax.devices()[0]}  taps={k}  F={F}  chain={CHAIN}x{DISPATCHES} dispatches",
          flush=True)

    # L0 LAST: its chained programs are the remote compiler's slowest —
    # the smaller shapes land first even if L0 hangs
    shapes = [
        ("L3", 2560, 1024, 1024),
        ("L2", 10240, 512, 512),
        ("L1", 40960, 512, 512),
        ("L0", 163840, 256, 256),
    ]
    key = jax.random.PRNGKey(0)

    for tag, s, cin, cout in shapes:
        conv_flops = 2 * F * s * cin * cout * k  # upper bound (edge taps less)
        line = [f"{tag} S={s} C={cin}->{cout}:"]

        def make_x(it, shape, dt):
            # inputs generated ON DEVICE inside the jit — big host example
            # buffers in the compile request 413 the axon remote compiler
            base = (jax.lax.broadcasted_iota(jnp.float32, shape, len(shape) - 1)
                    % 13.0) * 0.05 - 0.3
            if dt == jnp.int8:
                return (base * 40 + (it % 3)).astype(jnp.int8)
            return (base + it * 1e-3).astype(dt)

        # (a) Pallas fused bf16 — chained: out feeds back as next x
        if resblock_conv_supported(F, s, cin, cout, k) and cin == cout:
            wa = jnp.ones((1, cin), jnp.float32)
            ua = jnp.zeros((1, cin), jnp.float32)
            wc = jax.random.normal(key, (k, cin, cout), jnp.bfloat16) * 0.02
            bo = jnp.zeros((1, cout), jnp.float32)

            @jax.jit
            def pallas_chain(it, _wc=wc, _wa=wa, _ua=ua, _bo=bo):
                x = make_x(it, (1, s, F, cin), jnp.bfloat16)
                for _ in range(CHAIN):
                    x = gn_silu_tconv_sfc(x, _wa, _ua, _wc, _bo)
                return jnp.sum(x.astype(jnp.float32))

            try:
                ms = time_chain(pallas_chain)
                line.append(f"pallas_bf16 {ms:7.2f} ms {conv_flops/ms/1e9:6.1f} TF/s")
            except Exception as e:
                line.append(f"pallas_bf16 FAILED {type(e).__name__}: {str(e)[:60]}")
        else:
            line.append("pallas_bf16 unsupported")

        # (b)/(c) XLA conv over (1, F, S, C) with window (k, 1), chained with
        # a cast between applications (the real graph has a dequant epilogue)
        def build_conv_chain(dt_in, acc_dt):
            if dt_in == jnp.int8:
                ww = jnp.ones((k, 1, cin, cout), jnp.int8)
            else:
                ww = jax.random.normal(key, (k, 1, cin, cout), dt_in) * 0.02

            @jax.jit
            def f(it, w=ww):
                x = make_x(it, (1, F, s, cin), dt_in)
                for _ in range(CHAIN):
                    y = jax.lax.conv_general_dilated(
                        x, w, (1, 1), ((k // 2, k // 2), (0, 0)),
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=acc_dt,
                    )
                    x = y.astype(dt_in)  # feed back (dequant-epilogue analog)
                return jnp.sum(y.astype(jnp.float32))
            return f

        for nm, dt_in, acc in (("xla_bf16", jnp.bfloat16, jnp.float32),
                               ("xla_int8", jnp.int8, jnp.int32)):
            try:
                ms = time_chain(build_conv_chain(dt_in, acc))
                line.append(f"{nm} {ms:7.2f} ms {conv_flops/ms/1e9:6.1f} TF/s")
            except Exception as e:
                line.append(f"{nm} FAILED {type(e).__name__}: {str(e)[:80]}")

        # (d) the elementwise pass the unfused forms add: GN-apply+SiLU
        # (+quantize for turbo), chained
        g_w = jnp.ones((cin,), jnp.float32)
        g_u = jnp.zeros((cin,), jnp.float32)

        @jax.jit
        def gnsilu_chain(it):
            x = make_x(it, (1, F, s, cin), jnp.bfloat16)
            for _ in range(CHAIN):
                h = x.astype(jnp.float32) * g_w + g_u
                x = (h * jax.nn.sigmoid(h)).astype(jnp.bfloat16)
            return jnp.sum(x.astype(jnp.float32))

        @jax.jit
        def gnsiluq_chain(it):
            x = make_x(it, (1, F, s, cin), jnp.bfloat16)
            for _ in range(CHAIN):
                h = x.astype(jnp.float32) * g_w + g_u
                h = h * jax.nn.sigmoid(h)
                sc = jnp.maximum(jnp.max(jnp.abs(h)), 1e-12) / 127.0
                q = jnp.clip(jnp.round(h / sc), -127, 127).astype(jnp.int8)
                x = (q.astype(jnp.float32) * sc).astype(jnp.bfloat16)
            return jnp.sum(x.astype(jnp.float32))

        gb = (2 + 2) * F * s * cin / 1e9  # bf16 read + write per application
        for nm, f in (("gnsilu_pass", gnsilu_chain),
                      ("gnsilu_quant_pass", gnsiluq_chain)):
            ms = time_chain(f)
            line.append(f"{nm} {ms:6.2f} ms {gb/ms*1e3:5.0f} GB/s")

        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
