"""Microbench: int8 vs bf16 matmul throughput inside a Pallas TPU kernel.

Go/no-go probe for int8 variants of the fused kernels (DESIGN.md round-3
turbo record says the remaining VSR custom-calls sit at their bf16
rooflines — the only lever left is the 2x-rate int8 MXU). Measures a
GEMM-loop kernel at the fused kernels' working shapes:

  - temporal_resblock tap GEMM: (blk, C) x (C, O), C=O in {256, 512, 1024}
  - cross_block projection GEMM: (S_blk, C) x (C, C), C=512

For each shape: bf16 dots, int8 dots (pre-quantized operands, int32 acc),
and int8 with in-kernel activation quantization (the real turbo pattern:
bf16 in, abs-max -> scale -> int8 -> dot -> dequant out).

Usage: python tools/bench_int8_pallas.py [--reps 50]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.lavie_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _loop_kernel(x_ref, w_ref, o_ref, *, inner, mode):
    x = x_ref[0]
    w = w_ref[...]
    f32 = jnp.float32
    if mode == "bf16":
        acc = jnp.zeros((x.shape[0], w.shape[1]), f32)
        for _ in range(inner):
            acc = acc + jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), preferred_element_type=f32)
        o_ref[0] = acc.astype(o_ref.dtype)
    elif mode == "int8":
        acc = jnp.zeros((x.shape[0], w.shape[1]), jnp.int32)
        for _ in range(inner):
            acc = acc + jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        o_ref[0] = acc.astype(o_ref.dtype)
    elif mode == "int8_dyn":
        # the turbo pattern: bf16 activations in, quantize once, dot `inner`
        # times (amortized like the k taps sharing one scale), dequant out
        xf = x.astype(f32)
        amax = jnp.max(jnp.abs(xf))
        scale = jnp.maximum(amax, 1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / scale), -127.0, 127.0).astype(jnp.int8)
        acc = jnp.zeros((x.shape[0], w.shape[1]), jnp.int32)
        for _ in range(inner):
            acc = acc + jax.lax.dot_general(
                xq, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        o_ref[0] = (acc.astype(f32) * scale).astype(o_ref.dtype)
    else:
        raise ValueError(mode)


def build(m, k, n, grid, inner, mode):
    if mode == "bf16":
        x = jnp.ones((grid, m, k), jnp.bfloat16)
        w = jnp.ones((k, n), jnp.bfloat16)
    elif mode == "int8":
        x = jnp.ones((grid, m, k), jnp.int8)
        w = jnp.ones((k, n), jnp.int8)
    else:
        x = jnp.ones((grid, m, k), jnp.bfloat16)
        w = jnp.ones((k, n), jnp.int8)
    out_dt = jnp.bfloat16 if mode != "int8" else jnp.int32
    fn = pl.pallas_call(
        functools.partial(_loop_kernel, inner=inner, mode=mode),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((1, m, k), lambda i: (i, 0, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, m, n), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((grid, m, n), out_dt),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )
    return jax.jit(lambda: fn(x, w))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}", flush=True)
    shapes = [
        # (m, k, n, grid, inner)  — inner dots per block to stay MXU-bound
        (512, 512, 512, 64, 8),
        (512, 1024, 1024, 32, 8),
        (512, 256, 256, 128, 8),
        (1024, 512, 512, 32, 8),
    ]
    for m, k, n, grid, inner in shapes:
        flops = 2 * m * k * n * grid * inner
        line = [f"({m}x{k}x{n}) grid={grid} inner={inner}:"]
        for mode in ("bf16", "int8", "int8_dyn"):
            try:
                fn = build(m, k, n, grid, inner, mode)
                r = fn()
                jax.block_until_ready(r)
                t0 = time.perf_counter()
                for _ in range(args.reps):
                    r = fn()
                jax.block_until_ready(r)
                dt = (time.perf_counter() - t0) / args.reps
                line.append(f"{mode} {flops/dt/1e12:7.1f} TF/s ({dt*1e3:.2f} ms)")
            except Exception as e:  # Mosaic may reject int8 dots
                line.append(f"{mode} FAILED: {type(e).__name__}: {str(e)[:120]}")
        print("  ".join(line), flush=True)

    # control: the same GEMMs at the XLA level (no Pallas) — dot_general and
    # the 1x1-conv spelling (XLA's int8 conv path measured 1.93x on the VSR
    # conv bucket, so this isolates WHERE the int8 MXU rate is reachable)
    m, k, n, reps_inner = 4096, 512, 512, 16

    def xla_dot(dt, acc_dt):
        x = jnp.ones((m, k), dt)
        w = jnp.ones((k, n), dt)

        def f():
            acc = None
            for i in range(reps_inner):
                xi = x if acc is None else x + acc[:, :k].astype(dt)
                acc = jax.lax.dot_general(
                    xi, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=acc_dt)
            return acc
        return jax.jit(f)

    def xla_conv(dt, acc_dt):
        x = jnp.ones((1, m // 64, 64, k), dt)
        w = jnp.ones((1, 1, k, n), dt)

        def f():
            acc = None
            for i in range(reps_inner):
                xi = x if acc is None else x + acc[..., :k].astype(dt)
                acc = jax.lax.conv_general_dilated(
                    xi, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=acc_dt)
            return acc
        return jax.jit(f)

    flops = 2 * m * k * n * reps_inner
    for tag, builder, dt, acc_dt in (
        ("xla dot bf16", xla_dot, jnp.bfloat16, jnp.float32),
        ("xla dot int8", xla_dot, jnp.int8, jnp.int32),
        ("xla 1x1conv bf16", xla_conv, jnp.bfloat16, jnp.float32),
        ("xla 1x1conv int8", xla_conv, jnp.int8, jnp.int32),
    ):
        try:
            fn = builder(dt, acc_dt)
            r = fn(); jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(args.reps):
                r = fn()
            jax.block_until_ready(r)
            dtm = (time.perf_counter() - t0) / args.reps
            print(f"{tag}: {flops/dtm/1e12:7.1f} TF/s ({dtm*1e3:.2f} ms)", flush=True)
        except Exception as e:
            print(f"{tag} FAILED: {type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
