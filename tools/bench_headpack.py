"""Measure VERDICT r3 #7a: can packing 3×d40 heads into 120/128 contraction
lanes cut the sparse-causal qk dot's MXU occupancy tax?

The cmajor flash kernel's inner qk dot is per-head:
    sT_h = dot(k_h (40, blk_k), q_h (40, blk_q), contract d=40)
with d=40 of 128 contraction lanes occupied (DESIGN.md "structural floor").
The only legal way to fuse 3 heads into ONE dot with K=120 is a
block-diagonal operand (head h's k occupies rows 40h:40h+40 and its own
blk_k column stripe; zeros elsewhere) — a dense stack would sum scores
across heads. Pass-model prediction: per 3 heads, separate = 3 padded-K
passes over (blk_k, blk_q) output tiles; packed = 1 K-pass over a 3×
TALLER (3·blk_k, blk_q) output → same total MXU tile-passes, plus the VPU
cost of building the block-diagonal tile. This tool measures all three
forms at the TSR L0 inner-dot shape so the answer is data, not a model:

  A perhead : 8 × dot(K=40)                  (shipped kernel's pattern)
  B packed3 : 2 × block-diag dot(K=120) + 2 × dot(K=40)  (8 heads realistically)
  C dense   : 1 × dot(K=320)  — WRONG MATH (sums heads); the no-tax
              ceiling the packing idea is hoping to approach.

Usage: python tools/bench_headpack.py [--cells 64] [--reps 8]

MEASURED OUTCOME (v5e, 2026-08, DESIGN.md "Round-4 head-packing"): the
packed3 kernel's block-diagonal construction (dual-axis strided scratch
writes) triggered an unrecoverable `TPU backend error (Internal)` during
the correctness check and wedged the axon worker for >10 minutes — do NOT
run this on a shared tunnel without accepting that risk. The question it
was built to answer is closed by the MXU pass model regardless (packed
K=120 trades 3 padded-K passes for 1 K-pass over a 3×-taller output =
identical tile-pass count), and the C dense variant's ceiling is
unreachable without mixing heads.
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
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.lavie_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

HEADS, D = 8, 40
C = HEADS * D
BLK_K, BLK_Q = 256, 1280


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel_perhead(k_ref, q_ref, o_ref, acc):
    acc[:] = jnp.zeros_like(acc)
    for h in range(HEADS):
        kh = k_ref[0, h * D:(h + 1) * D]
        qh = q_ref[0, h * D:(h + 1) * D]
        acc[:] += _dot(kh, qh)
    o_ref[0] = acc[:].astype(o_ref.dtype)


def _kernel_packed3(k_ref, q_ref, o_ref, acc, kbd):
    acc[:] = jnp.zeros_like(acc)
    for g in range(2):  # heads 3g..3g+2 block-diagonally packed, K=120
        kbd[:] = jnp.zeros_like(kbd)
        for j in range(3):
            h = 3 * g + j
            kbd[j * D:(j + 1) * D, j * BLK_K:(j + 1) * BLK_K] = \
                k_ref[0, h * D:(h + 1) * D]
        qp = q_ref[0, 3 * g * D:3 * (g + 1) * D]  # (120, blk_q) dense stack
        sT = _dot(kbd[:], qp)  # (3·blk_k, blk_q): per-head scores stacked on M
        acc[:] += sT[0:BLK_K] + sT[BLK_K:2 * BLK_K] + sT[2 * BLK_K:]
    for h in (6, 7):  # the 8-head tail stays per-head
        acc[:] += _dot(k_ref[0, h * D:(h + 1) * D], q_ref[0, h * D:(h + 1) * D])
    o_ref[0] = acc[:].astype(o_ref.dtype)


def _kernel_dense(k_ref, q_ref, o_ref, acc):
    # wrong math (cross-head sums) — the zero-tax ceiling only
    acc[:] = _dot(k_ref[0], q_ref[0])
    o_ref[0] = acc[:].astype(o_ref.dtype)


def _call(kernel, cells, extra_scratch=()):
    return pl.pallas_call(
        kernel,
        grid=(cells,),
        in_specs=[
            pl.BlockSpec((1, C, BLK_K), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, C, BLK_Q), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, BLK_K, BLK_Q), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((cells, BLK_K, BLK_Q), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((BLK_K, BLK_Q), jnp.float32)]
        + list(extra_scratch),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, default=64)
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument(
        "--run-packed3", action="store_true",
        help="ALSO run the B packed3 variant. DANGER: its block-diagonal "
        "dual-axis strided VMEM scratch writes trigger an unrecoverable "
        "'TPU backend error (Internal)' on the current toolchain and wedge "
        "the shared axon worker for >10 min (DESIGN.md round-4 "
        "head-packing). Default runs only the safe A/C variants.",
    )
    args = ap.parse_args()
    cells = args.cells

    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(cells, C, BLK_K).astype(np.float32), jnp.bfloat16)
    q = jnp.asarray(rng.randn(cells, C, BLK_Q).astype(np.float32), jnp.bfloat16)

    perhead = _call(_kernel_perhead, cells)
    dense = _call(_kernel_dense, cells)

    variants = [("A perhead", perhead)]
    if args.run_packed3:
        packed = _call(_kernel_packed3, cells,
                       [pltpu.VMEM((3 * D, 3 * BLK_K), jnp.bfloat16)])
        # correctness: packed must equal perhead exactly (same dots, reordered)
        a = np.asarray(perhead(k[:2], q[:2]), np.float32)
        b = np.asarray(packed(k[:2], q[:2]), np.float32)
        err = np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-8)
        print(f"packed3 vs perhead rel_err = {err:.2e}", flush=True)
        assert err < 2e-2
        variants.append(("B packed3", packed))
    variants.append(("C dense-ceiling", dense))

    useful = 2 * cells * HEADS * BLK_K * BLK_Q * D  # FLOPs actually needed

    for tag, fn in variants:
        @jax.jit
        def chain(k, q, fn=fn):
            acc = jnp.float32(0)
            for i in range(args.reps):
                o = fn(k + i * 1e-3, q)
                acc += jnp.sum(o[:, :1, :1].astype(jnp.float32))
            return acc

        jax.block_until_ready(chain(k, q))
        t0 = time.perf_counter()
        jax.block_until_ready(chain(k, q))
        dt = (time.perf_counter() - t0) / args.reps * 1e3
        print(f"  {tag}: {dt:7.3f} ms/application "
              f"({useful / dt * 1e-9:.1f} useful TF/s)", flush=True)


if __name__ == "__main__":
    main()
