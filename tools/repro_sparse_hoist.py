"""Minimal-repro hunt for the sparse-hoist compile hang (VERDICT r4 #7).

Round-4 finding: `flash_cmajor_sparse` (copy-free sparse-causal kv via block
index maps) compiles fine STANDALONE (~2 s) but embedded in the production
hybrid-scan chunk programs the axon remote compiler sat >27 min (the same
program with the materialized kv path compiles in ~4 min cold). The round-4
attribution was "data-dependent index maps", but the maps are static
arithmetic on grid indices — this tool builds the smallest scan program
that might reproduce the hang and A/Bs index-map formulations:

  A materialized : flash_cmajor over a concat'd kv (control — the shipped path)
  B sparse-where : the shipped flash_cmajor_sparse maps (jnp.where on b and j)
  C sparse-nowhere: same maps rewritten where-free —
       anchor = (b // f) * f           (frame 0 of this video)
       prev   = max(b - 1, anchor)     (frame i-1; frame 0 → itself)
       row    = anchor + (j >= half) * (prev - anchor)
     pure int arithmetic, no select on the kv axis.

Each variant compiles under a WALL-CLOCK GUARD (--guard seconds, default
300): compilation runs in a FRESH SUBPROCESS (os.fork() deadlocks under
JAX's threads — measured); past the guard it is killed and the variant is
recorded as HANG. Run this AFTER the round's
bench artifacts are captured (a hung remote compile can shadow the worker;
DESIGN.md round-4 + the wedge-hazard memory note).

Usage: python tools/repro_sparse_hoist.py [--steps 2] [--frames 4]
         [--c 128] [--s 256] [--guard 300] [--variants A,B,C]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# fresh compiles every run: the point is to measure compile time
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_sparse_nowhere(q, k, v, *, frames, heads, scale):
    """Variant C: flash_cmajor_sparse with WHERE-FREE index maps."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lavie_tpu.kernels.flash_attention import (
        _flash_cmajor_kernel, _pick_block,
    )

    bf, c, seq_q = q.shape
    s = k.shape[2]
    d = c // heads
    blk_q = _pick_block(seq_q, 1280)
    blk_k = _pick_block(s, 256)
    assert blk_q and blk_k
    half = s // blk_k
    kv_blocks = 2 * half
    f = frames

    def kv_index(b, i, j):
        anchor = (b // f) * f
        prev = jnp.maximum(b - 1, anchor)
        sel = (j >= half).astype(jnp.int32)  # 0 = anchor half, 1 = prev half
        return (anchor + sel * (prev - anchor), 0, j - sel * half)

    hs = max(heads, 8)
    return pl.pallas_call(
        functools.partial(
            _flash_cmajor_kernel, scale=scale, kv_blocks=kv_blocks,
            heads=heads, head_dim=d,
        ),
        grid=(bf, seq_q // blk_q, kv_blocks),
        in_specs=[
            pl.BlockSpec((1, c, blk_q), lambda b, i, j: (b, 0, i)),
            pl.BlockSpec((1, c, blk_k), kv_index),
            pl.BlockSpec((1, c, blk_k), kv_index),
        ],
        out_specs=pl.BlockSpec((1, c, blk_q), lambda b, i, j: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((bf, c, seq_q), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((hs, blk_q), jnp.float32),
            pltpu.VMEM((hs, blk_q), jnp.float32),
            pltpu.VMEM((c, blk_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)


def make_scan_program(variant, frames, c, s, heads, steps):
    """A hybrid-chunk-shaped program: lax.scan over `steps`, each step runs
    a projection + the sparse-causal attention + a residual update — the
    minimal skeleton of interpolate.py's denoise_scan_fn."""
    from lavie_tpu.kernels.flash_attention import flash_cmajor, flash_cmajor_sparse

    scale = 1.0 / np.sqrt(c // heads)

    def attn(x, w):
        # x: (BF, C, S) channel-major activations
        q = jnp.einsum("ec,bcs->bes", w, x)
        k = jnp.einsum("ec,bcs->bes", w, x)
        v = jnp.einsum("ec,bcs->bes", w, x)
        if variant == "A":
            bf = q.shape[0]
            anchor = jnp.repeat(
                k.reshape(bf // frames, frames, c, s)[:, :1], frames, axis=1
            ).reshape(bf, c, s)
            prev = jnp.concatenate(
                [k.reshape(bf // frames, frames, c, s)[:, :1],
                 k.reshape(bf // frames, frames, c, s)[:, :-1]], axis=1
            ).reshape(bf, c, s)
            kk = jnp.concatenate([anchor, prev], axis=-1)
            vanchor = jnp.repeat(
                v.reshape(bf // frames, frames, c, s)[:, :1], frames, axis=1
            ).reshape(bf, c, s)
            vprev = jnp.concatenate(
                [v.reshape(bf // frames, frames, c, s)[:, :1],
                 v.reshape(bf // frames, frames, c, s)[:, :-1]], axis=1
            ).reshape(bf, c, s)
            vv = jnp.concatenate([vanchor, vprev], axis=-1)
            return flash_cmajor(q, kk, vv, heads=heads, scale=scale)
        if variant == "B":
            return flash_cmajor_sparse(q, k, v, frames=frames, heads=heads,
                                       scale=scale)
        return build_sparse_nowhere(q, k, v, frames=frames, heads=heads,
                                    scale=scale)

    @jax.jit
    def chunk(x, w, ts):
        def body(x, t):
            o = attn(x, w)
            return (x + 0.1 * o * (t.astype(x.dtype) * 1e-3 + 1.0)), None

        x, _ = jax.lax.scan(body, x, ts)
        return x

    return chunk


def child_main(args):
    """Runs ONE variant to completion in a FRESH interpreter (subprocess —
    os.fork() deadlocks under JAX's threads, measured) and exits 0/2."""
    try:
        rng = np.random.RandomState(0)
        bf = args.batch * args.frames
        x = jnp.asarray(
            rng.randn(bf, args.c, args.s).astype(np.float32), jnp.bfloat16
        )
        w = jnp.asarray(
            rng.randn(args.c, args.c).astype(np.float32) * 0.05, jnp.bfloat16
        )
        ts = jnp.arange(args.steps, dtype=jnp.int32)
        chunk = make_scan_program(
            args.child, args.frames, args.c, args.s, args.heads, args.steps
        )
        t0 = time.time()
        out = np.asarray(chunk(x, w, ts))
        log(f"  [{args.child}] child: compile+run {time.time()-t0:.1f}s, "
            f"out[0,0,0]={float(out[0, 0, 0]):.4f}")
        sys.exit(0)
    except Exception as e:  # noqa: BLE001
        log(f"  [{args.child}] child error: {type(e).__name__}: {e}")
        sys.exit(2)


def run_variant(variant, args):
    """Spawn a fresh interpreter for the variant under the wall guard.
    Returns ('ok', seconds) / ('hang', guard) / ('err', rc)."""
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), "--child", variant,
           "--steps", str(args.steps), "--frames", str(args.frames),
           "--batch", str(args.batch), "--c", str(args.c),
           "--s", str(args.s), "--heads", str(args.heads)]
    t0 = time.time()
    try:
        p = subprocess.run(cmd, timeout=args.guard)
        dt = time.time() - t0
        return ("ok", round(dt, 1)) if p.returncode == 0 else ("err", p.returncode)
    except subprocess.TimeoutExpired:
        return ("hang", args.guard)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--c", type=int, default=128)
    ap.add_argument("--s", type=int, default=256)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--guard", type=int, default=300)
    ap.add_argument("--variants", default="A,B,C")
    ap.add_argument("--child", help="internal: run ONE variant in-process")
    args = ap.parse_args()

    if args.child:
        child_main(args)
        return

    log(f"grid: bf={args.batch * args.frames} "
        f"c={args.c} s={args.s} steps={args.steps} guard={args.guard}s")
    results = {}
    for v in args.variants.split(","):
        log(f"variant {v}...")
        results[v] = run_variant(v, args)
        log(f"  [{v}] -> {results[v]}")
    import json

    print(json.dumps({
        "shape": {"batch": args.batch, "frames": args.frames, "c": args.c,
                  "s": args.s, "steps": args.steps},
        "results": {k: list(v) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
