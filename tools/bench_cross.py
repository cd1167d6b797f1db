"""Correctness + A/B bench for the fused short-kv cross-attention kernel.

Compares kernels/cross_attention.py against the XLA einsum path at the real
VSR/base cross-attention shapes (77-token text kv). Chains applications per
jit with varied inputs and materializes to host (DESIGN.md benchmark hygiene
for the axon tunnel — identical dispatches dedupe, block_until_ready defers).

Usage: python tools/bench_cross.py [--check-only] [--reps N]
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
from lavie_tpu.kernels.cross_attention import cross_attention

# (name, B, Sq, H, D, Lkv) — B folds frames; VSR blocks run batch-1 half-CFG
# with 8 frames folded into batch (reference shapes: SURVEY §3.3).
SHAPES = [
    ("vsr_L1", 8, 160 * 256, 8, 64, 77),
    ("vsr_L2", 8, 80 * 128, 8, 64, 77),
    ("vsr_L3", 8, 40 * 64, 16, 64, 77),
    ("base_L0", 32, 40 * 64, 8, 40, 77),
    ("tsr_L0", 122, 40 * 64, 8, 40, 77),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    for name, b, s, h, d, lkv in SHAPES:
        key = jax.random.PRNGKey(0)
        kq, kk, kv_ = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(kk, (b, lkv, h, d), jnp.bfloat16)
        v = jax.random.normal(kv_, (b, lkv, h, d), jnp.bfloat16)
        scale = d ** -0.5

        ref = _xla_attention(q, k, v, None, scale)
        out = cross_attention(q, k, v, scale=scale)
        diff = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - out.astype(jnp.float32))))
        print(f"{name}: max|Δ| vs xla = {diff:.2e}")
        if args.check_only:
            continue

        def chained(fn):
            @jax.jit
            def run(q, k, v):
                acc = jnp.zeros((), jnp.float32)
                x = q
                for it in range(args.reps):
                    o = fn(x + it * 1e-3, k, v)
                    acc = acc + o[0, 0, 0, 0].astype(jnp.float32)
                    x = q + o * 1e-6  # serialize: next call depends on prev
                return acc
            return run

        for label, fn in [
            ("xla", lambda q, k, v: _xla_attention(q, k, v, None, scale)),
            ("cross", lambda q, k, v: cross_attention(q, k, v, scale=scale)),
        ]:
            run = chained(fn)
            np.asarray(run(q, k, v))  # warm
            t0 = time.perf_counter()
            np.asarray(run(q, k, v))
            dt = (time.perf_counter() - t0) / args.reps * 1e3
            print(f"  {label:6s}: {dt:7.2f} ms/call")


if __name__ == "__main__":
    main()
