"""A/B the channel-major flash kernel vs the row-major one (TSR shapes).

Chained, varied-input harness (DESIGN.md benchmark hygiene: the axon tunnel
dedupes identical dispatches and block_until_ready can defer — chain ≥N
applications inside one jit and return a scalar).

Usage: python tools/bench_flash_cmajor.py [--reps 8] [--shapes tsr_L0]
Env knobs: LAVIE_FC_BLKQ / LAVIE_FC_BLKK (cmajor), LAVIE_FLASH_BLKQ (rowmajor).
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

from lavie_tpu.kernels.flash_attention import _flash_bhsd, flash_cmajor

# (name, BF, heads, d, Sq, Sk)
SHAPES = [
    ("tsr_L0", 122, 8, 40, 2560, 5120),
    ("tsr_L1", 122, 8, 80, 640, 1280),
    ("base_L0_self", 32, 8, 40, 2560, 2560),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--shapes", default=None)
    args = ap.parse_args()

    for name, bf, h, d, sq, sk in SHAPES:
        if args.shapes and name not in args.shapes.split(","):
            continue
        c = h * d
        scale = d**-0.5
        rng = np.random.RandomState(0)

        # correctness at a small batch
        qs = jnp.asarray(rng.randn(2, c, 256).astype(np.float32), jnp.bfloat16)
        ks = jnp.asarray(rng.randn(2, c, 512).astype(np.float32), jnp.bfloat16)
        vs = ks + 1
        out_c = flash_cmajor(qs, ks, vs, heads=h, scale=scale)

        def rows(x):
            s = x.shape[2]
            return jnp.transpose(x, (0, 2, 1)).reshape(2, s, h, d)

        def to_bhsd(x):
            s = x.shape[1]
            return jnp.transpose(x, (0, 2, 1, 3)).reshape(2 * h, s, d)

        out_r = _flash_bhsd(to_bhsd(rows(qs)), to_bhsd(rows(ks)), to_bhsd(rows(vs)), scale)
        out_r = np.asarray(out_r, np.float32).reshape(2, h, 256, d)  # (B,H,S,D)
        a = np.asarray(out_c, np.float32).reshape(2, h, d, 256)
        a = np.transpose(a, (0, 1, 3, 2))  # (B,H,S,D)
        err = np.max(np.abs(a - out_r)) / (np.max(np.abs(out_r)) + 1e-8)
        print(f"{name}: rel_err vs rowmajor = {err:.2e}", flush=True)
        assert err < 3e-2, name

        # perf at the real shape — varied inputs per chained application
        q_cm = jnp.asarray(rng.randn(bf, c, sq).astype(np.float32), jnp.bfloat16)
        k_cm = jnp.asarray(rng.randn(bf, c, sk).astype(np.float32), jnp.bfloat16)
        v_cm = k_cm + 1

        @jax.jit
        def chain_cm(q, k, v):
            acc = jnp.float32(0)
            for i in range(args.reps):
                o = flash_cmajor(q + i * 1e-3, k, v, heads=h, scale=scale)
                acc = acc + jnp.sum(o[:, :1, :1].astype(jnp.float32))
            return acc

        q_r = jnp.asarray(rng.randn(bf * h, sq, d).astype(np.float32), jnp.bfloat16)
        k_r = jnp.asarray(rng.randn(bf * h, sk, d).astype(np.float32), jnp.bfloat16)
        v_r = k_r + 1

        @jax.jit
        def chain_row(q, k, v):
            acc = jnp.float32(0)
            for i in range(args.reps):
                o = _flash_bhsd(q + i * 1e-3, k, v, scale)
                acc = acc + jnp.sum(o[:, :1, :1].astype(jnp.float32))
            return acc

        for tag, fn, fa in (("cmajor", chain_cm, (q_cm, k_cm, v_cm)),
                            ("rowmaj", chain_row, (q_r, k_r, v_r))):
            out = fn(*fa)
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            out = fn(*fa)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / args.reps * 1e3
            flops = 2 * 2 * bf * h * sq * sk * d
            print(f"  {tag}: {dt:7.2f} ms/application  ({flops/dt*1e-9:.1f} TF/s)",
                  flush=True)


if __name__ == "__main__":
    main()
