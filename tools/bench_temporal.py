"""Correctness + A/B bench for the channel-major fused temporal attention.

Compares kernels/temporal_fused.py against the XLA path (the exact math of
nn.attention.TemporalAttention: half-split RoPE + rel-pos bias + fp32
softmax) at the real cascade shapes. Chains applications per jit and returns
a scalar (DESIGN.md benchmark hygiene for the axon tunnel).

Usage: python tools/bench_temporal.py [--check-only] [--shapes vsr_L1,...]
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

from lavie_tpu.kernels.attention import dot_product_attention
from lavie_tpu.kernels.temporal_fused import (
    channel_permutation,
    pick_layout,
    rope_tables_cmajor,
    temporal_attention_cmajor,
    temporal_fused_supported,
)
from lavie_tpu.nn.embeddings import apply_rope_half, rope_half_frequencies

# (name, B, F, S, heads, d, rope_dim)
SHAPES = [
    ("vsr_L1", 1, 8, 160 * 256, 8, 64, 32),
    ("vsr_L2", 1, 8, 80 * 128, 8, 64, 32),
    ("vsr_L3", 1, 8, 40 * 64, 8, 128, 32),
    ("base_L0", 2, 16, 40 * 64, 8, 40, 32),
    ("base_L1", 2, 16, 20 * 32, 8, 80, 32),
    # TSR runs PLAIN temporal attention (rope 0) over 61 frames — the XLA
    # path materializes fp32 f² scores (610 MB at L0)
    ("tsr_L0", 2, 61, 40 * 64, 8, 40, 0),
    ("tsr_L1", 2, 61, 20 * 32, 8, 80, 0),
]


def xla_ref(q, k, v, bias, cos, sin, scale):
    # q,k,v: (B·S, F, H, D) — the existing TemporalAttention math
    q = apply_rope_half(q, cos, sin)
    k = apply_rope_half(k, cos, sin)
    return dot_product_attention(q, k, v, bias=bias, scale=scale, implementation="xla")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--shapes", default=None)
    args = ap.parse_args()

    for name, b, f, s, h, d, rope in SHAPES:
        if args.shapes and name not in args.shapes.split(","):
            continue
        c = h * d
        rope = min(rope, d)
        scale = d**-0.5
        if not temporal_fused_supported(f, h, d, s):
            print(f"{name}: UNSUPPORTED shape")
            continue
        _, hg = pick_layout(c, f, s, h)
        perm = channel_permutation(h, d, hg)
        inv = np.argsort(perm)
        rng = np.random.RandomState(0)
        cos_np, sin_np = rope_half_frequencies(f, rope)
        cs_np = rope_tables_cmajor(f, h, d, rope, hg, cos_np, sin_np)
        bias_np = rng.randn(h, f, f).astype(np.float32) * 0.1
        cs_j = jnp.asarray(cs_np)
        bias_j = jnp.asarray(bias_np)

        def run_kernel(q_cm, k_cm, v_cm):  # standard-basis (C,B,F,S) in/out
            out = temporal_attention_cmajor(
                q_cm[perm], k_cm[perm], v_cm[perm], bias_j, cs_j,
                heads=h, scale=scale, rope_dim=rope,
            )
            return out[inv]

        # ---- correctness at a small S
        s_chk = 256
        qkv = [rng.randn(c, b, f, s_chk).astype(np.float32) for _ in range(3)]
        qc, kc, vc = [jnp.asarray(x, jnp.bfloat16) for x in qkv]
        out_k = jax.jit(run_kernel)(qc, kc, vc)

        def to_rows(x):
            return jnp.transpose(
                jnp.asarray(x, jnp.bfloat16), (1, 3, 2, 0)
            ).reshape(b * s_chk, f, h, d)

        cos_r = jnp.asarray(cos_np, jnp.bfloat16)[:, None, :]
        sin_r = jnp.asarray(sin_np, jnp.bfloat16)[:, None, :]
        out_r = xla_ref(to_rows(qkv[0]), to_rows(qkv[1]), to_rows(qkv[2]),
                        bias_j, cos_r, sin_r, scale)
        out_r = jnp.transpose(
            out_r.reshape(b, s_chk, f, h * d), (3, 0, 2, 1)
        )  # → (C, B, F, S)
        a, r_ = np.asarray(out_k, np.float32), np.asarray(out_r, np.float32)
        err = np.max(np.abs(a - r_)) / (np.max(np.abs(r_)) + 1e-8)
        print(f"{name}: blk/hg={pick_layout(c, f, s, h)} rel_err={err:.2e}", flush=True)
        assert err < 2e-2, f"{name} mismatch"
        if args.check_only:
            continue

        # ---- perf at the real shape
        qf = jnp.asarray(rng.randn(c, b, f, s).astype(np.float32), jnp.bfloat16)
        kf, vf = qf + 1, qf + 2

        @jax.jit
        def chain_kernel(q, k, v):
            # stays in the permuted basis: in real use the permutation is
            # folded into the projection weights (free)
            x = q
            for _ in range(args.reps):
                x = temporal_attention_cmajor(
                    x, k, v, bias_j, cs_j, heads=h, scale=scale, rope_dim=rope
                )
            return jnp.sum(x.astype(jnp.float32))

        qr = jnp.asarray(
            rng.randn(b * s, f, h, d).astype(np.float32), jnp.bfloat16
        )
        kr, vr = qr + 1, qr + 2
        cos_b = jnp.asarray(cos_np, jnp.bfloat16)[:, None, :]
        sin_b = jnp.asarray(sin_np, jnp.bfloat16)[:, None, :]

        @jax.jit
        def chain_xla(q, k, v):
            x = q
            for _ in range(args.reps):
                x = xla_ref(x, k, v, bias_j, cos_b, sin_b, scale)
            return jnp.sum(x.astype(jnp.float32))

        for tag, fn, fa in (("fused", chain_kernel, (qf, kf, vf)),
                            ("xla  ", chain_xla, (qr, kr, vr))):
            r = fn(*fa)
            r.block_until_ready()
            t0 = time.perf_counter()
            r = fn(*fa)
            r.block_until_ready()
            dt = (time.perf_counter() - t0) / args.reps * 1e3
            print(f"  {tag}: {dt:7.2f} ms/application", flush=True)


if __name__ == "__main__":
    main()
