"""A/B bench: channel-major temporal-attention boundary kernels
(kernels/temporal_proj.py) vs the XLA composition they replace
(LN pass + transposed-operand projections at a measured 89 TF/s).

Chains applications per jit with varied inputs and host materialization
(DESIGN.md benchmark hygiene for the axon tunnel).

Usage: python tools/bench_temporal_proj.py [--check-only]
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

from lavie_tpu.kernels.temporal_proj import ln_qkv_cmajor, out_proj_residual

SHAPES = [
    ("vsr_L1", 1, 8, 160 * 256, 512),
    ("vsr_L2", 1, 8, 80 * 128, 512),
]


def _ln_ref(x, gamma, beta, eps=1e-5):
    f32 = jnp.float32
    mean = jnp.mean(x, axis=-1, dtype=f32, keepdims=True)
    mean_sq = jnp.mean(jnp.square(x.astype(f32)), axis=-1, dtype=f32, keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)
    xn = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
    return xn * gamma.astype(x.dtype) + beta.astype(x.dtype)


def xla_qkv(x, gamma, beta, wq, wk, wv):
    xn = _ln_ref(x, gamma, beta)
    proj = lambda w: jax.lax.dot_general(
        w.T.astype(x.dtype), xn, (((1,), (3,)), ((), ()))
    )
    return proj(wq), proj(wk), proj(wv)


def xla_out(o, r, wo, bo):
    y = jax.lax.dot_general(o.astype(r.dtype), wo.astype(r.dtype), (((0,), (0,)), ((), ())))
    return y + bo.astype(r.dtype) + r


def bench(fn, args, reps, n_chain=8):
    """fn maps (x-like leading arg, *rest) → pytree; chain with varied input."""

    @jax.jit
    def chained(a0, rest):
        acc = 0.0
        for it in range(n_chain):
            out = fn(a0 + it * 1e-3, *rest)
            leaves = jax.tree_util.tree_leaves(out)
            acc = acc + sum(jnp.sum(l[..., :1].astype(jnp.float32)) for l in leaves)
        return acc

    a0, *rest = args
    np.asarray(chained(a0, rest))  # compile+warm
    t0 = time.perf_counter()
    for r in range(reps):
        np.asarray(chained(a0 + r * 1e-3, rest))
    dt = (time.perf_counter() - t0) / (reps * n_chain) * 1e3
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    for name, b, f, s, c in SHAPES:
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 8)
        dt = jnp.bfloat16
        x = jax.random.normal(ks[0], (b, f, s, c), dt)
        gamma = jax.random.normal(ks[1], (c,)) * 0.1 + 1.0
        beta = jax.random.normal(ks[2], (c,)) * 0.1
        wq = jax.random.normal(ks[3], (c, c)) * c**-0.5
        wk = jax.random.normal(ks[4], (c, c)) * c**-0.5
        wv = jax.random.normal(ks[5], (c, c)) * c**-0.5
        wo = jax.random.normal(ks[6], (c, c)) * c**-0.5
        bo = jax.random.normal(ks[7], (c,)) * 0.1

        # correctness
        q_r, k_r, v_r = xla_qkv(x, gamma, beta, wq, wk, wv)
        q_k, k_k, v_k = ln_qkv_cmajor(x, gamma, beta, wq, wk, wv)
        for a, bb, lbl in ((q_r, q_k, "q"), (k_r, k_k, "k"), (v_r, v_k, "v")):
            diff = float(jnp.max(jnp.abs(a.astype(jnp.float32) - bb.astype(jnp.float32))))
            print(f"{name} {lbl} max|Δ| = {diff:.4f}")
            assert diff < 0.1, f"{name} {lbl} mismatch {diff}"

        o_cm = q_r  # any (E,B,F,S) tensor works as attention output stand-in
        r = x
        y_ref = xla_out(o_cm, r, wo, bo)
        y_k = out_proj_residual(o_cm, r, wo, bo)
        diff = float(jnp.max(jnp.abs(y_ref.astype(jnp.float32) - y_k.astype(jnp.float32))))
        print(f"{name} out max|Δ| = {diff:.4f}")
        assert diff < 0.1

        if args.check_only:
            continue

        t_xla = bench(lambda xx, *rest: xla_qkv(xx, *rest),
                      (x, gamma, beta, wq, wk, wv), args.reps)
        t_ker = bench(lambda xx, *rest: ln_qkv_cmajor(xx, *rest),
                      (x, gamma, beta, wq, wk, wv), args.reps)
        print(f"{name} ln+qkv: XLA {t_xla:.2f} ms  kernel {t_ker:.2f} ms")

        t_xla_o = bench(lambda oo, *rest: xla_out(oo, *rest),
                        (o_cm, r, wo, bo), args.reps)
        t_ker_o = bench(lambda oo, *rest: out_proj_residual(oo, *rest),
                        (o_cm, r, wo, bo), args.reps)
        print(f"{name} out+res: XLA {t_xla_o:.2f} ms  kernel {t_ker_o:.2f} ms")


if __name__ == "__main__":
    main()
