"""A/B bench: formulations of the transformer-resblock (3,1,1) temporal conv.

The r2 trace shows the IN-TRANSFORMER (3,1,1) convs running at ~27 TF/s
(19.2 ms at L1) while the structurally identical TemporalModule convs hit
>106 TF/s — XLA picks a degenerate T(2,128) layout when the conv sits
between token-shaped transformer ops. Candidates:

  conv5d   — current form: lax 3D conv over (B, F, H, W, C), kernel (3,1,1)
  conv2d   — same math as a 2D conv over (B, F, H·W, C), kernel (3,1)
  matmul   — shifted-GEMM: out = x₋·W₋ + x₀·W₀ + x₊·W₊ over (N, C) tokens

Chained ≥8 applications per jit, varied inputs, host materialization
(DESIGN.md bench hygiene).
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.lavie_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

B, F, H, W, C = 1, 8, 160, 256, 512
CHAIN = 8
REPS = 3


def conv5d(x, w):
    # x (B,F,H,W,C), w (3,1,1,C,C)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), ((1, 1), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def conv2d(x, w):
    # x (B,F,S,C), w (3,1,C,C)
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def shifted_matmul(x, w_m, w_0, w_p):
    # x (B,F,S,C): out[f] = x[f-1]·w_m + x[f]·w_0 + x[f+1]·w_p, zero-padded
    prev = jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)
    nxt = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
    return prev @ w_m + x @ w_0 + nxt @ w_p


def gemm_shift(x, wcat):
    # x (B,F,S,C), wcat (C, 3·C): one GEMM then shifted adds of the tap
    # products: out[f] = y0[f-1] + y1[f] + y2[f+1] (zero-padded)
    c = x.shape[-1]
    y = x @ wcat  # (B,F,S,3C)
    y0, y1, y2 = y[..., :c], y[..., c : 2 * c], y[..., 2 * c :]
    out = y1 + jnp.concatenate(
        [jnp.zeros_like(y0[:, :1]), y0[:, :-1]], axis=1
    )
    out = out + jnp.concatenate([y2[:, 1:], jnp.zeros_like(y2[:, :1])], axis=1)
    return out


def timed(fn, args, tag):
    @jax.jit
    def chained(*a):
        x = a[0]
        for i in range(CHAIN):
            x = fn(x + i * 1e-3, *a[1:])
        return jnp.sum(x.astype(jnp.float32))

    out = chained(*args)
    np.asarray(out)  # warm
    times = []
    for r in range(REPS):
        a0 = args[0] + r * 1e-3
        t0 = time.perf_counter()
        np.asarray(chained(a0, *args[1:]))
        times.append((time.perf_counter() - t0) / CHAIN)
    ms = min(times) * 1e3
    gf = 2 * B * F * H * W * C * C * 3 / 1e9
    print(f"{tag:12s} {ms:7.2f} ms/app  {gf/ms:7.1f} TF/s")
    return ms


def main():
    rng = np.random.RandomState(0)
    x5 = jnp.asarray(rng.randn(B, F, H, W, C).astype(np.float32), jnp.bfloat16)
    x4 = x5.reshape(B, F, H * W, C)
    w5 = jnp.asarray(rng.randn(3, 1, 1, C, C).astype(np.float32) * 0.02, jnp.bfloat16)
    w4 = w5.reshape(3, 1, C, C)
    wm, w0, wp = w5[0, 0, 0], w5[1, 0, 0], w5[2, 0, 0]

    print(f"shape ({B},{F},{H},{W},{C}), chained {CHAIN}, reps {REPS}")
    wcat = jnp.concatenate([wm, w0, wp], axis=1)  # (C, 3C)
    timed(conv5d, (x5, w5), "conv5d")
    timed(conv2d, (x4, w4), "conv2d")
    timed(shifted_matmul, (x4, wm, w0, wp), "matmul")
    timed(gemm_shift, (x4, wcat), "gemm_shift")

    # parity
    a = conv5d(x5, w5).reshape(B, F, H * W, C)
    b = conv2d(x4, w4)
    c = shifted_matmul(x4, wm, w0, wp)
    print("max|conv5d-conv2d| =", float(jnp.max(jnp.abs(a - b))))
    print("max|conv5d-matmul| =", float(jnp.max(jnp.abs((a - c).astype(jnp.float32)))))


if __name__ == "__main__":
    main()
