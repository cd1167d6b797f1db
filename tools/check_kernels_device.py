"""On-device numeric parity check for the Pallas kernels vs the XLA path.

The CPU test suite runs the kernels in interpret mode, which exercises the
kernel math but NOT the Mosaic compiler layer (implicit tile padding/masking
of non-aligned kv rows and sub-128 head dims). A Mosaic regression would
therefore ship silently. This script runs each kernel on the REAL device at
the production cascade shapes and asserts numeric parity against the XLA
reference path. Run as part of verification whenever kernels change:

    python tools/check_kernels_device.py

Shapes covered:
  - cross_attention at the real 77-token kv shapes (base 2560-query and
    VSR 10240-query levels, head dims 40/64/80/160 — all non-lane-aligned);
  - flash_attention at its gated shapes + the sparse-causal TSR shape;
  - temporal_fused at the default-on hg>=2 shapes.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.lavie_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from lavie_tpu.kernels.attention import _xla_attention  # noqa: E402
from lavie_tpu.kernels.cross_attention import cross_attention  # noqa: E402
from lavie_tpu.kernels.flash_attention import (  # noqa: E402
    flash_attention,
    flash_supported_shape,
)

TOL = 2e-2  # bf16 inputs, fp32 accumulation both paths


def _rand(key, shape):
    return jax.random.normal(key, shape, dtype=jnp.float32).astype(jnp.bfloat16)


def _check(name, got, want, tol=TOL):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    diff = float(np.max(np.abs(got - want)))
    status = "ok" if diff < tol else "FAIL"
    print(f"  {name:55s} max|Δ|={diff:.3e}  {status}")
    return diff < tol


def check_cross() -> bool:
    """Fused short-kv cross attention vs XLA at the real text-kv shapes.
    kv=77 rows and d=40/64/80/160 are all tile-non-aligned — correctness
    rides on Mosaic's implicit padding/masking (ADVICE r1)."""
    ok = True
    shapes = [
        ("base L0 cross (2x2560q 77kv h8 d40)", (2, 2560, 8, 40), 77),
        ("base L1 cross (2x640q 77kv h8 d80)", (2, 640, 8, 80), 77),
        ("vsr L0 cross (2x10240q 77kv h8 d64)", (2, 10240, 8, 64), 77),
        ("vsr L2 cross (2x2560q 77kv h8 d160)", (2, 2560, 8, 160), 77),
    ]
    for name, (b, s, h, d), kv in shapes:
        keys = jax.random.split(jax.random.PRNGKey(abs(hash(name)) % 2**31), 3)
        q = _rand(keys[0], (b, s, h, d))
        k = _rand(keys[1], (b, kv, h, d))
        v = _rand(keys[2], (b, kv, h, d))
        scale = d ** -0.5
        got = jax.jit(lambda q, k, v: cross_attention(q, k, v, scale=scale))(q, k, v)
        want = jax.jit(lambda q, k, v: _xla_attention(q, k, v, None, scale))(q, k, v)
        ok &= _check(name, got, want)
    return ok


def check_flash() -> bool:
    ok = True
    shapes = [
        # (name, q shape, kv seq) — kv seq != q seq covers sparse-causal
        ("base L0 self (2x2560 h8 d40, padded)", (2, 2560, 8, 40), 2560),
        ("vsr L3 self (2x1280 h8 d128)", (2, 1280, 8, 128), 1280),
        # batch 4, not the production 61: the XLA *reference* path must
        # materialize the fp32 score tensor, which OOMs at batch 61
        # (25.6 GB — the reason this kernel exists); batch 4 keeps the same
        # per-program tile geometry while the reference fits
        ("tsr sparse-causal (kv=2S d40, b4)", (4, 2560, 8, 40), 5120),
    ]
    for name, (b, s, h, d), kvs in shapes:
        keys = jax.random.split(jax.random.PRNGKey(abs(hash(name)) % 2**31), 3)
        q = _rand(keys[0], (b, s, h, d))
        k = _rand(keys[1], (b, kvs, h, d))
        v = _rand(keys[2], (b, kvs, h, d))
        if not flash_supported_shape(q, k, allow_padding=True):
            print(f"  {name:55s} (shape not gated in — skipped)")
            continue
        scale = d ** -0.5
        got = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale=scale))(q, k, v)
        want = jax.jit(lambda q, k, v: _xla_attention(q, k, v, None, scale))(q, k, v)
        ok &= _check(name, got, want)
    return ok


def check_temporal_fused() -> bool:
    from lavie_tpu.kernels.temporal_fused import (
        rope_tables_cmajor,
        temporal_attention_cmajor,
        temporal_fused_supported,
    )
    from lavie_tpu.nn.embeddings import rope_half_frequencies

    ok = True
    shapes = [
        ("vsr L1 temporal (c512 h8 f8 s5120)", 512, 8, 8, 5120, 16),
        ("base L0 temporal (c320 h8 f16 s2560)", 320, 8, 16, 2560, 8),
    ]
    for name, c, h, f, s, rope_dim in shapes:
        d = c // h
        if not temporal_fused_supported(f, h, d, s):
            print(f"  {name:55s} (not gated in — skipped)")
            continue
        keys = jax.random.split(jax.random.PRNGKey(abs(hash(name)) % 2**31), 4)
        q = _rand(keys[0], (c, 1, f, s))
        k = _rand(keys[1], (c, 1, f, s))
        v = _rand(keys[2], (c, 1, f, s))
        bias = jax.random.normal(keys[3], (h, f, f), dtype=jnp.float32)
        cos, sin = rope_half_frequencies(f, rope_dim)
        from lavie_tpu.kernels.temporal_fused import pick_layout

        _, hg = pick_layout(c, f, s, h)
        cs = jnp.asarray(rope_tables_cmajor(f, h, d, rope_dim, hg, cos, sin))
        scale = d ** -0.5
        got = temporal_attention_cmajor(
            q, k, v, bias, cs, heads=h, scale=scale, rope_dim=rope_dim
        )
        # XLA reference in (B,F,H,D)-per-position form
        def xla_ref(q, k, v, bias):
            # (C,B,F,S) -> (B*S, F, H, D)
            def to_bshd(x):
                x = jnp.transpose(x, (1, 3, 2, 0))  # (B,S,F,C)
                b_, s_, f_, c_ = x.shape
                return x.reshape(b_ * s_, f_, h, d)

            qs, ks2, vs2 = to_bshd(q), to_bshd(k), to_bshd(v)
            cosj = jnp.asarray(cos)[None, :, None, :]
            sinj = jnp.asarray(sin)[None, :, None, :]

            def rope(x):
                r = rope_dim
                r2 = r // 2
                xr, xp = x[..., :r].astype(jnp.float32), x[..., r:]
                x1, x2 = xr[..., :r2], xr[..., r2:]
                rot = jnp.concatenate(
                    [x1 * cosj - x2 * sinj, x2 * cosj + x1 * sinj], axis=-1
                )
                return jnp.concatenate([rot.astype(x.dtype), xp], axis=-1)

            return _xla_attention(rope(qs), rope(ks2), vs2, bias, scale)

        want = jax.jit(xla_ref)(q, k, v, bias)
        # back to (C,B,F,S)
        bsz = 1
        want = want.reshape(bsz, s, f, c)
        want = jnp.transpose(want, (3, 0, 2, 1))
        ok &= _check(name, got, want)
    return ok


def check_temporal_v4() -> bool:
    """The whole-head (B,F,C,S) temporal kernel vs XLA per-position attention."""
    from lavie_tpu.kernels.temporal_attention import (
        temporal_attention,
        temporal_supported_shape,
    )

    ok = True
    shapes = [
        ("vsr L1 temporal v4 (c512 h8 f8 s5120)", 1, 8, 5120, 8, 64),
        ("vsr L2 temporal v4 (c1024 h8 f8 s1280)", 1, 8, 1280, 8, 128),
    ]
    for name, b, f, s, h, d in shapes:
        if not temporal_supported_shape(f, h, d, s):
            print(f"  {name:55s} (shape not gated in — skipped)")
            continue
        keys = jax.random.split(jax.random.PRNGKey(abs(hash(name)) % 2**31), 4)
        q = _rand(keys[0], (b, f, s, h, d))
        k = _rand(keys[1], (b, f, s, h, d))
        v = _rand(keys[2], (b, f, s, h, d))
        bias = jax.random.normal(keys[3], (h, f, f), dtype=jnp.float32)
        scale = d ** -0.5
        got = temporal_attention(q, k, v, bias, scale=scale)

        def xla_ref(q, k, v, bias):
            def fold(x):  # (B,F,S,H,D) → (B·S, F, H, D)
                return jnp.transpose(x, (0, 2, 1, 3, 4)).reshape(b * s, f, h, d)

            o = _xla_attention(fold(q), fold(k), fold(v), bias, scale)
            return jnp.transpose(o.reshape(b, s, f, h, d), (0, 2, 1, 3, 4))

        want = jax.jit(xla_ref)(q, k, v, bias)
        ok &= _check(name, got, want)
    return ok


def check_unet_fused_ab() -> bool:
    """Tiny gate-compatible VSR UNet forward with every fused Pallas path
    FORCED vs all-XLA, on the real device — the Mosaic-layer analog of
    tests/test_fused_integration.py (covers cross_block head/tail,
    temporal_resblock ± emit_stats, and their model wiring)."""
    import dataclasses

    from lavie_tpu.core.config import UNetConfig
    from lavie_tpu.nn.unet import UNet3D

    cfg = dataclasses.replace(
        UNetConfig.vsr(),
        block_out_channels=(128, 128, 128, 128),
        layers_per_block=1,
        num_attention_heads=2,
        cross_attention_dim=128,
        norm_num_groups=32,
        rope_dim=8,
    )
    model = UNet3D(config=cfg)
    b, f, h, w = 1, 4, 16, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (b, f, h, w, cfg.in_channels))
    t = jnp.array([7], jnp.int32)
    text = jax.random.normal(jax.random.PRNGKey(1), (b, 77, cfg.cross_attention_dim))
    labels = jnp.array([3], jnp.int32)

    gates = ("LAVIE_CROSS_BLOCK", "LAVIE_TRESBLOCK", "LAVIE_TRESBLOCK_STATS")
    saved = {g: os.environ.get(g) for g in gates}
    try:
        for g in gates:
            os.environ[g] = "0"
        params = model.init(jax.random.PRNGKey(2), x, t, text, class_labels=labels)
        want = model.apply(params, x, t, text, class_labels=labels)
        for g in gates:
            os.environ[g] = "force" if g != "LAVIE_TRESBLOCK_STATS" else "1"
        got = model.apply(params, x, t, text, class_labels=labels)
    finally:
        for g, val in saved.items():
            os.environ.pop(g, None) if val is None else os.environ.__setitem__(g, val)
    return _check("tiny VSR UNet forward, all kernels forced", got, want, tol=5e-3)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})")
    if dev.platform not in ("tpu",):
        print("NOT a TPU — this check only validates the Mosaic layer on real"
              " hardware; run it on the device.")
        sys.exit(2)
    ok = True
    print("cross_attention vs XLA:")
    ok &= check_cross()
    print("flash_attention vs XLA:")
    ok &= check_flash()
    print("temporal_fused vs XLA:")
    ok &= check_temporal_fused()
    print("temporal_attention v4 vs XLA:")
    ok &= check_temporal_v4()
    print("fused UNet forward vs XLA (cross_block + temporal_resblock):")
    ok &= check_unet_fused_ab()
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
