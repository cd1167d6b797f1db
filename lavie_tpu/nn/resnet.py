"""Residual blocks and spatial up/downsampling for the video UNet
(reference: base/models/resnet.py:24-207)."""

from __future__ import annotations

import os

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from lavie_tpu.nn.layers import GroupNorm, InflatedConv, TemporalConv

Dtype = Any


class ResnetBlock3D(nn.Module):
    """GN→SiLU→conv→(+temb)→GN→SiLU→conv with shortcut
    (reference: base/models/resnet.py:113-207). Convs are per-frame 2D."""

    in_channels: int
    out_channels: Optional[int] = None
    temb_channels: Optional[int] = 1280
    groups: int = 32
    # norm2 group count when it differs from norm1's (reference
    # ResnetBlock3D(groups_out=...) — the VSR v_cond_conv uses groups=3 on
    # its 3-channel RGB input but groups_out=32, vsr/models/resnet.py:151-170)
    groups_out: Optional[int] = None
    eps: float = 1e-6
    output_scale_factor: float = 1.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray]) -> jnp.ndarray:
        out_ch = self.out_channels or self.in_channels
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        h = GroupNorm(num_groups=self.groups, epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = InflatedConv(out_ch, (3, 3), name="conv1", **common)(h)

        if temb is not None and self.temb_channels is not None:
            t = nn.Dense(out_ch, name="time_emb_proj", **common)(nn.silu(temb))
            # (B, C) → broadcast over (B, F, H, W, C)
            h = h + t[:, None, None, None, :]

        h = GroupNorm(
            num_groups=self.groups_out or self.groups, epsilon=self.eps,
            dtype=self.dtype, name="norm2",
        )(h)
        h = nn.silu(h)
        h = InflatedConv(out_ch, (3, 3), name="conv2", **common)(h)

        if self.in_channels != out_ch:
            x = InflatedConv(out_ch, (1, 1), name="conv_shortcut", **common)(x)

        return (x + h) / self.output_scale_factor


class Upsample3D(nn.Module):
    """Nearest-neighbor ×2 spatial upsample + conv; frames untouched
    (reference: base/models/resnet.py:24-76, scale_factor=[1,2,2])."""

    channels: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, f, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        return InflatedConv(
            self.channels, (3, 3), name="conv", dtype=self.dtype, param_dtype=self.param_dtype
        )(x)


class Downsample3D(nn.Module):
    """Stride-2 spatial conv downsample (reference: base/models/resnet.py:79-110)."""

    channels: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return InflatedConv(
            self.channels,
            (3, 3),
            strides=(2, 2),
            padding=((1, 1), (1, 1)),
            name="conv",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


class ResnetBlock3DCNN(nn.Module):
    """True temporal 3D-conv residual block — the VSR TemporalModule path and
    the repo's only genuine 3D convolutions
    (reference: vsr/models/resnet.py:220-316): GN→SiLU→Conv3d(k,1,1)→(+temb)→
    GN→SiLU→Conv3d(3,1,1) with 1×1×1 shortcut."""

    in_channels: int
    out_channels: Optional[int] = None
    kernel_frames: int = 5
    temb_channels: Optional[int] = None
    groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _fused_kernel_ok(self, x: jnp.ndarray) -> bool:
        """Gate for the fused GN+SiLU+conv Pallas path
        (kernels/temporal_resblock.py). Disable with LAVIE_TRESBLOCK=0;
        LAVIE_TRESBLOCK=force runs interpret mode off-TPU (tests)."""

        mode = os.environ.get("LAVIE_TRESBLOCK", "1")
        if mode not in ("1", "force") or self.is_initializing():
            return False
        out_ch = self.out_channels or self.in_channels
        if out_ch != self.in_channels:  # shortcut conv not fused
            return False
        from lavie_tpu.kernels.attention import _on_tpu
        from lavie_tpu.kernels.temporal_resblock import resblock_conv_supported

        if not (_on_tpu() or mode == "force"):
            return False
        frames = x.shape[1]
        s = 1
        for d in x.shape[2:-1]:
            s *= d
        c = x.shape[-1]
        item = jnp.dtype(x.dtype).itemsize
        return resblock_conv_supported(
            frames, s, c, out_ch, self.kernel_frames, itemsize=item
        ) and resblock_conv_supported(
            frames, s, out_ch, out_ch, 3, with_res=True, itemsize=item
        )

    def _fused(self, x: jnp.ndarray, temb: Optional[jnp.ndarray]) -> jnp.ndarray:
        """Both conv passes as fused Pallas kernels; GN stats outside (XLA
        per-channel reductions), temb folded into conv1's bias, block
        residual folded into conv2's accumulator."""

        from lavie_tpu.kernels.attention import _on_tpu
        from lavie_tpu.kernels.temporal_resblock import (
            gn_silu_tconv,
            gn_silu_tconv_sfc,
        )
        from lavie_tpu.nn.layers import (
            groupnorm_affine,
            groupnorm_affine_from_moments,
        )

        interpret = not _on_tpu() and os.environ.get("LAVIE_TRESBLOCK") == "force"
        out_ch = self.out_channels or self.in_channels
        # int8 variant of the sfc kernel: MEASURED NEGATIVE, kept off even
        # in turbo mode. Mosaic's int8×int8→int32 dot_general runs at ~the
        # bf16 MXU rate on v5e (tools/bench_int8_pallas.py: 90-200 TF/s
        # int8 ≈ bf16 at every working shape) — the 2×-rate int8 MXU path
        # is only reachable through XLA's conv lowering (nn/quant.py), so
        # in-kernel quantization adds error + VPU overhead for zero MXU
        # gain. LAVIE_TRESBLOCK_INT8=1 re-enables for re-measurement on
        # newer toolchains; math pinned by tests/test_temporal_resblock.py.
        from lavie_tpu.nn.quant import MIN_CHANNELS, conv_quant_mode

        quant = (
            "int8"
            if (
                os.environ.get("LAVIE_TRESBLOCK_INT8") == "1"
                and conv_quant_mode() == "int8"
                and x.ndim == 5
                and self.in_channels >= MIN_CHANNELS
                and out_ch >= MIN_CHANNELS
            )
            else "none"
        )
        p = self.variables["params"]
        shape = x.shape
        b, frames = shape[0], shape[1]
        if x.ndim == 5:
            # token-major (B, S, F, C) view: row-major over these axes is
            # bit-identical to XLA's conv layout for (B, F, H, W, C)
            # activations (memory order (H, W, F, C)), so the transposes at
            # BOTH kernel boundaries become bitcasts when the producer and
            # consumer are convolutions (the TemporalModule3D placement) —
            # vs ~2-4 ms transpose copies per boundary at the VSR L0 level
            # for the frame-major reshape.
            v = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(
                b, shape[2] * shape[3], frames, shape[-1]
            )
            conv_fn = gn_silu_tconv_sfc
        else:
            v = x.reshape(b, frames, -1, shape[-1])
            conv_fn = gn_silu_tconv

        n1 = p["norm1"]["norm"]
        w1, u1 = groupnorm_affine(v, n1["scale"], n1["bias"], self.groups, self.eps)
        c1 = p["conv1"]["conv"]
        bias1 = c1["bias"][None].astype(jnp.float32)
        if temb is not None and self.temb_channels is not None:
            tp = p["time_emb_proj"]
            sd = self.dtype
            t = (
                nn.silu(temb).astype(sd) @ tp["kernel"].astype(sd)
                + tp["bias"].astype(sd)
            )
            bias1 = bias1 + t.astype(jnp.float32)
        else:
            bias1 = jnp.broadcast_to(bias1, (b, out_ch))
        # conv1 can emit its output's per-channel (Σ, Σ²) so norm2's moments
        # need no separate read of h. OPT-IN (LAVIE_TRESBLOCK_STATS=1) until
        # device-measured: the accumulation serializes the token-block grid
        # dim's output writes, and the axon TPU was unreachable when this
        # landed, so the in-model cost is unverified (interpret tests pin
        # the math).
        n2 = p["norm2"]["norm"]
        if os.environ.get("LAVIE_TRESBLOCK_STATS") == "1":
            h, hs1, hs2 = conv_fn(
                v, w1, u1, c1["kernel"][:, 0], bias1, emit_stats=True,
                interpret=interpret, quant=quant,
            )
            n_tok = v.shape[1] * v.shape[2]
            w2, u2 = groupnorm_affine_from_moments(
                hs1 / n_tok, hs2 / n_tok, n2["scale"], n2["bias"],
                self.groups, self.eps,
            )
        else:
            h = conv_fn(
                v, w1, u1, c1["kernel"][:, 0], bias1, interpret=interpret,
                quant=quant,
            )
            w2, u2 = groupnorm_affine(
                h, n2["scale"], n2["bias"], self.groups, self.eps
            )
        c2 = p["conv2"]["conv"]
        bias2 = jnp.broadcast_to(c2["bias"][None].astype(jnp.float32), (b, out_ch))
        y = conv_fn(
            h, w2, u2, c2["kernel"][:, 0], bias2, residual=v,
            interpret=interpret, quant=quant,
        )
        if x.ndim == 5:
            return jnp.transpose(
                y.reshape(b, shape[2], shape[3], frames, out_ch),
                (0, 3, 1, 2, 4),
            )
        return y.reshape(shape[:-1] + (out_ch,))

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        out_ch = self.out_channels or self.in_channels
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self._fused_kernel_ok(x):
            return self._fused(x, temb)
        # XLA-fallback layout gate (moved from TemporalModule3D): the
        # flattened (B, F, H·W, C) form routes TemporalConv to the
        # layout-robust GEMM-shift — XLA gives the 5D conv form a degenerate
        # T(2,128) layout when a neighbor is a Pallas custom call (measured
        # 22 TF/s at the VSR L1 level vs ~175 for the GEMM form) — but the
        # GEMM form materializes a k×-wide intermediate, so gate it to
        # levels where that fits (≤ ~2 GB; VSR L0 would need 6.7 GB —
        # measured HBM OOM). Params are shape-independent either way.
        orig_spatial = None
        if x.ndim == 5:
            gemm_bytes = x.size * self.kernel_frames * jnp.dtype(x.dtype).itemsize
            if gemm_bytes <= 2 * 1024**3:
                orig_spatial = x.shape[2:4]
                x = x.reshape(x.shape[0], x.shape[1], -1, x.shape[-1])
        h = GroupNorm(num_groups=self.groups, epsilon=self.eps, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = TemporalConv(out_ch, self.kernel_frames, name="conv1", **common)(h)
        if temb is not None and self.temb_channels is not None:
            t = nn.Dense(out_ch, name="time_emb_proj", **common)(nn.silu(temb))
            # broadcast over the frame+spatial axes of either the 5D
            # (B,F,H,W,C) or flattened 4D (B,F,S,C) activation form
            h = h + t.reshape(t.shape[0], *([1] * (h.ndim - 2)), out_ch)
        h = GroupNorm(num_groups=self.groups, epsilon=self.eps, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = TemporalConv(out_ch, 3, name="conv2", **common)(h)
        if self.in_channels != out_ch:
            x = TemporalConv(out_ch, 1, name="conv_shortcut", **common)(x)
        y = x + h
        if orig_spatial is not None:
            y = y.reshape(y.shape[:2] + orig_spatial + (out_ch,))
        return y
