"""Residual blocks and spatial up/downsampling for the video UNet
(reference: base/models/resnet.py:24-207)."""

from __future__ import annotations

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

        h = GroupNorm(num_groups=self.groups, epsilon=self.eps, dtype=self.dtype, name="norm2")(h)
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

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        out_ch = self.out_channels or self.in_channels
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
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
        return x + h
