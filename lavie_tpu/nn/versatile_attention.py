"""VSR TemporalModule attention variants — the reference's stretch modes.

The shipped VSR config disables these (`attention_block_types: ["", ""]`,
reference: vsr/configs/unet_3d_config.json:52-55) but the config schema
exposes them, so they are implemented for parity
(reference: vsr/models/temporal_module.py:181-567):

  - VersatileSelfAttention modes:
      "Temporal"             — attend over the frame axis per spatial location
      "Spatial"              — plain per-frame self-attention
      "CrossFrame"           — k/v token-concat of frames per mode string
                               ("0_i-1" | "i-1_i" | "0_i-1_i" | "i-1_i_i+1")
      "SpatialTemporalShift" — TSM-style channel shift on k/v
  - AdaLayerNorm: timestep-indexed scale/shift LayerNorm
  - TemporalTransformerBlock / TemporalTransformer3DModel wiring
  - bilinear_warp: the optical-flow grid_sample path of WarpModule
    (reference: temporal_module.py:588-663; the deformable-conv variant is a
    torchvision CUDA op with no TPU analog — flow warping covers the shipped
    `use_dcn_warpping: false` semantics)
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lavie_tpu.kernels import dot_product_attention

Dtype = Any

CROSS_FRAME_MODES = ("0_i-1", "i-1_i", "0_i-1_i", "i-1_i_i+1")


def _frame_select(x: jnp.ndarray, which: str) -> jnp.ndarray:
    """x: (B, F, S, C) → concat of selected frames' tokens on the token axis,
    built from broadcasts/shift-concats (gather-free; see attention.py)."""
    anchor = jnp.broadcast_to(x[:, 0:1], x.shape)
    former = jnp.concatenate([x[:, 0:1], x[:, :-1]], axis=1)
    later = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    current = x
    parts = {
        "0_i-1": (anchor, former),
        "i-1_i": (former, current),
        "0_i-1_i": (anchor, former, current),
        "i-1_i_i+1": (former, current, later),
    }[which]
    return jnp.concatenate(parts, axis=2)


class VersatileSelfAttention(nn.Module):
    query_dim: int
    heads: int = 8
    head_dim: int = 64
    attention_mode: Optional[str] = None
    cross_frame_attention_mode: Optional[str] = None
    temporal_shift_fold_div: int = 2
    temporal_shift_direction: str = "right"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        assert self.attention_mode in (
            "Temporal", "Spatial", "CrossFrame", "SpatialTemporalShift", None
        )
        assert self.cross_frame_attention_mode in CROSS_FRAME_MODES + (None,)
        inner = self.heads * self.head_dim
        dense = lambda feats, name, bias=True: nn.Dense(
            feats, use_bias=bias, dtype=self.dtype, param_dtype=self.param_dtype, name=name
        )
        self.to_q = dense(inner, "to_q", bias=False)
        self.to_k = dense(inner, "to_k", bias=False)
        self.to_v = dense(inner, "to_v", bias=False)
        self.to_out_0 = dense(self.query_dim, "to_out_0")

    def _temporal_shift(self, x: jnp.ndarray, video_length: int) -> jnp.ndarray:
        """TSM right-shift the first C/fold channels by one frame
        (reference: temporal_module.py:484-499)."""
        bf, s, c = x.shape
        b = bf // video_length
        fold = c // self.temporal_shift_fold_div
        assert self.temporal_shift_direction == "right"
        x4 = x.reshape(b, video_length, s, c)
        shifted = jnp.concatenate(
            [jnp.zeros_like(x4[:, :1, :, :fold]), x4[:, :-1, :, :fold]], axis=1
        )
        x4 = jnp.concatenate([shifted, x4[..., fold:]], axis=-1)
        return x4.reshape(bf, s, c)

    def __call__(self, hidden_states: jnp.ndarray, video_length: int) -> jnp.ndarray:
        mode = self.attention_mode
        bf, s, c = hidden_states.shape
        b = bf // video_length

        if mode == "Temporal":
            x = hidden_states.reshape(b, video_length, s, c)
            x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * s, video_length, c)
        else:
            x = hidden_states

        q = self.to_q(x)
        k = self.to_k(x)
        v = self.to_v(x)

        if mode == "SpatialTemporalShift":
            k = self._temporal_shift(k, video_length)
            v = self._temporal_shift(v, video_length)
        elif mode == "CrossFrame":
            kf = _frame_select(k.reshape(b, video_length, s, -1), self.cross_frame_attention_mode)
            vf = _frame_select(v.reshape(b, video_length, s, -1), self.cross_frame_attention_mode)
            k = kf.reshape(bf, -1, k.shape[-1])
            v = vf.reshape(bf, -1, v.shape[-1])

        bq, sq = q.shape[0], q.shape[1]
        sk = k.shape[1]
        out = dot_product_attention(
            q.reshape(bq, sq, self.heads, self.head_dim),
            k.reshape(bq, sk, self.heads, self.head_dim),
            v.reshape(bq, sk, self.heads, self.head_dim),
        ).reshape(bq, sq, self.heads * self.head_dim)
        out = self.to_out_0(out)

        if mode == "Temporal":
            out = out.reshape(b, s, video_length, c)
            out = jnp.transpose(out, (0, 2, 1, 3)).reshape(bf, s, c)
        return out


class AdaLayerNorm(nn.Module):
    """Timestep-indexed scale/shift LayerNorm (diffusers AdaLayerNorm;
    reference: vsr/models/temporal_module.py:666-683 uses num_embeds=1000)."""

    dim: int
    num_embeddings: int = 1000
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, timestep: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Embed(
            self.num_embeddings, 2 * self.dim, param_dtype=self.param_dtype, name="emb"
        )(timestep)
        emb = nn.silu(emb.astype(self.dtype))
        scale, shift = jnp.split(emb, 2, axis=-1)
        mean = jnp.mean(x, axis=-1, dtype=jnp.float32, keepdims=True)
        var = jnp.maximum(
            jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, dtype=jnp.float32,
                     keepdims=True) - jnp.square(mean), 0.0,
        )
        xn = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(var + 1e-5).astype(x.dtype)
        # broadcast (B, C) conditioning over tokens
        while scale.ndim < xn.ndim:
            scale = scale[:, None]
            shift = shift[:, None]
        return xn * (1 + scale.astype(x.dtype)) + shift.astype(x.dtype)


class TemporalTransformerBlock(nn.Module):
    """Two versatile attentions + FF, each with AdaLayerNorm timestep
    conditioning (reference: temporal_module.py:306-427)."""

    dim: int
    heads: int
    head_dim: int
    attention_block_types: Tuple[str, str]
    cross_frame_attention_mode: Optional[str] = None
    temporal_shift_fold_div: int = 2
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, timestep: jnp.ndarray, video_length: int) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        for i, mode in enumerate(self.attention_block_types):
            if not mode:
                continue
            normed = AdaLayerNorm(self.dim, name=f"norms_{i}", **common)(x, timestep)
            x = VersatileSelfAttention(
                query_dim=self.dim,
                heads=self.heads,
                head_dim=self.head_dim,
                attention_mode=mode,
                cross_frame_attention_mode=self.cross_frame_attention_mode,
                temporal_shift_fold_div=self.temporal_shift_fold_div,
                name=f"attention_blocks_{i}",
                **common,
            )(normed, video_length) + x
        normed = AdaLayerNorm(self.dim, name="ff_norm", **common)(x, timestep)
        from lavie_tpu.nn.transformer import FeedForward

        x = FeedForward(dim=self.dim, name="ff", **common)(normed) + x
        return x


def bilinear_warp(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Warp (N, H, W, C) by per-pixel flow (N, H, W, 2) with bilinear sampling
    — the grid_sample path of the reference WarpModule
    (reference: temporal_module.py:640-663)."""
    n, h, w, c = x.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    sy = jnp.clip(ys + flow[..., 1], 0.0, h - 1.0)
    sx = jnp.clip(xs + flow[..., 0], 0.0, w - 1.0)
    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)

    def gather(yy, xx):
        flat = x.reshape(n, h * w, c)
        idx = yy * w + xx  # (N, H, W)
        return jnp.take_along_axis(flat, idx.reshape(n, h * w, 1), axis=1).reshape(n, h, w, c)

    top = gather(y0, x0) * (1 - wx) + gather(y0, x1) * wx
    bot = gather(y1, x0) * (1 - wx) + gather(y1, x1) * wx
    return top * (1 - wy) + bot * wy
