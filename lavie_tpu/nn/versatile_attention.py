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
  - WarpModule, both paths (reference: temporal_module.py:570-663):
    bilinear_warp (optical-flow grid_sample) and the modulated
    deformable-conv path — torchvision's CUDA `deform_conv2d` rebuilt as
    9 bilinear gathers + per-tap matmuls (`deform_conv2d` below). The
    shipped config never runs either (`use_dcn_warpping: false`).
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
        # zero-init out projection: the whole attention is a no-op at init
        # (reference: temporal_module.py:351-352, :369-370 nn.init.zeros_)
        self.to_out_0 = nn.Dense(
            self.query_dim, use_bias=True, dtype=self.dtype,
            param_dtype=self.param_dtype, kernel_init=nn.initializers.zeros,
            name="to_out_0",
        )

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
        # Embed(num, D) → SiLU → Linear(D, 2D) → chunk(scale, shift) —
        # the reference has a projection AFTER the activation
        # (temporal_module.py:672-681: self.linear(self.silu(self.emb(t))))
        emb = nn.Embed(
            self.num_embeddings, self.dim, param_dtype=self.param_dtype, name="emb"
        )(timestep)
        emb = nn.Dense(
            2 * self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="linear",
        )(nn.silu(emb.astype(self.dtype)))
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
    """Two versatile attentions (spatial, temporal) + FF. The attention
    norms are timestep-conditioned AdaLayerNorms (the VSR config sets
    num_embeds_ada_norm=1000, temporal_module.py:129); the FF norm is a
    PLAIN LayerNorm — the reference's norm3 is unconditional regardless
    (temporal_module.py:380, :427). Child names follow the reference param
    keys: norm1/attn_spatial, norm2/attn_temporal, norm3/ff, dcn_module."""

    dim: int
    heads: int
    head_dim: int
    attention_block_types: Tuple[str, str]
    cross_frame_attention_mode: Optional[str] = None
    temporal_shift_fold_div: int = 2
    # DCN/flow warp: the SECOND (temporal) attention's output becomes the
    # offset source for WarpModule instead of a residual add
    # (reference: temporal_module.py:416-421)
    use_dcn_warpping: bool = False
    use_deformable_conv: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, timestep: jnp.ndarray, video_length: int) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        ref_names = (("norm1", "attn_spatial"), ("norm2", "attn_temporal"))
        for i, mode in enumerate(self.attention_block_types):
            if not mode:
                continue
            norm_name, attn_name = ref_names[i]
            normed = AdaLayerNorm(self.dim, name=norm_name, **common)(x, timestep)
            attn_out = VersatileSelfAttention(
                query_dim=self.dim,
                heads=self.heads,
                head_dim=self.head_dim,
                attention_mode=mode,
                cross_frame_attention_mode=self.cross_frame_attention_mode,
                temporal_shift_fold_div=self.temporal_shift_fold_div,
                name=attn_name,
                **common,
            )(normed, video_length)
            if i == len(self.attention_block_types) - 1 and self.use_dcn_warpping:
                x = WarpModule(
                    in_channels=self.dim,
                    use_deformable_conv=self.use_deformable_conv,
                    name="dcn_module",
                    **common,
                )(x, attn_out)
            else:
                x = attn_out + x
        from lavie_tpu.nn.transformer import FeedForward, LayerNorm

        normed = LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = FeedForward(dim=self.dim, name="ff", **common)(normed) + x
        return x


class TemporalTransformer3D(nn.Module):
    """The reference's TemporalTransformer3DModel wrapper around
    TemporalTransformerBlock: GroupNorm → proj_in → token fold → blocks →
    proj_out → + residual (reference: vsr/models/temporal_module.py:181-303).
    Child names mirror the torch keys (norm, proj_in, transformer_blocks_0,
    proj_out); projections are Dense — the VSR config sets
    use_linear_projection=true, and a 1×1 conv is the same GEMM anyway."""

    dim: int
    heads: int
    head_dim: int
    attention_block_types: Tuple[str, str]
    norm_num_groups: int = 32
    cross_frame_attention_mode: Optional[str] = None
    temporal_shift_fold_div: int = 2
    use_dcn_warpping: bool = False
    use_deformable_conv: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, timestep: jnp.ndarray, video_length: int
    ) -> jnp.ndarray:
        """x: (B·F, S, C) tokens — callers fold frames and spatial dims."""
        from lavie_tpu.nn.layers import GroupNorm

        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        residual = x
        h = GroupNorm(
            num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype,
            name="norm",
        )(x)
        h = nn.Dense(self.dim, name="proj_in", **common)(h)
        h = TemporalTransformerBlock(
            dim=self.dim,
            heads=self.heads,
            head_dim=self.head_dim,
            attention_block_types=self.attention_block_types,
            cross_frame_attention_mode=self.cross_frame_attention_mode,
            temporal_shift_fold_div=self.temporal_shift_fold_div,
            use_dcn_warpping=self.use_dcn_warpping,
            use_deformable_conv=self.use_deformable_conv,
            name="transformer_blocks_0",
            **common,
        )(h, timestep, video_length)
        h = nn.Dense(x.shape[-1], name="proj_out", **common)(h)
        return h + residual


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


def _bilinear_sample_zero(x: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of (N, H, W, C) at float coords (N, H, W), with ZERO
    contribution from out-of-bounds corners (torchvision deform_conv2d
    padding semantics)."""
    n, h, w, c = x.shape
    y0f, x0f = jnp.floor(sy), jnp.floor(sx)
    wy = (sy - y0f)[..., None]
    wx = (sx - x0f)[..., None]
    flat = x.reshape(n, h * w, c)

    def corner(yy, xx):
        valid = ((yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)).astype(x.dtype)
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        idx = (yc * w + xc).reshape(n, h * w, 1)
        g = jnp.take_along_axis(flat, idx, axis=1).reshape(n, h, w, c)
        return g * valid[..., None]

    top = corner(y0f, x0f) * (1 - wx) + corner(y0f, x0f + 1) * wx
    bot = corner(y0f + 1, x0f) * (1 - wx) + corner(y0f + 1, x0f + 1) * wx
    return top * (1 - wy) + bot * wy


def deform_conv2d(
    x: jnp.ndarray,       # (N, H, W, C) channels-last
    offset: jnp.ndarray,  # (N, H, W, 2·K) — (Δy, Δx) interleaved per tap,
                          # torchvision's layout
    weight: jnp.ndarray,  # (O, C, kh, kw) — torch layout, kept verbatim so
                          # checkpoint weights map without a transpose pass
    mask: jnp.ndarray,    # (N, H, W, K) modulation
) -> jnp.ndarray:
    """Modulated deformable 3×3 convolution (stride 1, pad 1) — the TPU
    rebuild of `torchvision.ops.deform_conv2d`
    (reference: temporal_module.py:605-612): per kernel tap, bilinear-gather
    the shifted feature map, modulate, and contract with that tap's (C, O)
    weight slice. K taps = K gathers + K matmuls; no scatter, no dynamic
    shapes — XLA-friendly."""
    n, h, w, c = x.shape
    kh, kw = weight.shape[2], weight.shape[3]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    out = None
    k = 0
    for ki in range(kh):
        for kj in range(kw):
            dy = offset[..., 2 * k].astype(jnp.float32)
            dx = offset[..., 2 * k + 1].astype(jnp.float32)
            sy = ys + (ki - (kh - 1) // 2) + dy
            sx = xs + (kj - (kw - 1) // 2) + dx
            samp = _bilinear_sample_zero(x, sy, sx)
            samp = samp * mask[..., k][..., None]
            wk = weight[:, :, ki, kj].T.astype(x.dtype)  # (C, O)
            term = samp @ wk
            out = term if out is None else out + term
            k += 1
    return out


class WarpModule(nn.Module):
    """Offset-driven warping of hidden states (reference:
    temporal_module.py:570-663). Two paths:

      use_deformable_conv=True — conv(concat) → 27 offset/mask channels →
        modulated deformable conv, blended by a zero-init per-channel alpha
        (`alpha·dcn(x) + x`);
      False — zero-init conv(concat... actually conv(x‖offsets)) → 2-ch flow
        → bilinear optical-flow warp with the reference's validity mask.

    Inputs are token rows (N, S, C) with S = H·W square (reference asserts
    the same)."""

    in_channels: int
    use_deformable_conv: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states: jnp.ndarray, offset_hidden_states: jnp.ndarray) -> jnp.ndarray:
        n, s, c = hidden_states.shape
        size = int(round(s ** 0.5))
        assert size * size == s, "WarpModule expects square token grids"
        x = hidden_states.reshape(n, size, size, c)
        off_in = offset_hidden_states.reshape(n, size, size, c)
        concat = jnp.concatenate([x, off_in], axis=-1)

        if self.use_deformable_conv:
            raw = nn.Conv(
                27, (3, 3), padding=((1, 1), (1, 1)), name="conv",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(concat)
            # reference chunks into (x, y, mask) thirds then re-concats x‖y —
            # i.e. channels [0:18] feed torchvision's interleaved (Δy, Δx)
            # slots verbatim (temporal_module.py:601-605)
            offsets = raw[..., :18]
            mask = jax.nn.sigmoid(raw[..., 18:]) * 2.0
            dcn_weight = self.param(
                "dcn_weight",
                nn.initializers.normal(1.0 / np.sqrt(self.in_channels * 9)),
                (self.in_channels, self.in_channels, 3, 3),
                self.param_dtype,
            )
            alpha = self.param(
                "alpha", nn.initializers.zeros, (1, self.in_channels, 1, 1),
                self.param_dtype,
            )
            warped = deform_conv2d(x, offsets, dcn_weight.astype(self.dtype), mask)
            alpha_hw = jnp.transpose(alpha, (0, 2, 3, 1)).astype(x.dtype)  # (1,1,1,C)
            out = alpha_hw * warped + x
        else:
            flow = nn.Conv(
                2, (3, 3), padding=((1, 1), (1, 1)), kernel_init=nn.initializers.zeros,
                name="conv", dtype=self.dtype, param_dtype=self.param_dtype,
            )(concat)
            out = flow_warp_with_mask(x, flow)
        return out.reshape(n, s, c)


def flow_warp_with_mask(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """The reference's optical_flow_warping incl. its validity-mask quirk:
    the mask is grid_sample(x, …) (not ones — temporal_module.py:655-659 as
    written), thresholded at 0.9999 → binarized, multiplied in."""
    warped = bilinear_warp(x.astype(jnp.float32), flow.astype(jnp.float32))
    mask = jnp.where(warped < 0.9999, 0.0, 1.0)
    return (warped * mask).astype(x.dtype)
