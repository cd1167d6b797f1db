"""AutoencoderKL — the SD f8 VAE (base/interpolation) and f4 x4-upscaler VAE
(VSR), in channels-last JAX.

The reference vendors diffusers' AutoencoderKL
(reference: vsr/models/autoencoder_kl.py:46, and base loads
diffusers.models.AutoencoderKL, reference: base/pipelines/sample.py:30).
Video usage is per-frame: the pipeline folds frames into batch, so everything
here is (N, H, W, C) 2D. Tiled/sliced decode becomes frame-axis sharding plus
XLA's own memory scheduling on TPU; spatial tiling for the 1280×2048 VSR
decode lives in the pipeline layer.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lavie_tpu.core.config import VAEConfig
from lavie_tpu.nn.quant import conv_quant_scope
from lavie_tpu.nn.layers import GroupNorm, QuantConv2D

Dtype = Any


class VAEResnetBlock(nn.Module):
    """GN→SiLU→conv ×2 with 1×1 shortcut; no time embedding."""

    in_channels: int
    out_channels: int
    norm_num_groups: int = 32
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = QuantConv2D(self.out_channels, (3, 3), padding="SAME", name="conv1", **common)(h)
        h = GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = QuantConv2D(self.out_channels, (3, 3), padding="SAME", name="conv2", **common)(h)
        if self.in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut", **common)(x)
        return x + h


class VAEAttentionBlock(nn.Module):
    """Single-head spatial self-attention at the VAE bottleneck
    (diffusers AttentionBlock param names: query/key/value/proj_attn)."""

    channels: int
    norm_num_groups: int = 32
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        residual = x
        x = GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="group_norm")(x)
        x = x.reshape(n, h * w, c)
        q = nn.Dense(c, name="query", **common)(x)
        k = nn.Dense(c, name="key", **common)(x)
        v = nn.Dense(c, name="value", **common)(x)

        # At the VSR decode resolution the single-head score matrix is
        # S² = 163840² — hundreds of TB. Route big sequences through the flash
        # kernel (the reference leans on xformers/torch-2.0 attention here,
        # reference: pipeline...3d.py:745-755); short sequences stay fused XLA.
        from lavie_tpu.kernels.attention import _on_tpu, dot_product_attention
        from lavie_tpu.kernels.flash_attention import flash_supported_shape

        q4 = q[:, :, None, :]
        k4 = k[:, :, None, :]
        v4 = v[:, :, None, :]
        if _on_tpu() and h * w >= 4096 and flash_supported_shape(q4, k4, allow_padding=True):
            out = dot_product_attention(q4, k4, v4, implementation="flash")[:, :, 0]
        else:
            scores = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
            scores = scores * (c**-0.5)
            probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            out = jnp.einsum("bqk,bkc->bqc", probs, v)
        out = nn.Dense(c, name="proj_attn", **common)(out)
        return out.reshape(n, h, w, c) + residual


class Encoder(nn.Module):
    config: VAEConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        boc = cfg.block_out_channels
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        x = nn.Conv(boc[0], (3, 3), padding="SAME", name="conv_in", **common)(x)
        ch = boc[0]
        for i, out_ch in enumerate(boc):
            for j in range(cfg.layers_per_block):
                x = VAEResnetBlock(
                    in_channels=ch,
                    out_channels=out_ch,
                    norm_num_groups=cfg.norm_num_groups,
                    name=f"down_blocks_{i}_resnets_{j}",
                    **common,
                )(x)
                ch = out_ch
            if i < len(boc) - 1:
                # diffusers downsample: asymmetric (0,1) pad + VALID stride-2
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = QuantConv2D(
                    out_ch, (3, 3), strides=(2, 2), padding="VALID",
                    name=f"down_blocks_{i}_downsample", **common,
                )(x)

        x = VAEResnetBlock(ch, ch, cfg.norm_num_groups, name="mid_resnet_0", **common)(x)
        if cfg.mid_block_attention:
            x = VAEAttentionBlock(ch, cfg.norm_num_groups, name="mid_attn", **common)(x)
        x = VAEResnetBlock(ch, ch, cfg.norm_num_groups, name="mid_resnet_1", **common)(x)

        x = GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding="SAME", name="conv_out", **common)(x)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray, phase: str = "all") -> jnp.ndarray:
        """phase: "all" (default) runs conv_in→mid→up; "mid" stops after the
        mid block (the latent-resolution part — cheap in memory, so callers
        can batch MANY frames through it for full-sublane conv layouts);
        "up" resumes from a mid-phase output (the ×-upsampling part whose
        activations dominate HBM, so callers chunk it per frame). The split
        is a pure re-association of the same layer sequence — outputs are
        identical to phase="all"."""
        cfg = self.config
        boc = cfg.block_out_channels
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        ch = boc[-1]
        if phase in ("all", "mid"):
            x = nn.Conv(ch, (3, 3), padding="SAME", name="conv_in", **common)(z)

            x = VAEResnetBlock(ch, ch, cfg.norm_num_groups, name="mid_resnet_0", **common)(x)
            if cfg.mid_block_attention:
                x = VAEAttentionBlock(ch, cfg.norm_num_groups, name="mid_attn", **common)(x)
            x = VAEResnetBlock(ch, ch, cfg.norm_num_groups, name="mid_resnet_1", **common)(x)
            if phase == "mid":
                return x
        else:
            if phase != "up":
                raise ValueError(f"unknown decoder phase {phase!r}")
            x = z

        for i, out_ch in enumerate(reversed(boc)):
            for j in range(cfg.layers_per_block + 1):
                x = VAEResnetBlock(
                    in_channels=ch,
                    out_channels=out_ch,
                    norm_num_groups=cfg.norm_num_groups,
                    name=f"up_blocks_{i}_resnets_{j}",
                    **common,
                )(x)
                ch = out_ch
            if i < len(boc) - 1:
                n, h, w, c = x.shape
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = QuantConv2D(
                    out_ch, (3, 3), padding="SAME", name=f"up_blocks_{i}_upsample", **common
                )(x)

        x = GroupNorm(num_groups=cfg.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(cfg.out_channels, (3, 3), padding="SAME", name="conv_out", **common)(x)


class AutoencoderKL(nn.Module):
    """encode → (mean, logvar); decode latent → RGB. Per-frame 2D (N,H,W,C)."""

    config: VAEConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        self.encoder = Encoder(config=self.config, name="encoder", **common)
        self.decoder = Decoder(config=self.config, name="decoder", **common)
        lc = self.config.latent_channels
        self.quant_conv = nn.Conv(2 * lc, (1, 1), name="quant_conv", **common)
        self.post_quant_conv = nn.Conv(lc, (1, 1), name="post_quant_conv", **common)

    def encode(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        with conv_quant_scope(self.config.conv_quant, self.config.conv_quant_exclude):
            moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        with conv_quant_scope(self.config.conv_quant, self.config.conv_quant_exclude):
            return self.decoder(self.post_quant_conv(z))

    def decode_mid(self, z: jnp.ndarray) -> jnp.ndarray:
        """Latent-resolution half of decode (post_quant_conv → conv_in →
        mid block). Cheap in FLOPs relative to decode_up — run it with all
        frames batched so the mid convs see full batch sublanes instead of
        the degenerate batch-1 layout XLA picks next to the flash-attention
        custom call (DESIGN.md: 26 TF/s, 58 ms/frame at the VSR 320×512
        latent). NOT free in memory: the output holds block_out_channels[-1]
        (512 for the VSR f4 VAE) channels at latent resolution for EVERY
        batched frame, live across the caller's whole chunked decode_up loop
        (~1.3 GB bf16 for an 8-frame 320×512 window), and the batched mid
        attention runs flash at (B·F)×(h·w) sequence — callers with much
        larger window_batch or frame counts should chunk decode_mid itself."""
        with conv_quant_scope(self.config.conv_quant, self.config.conv_quant_exclude):
            return self.decoder(self.post_quant_conv(z), phase="mid")

    def decode_up(self, h: jnp.ndarray) -> jnp.ndarray:
        """Upsampling half of decode; memory-dominant, chunk per frame.
        decode_up(decode_mid(z)) ≡ decode(z) exactly."""
        with conv_quant_scope(self.config.conv_quant, self.config.conv_quant_exclude):
            return self.decoder(h, phase="up")

    def __call__(self, x: jnp.ndarray, rng: Optional[jax.Array] = None):
        mean, logvar = self.encode(x)
        z = mean
        if rng is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape)
        return self.decode(z), mean, logvar

    def sample_posterior(self, mean, logvar, rng):
        return mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, dtype=mean.dtype)

    def tiled_encode(self, x: jnp.ndarray, tile: int = 256, overlap: int = 64):
        """Encode in overlapping RGB tiles with linear seam blending — mirror
        of tiled_decode (reference: vsr/models/autoencoder_kl.py:214-258
        tiled_encode with blend_h/blend_v). tile/overlap in image pixels;
        returns (mean, logvar) at latent resolution."""
        n, h, w, c = x.shape
        if h <= tile and w <= tile:
            return self.encode(x)
        f = self.config.downscale_factor
        stride = tile - overlap
        lh, lw = h // f, w // f

        tiles = []
        for i0 in range(0, max(h - overlap, 1), stride):
            i1 = min(i0 + tile, h)
            for j0 in range(0, max(w - overlap, 1), stride):
                j1 = min(j0 + tile, w)
                mean, logvar = self.encode(x[:, i0:i1, j0:j1])
                tiles.append((i0, i1, j0, j1, jnp.concatenate([mean, logvar], -1)))

        lc = self.config.latent_channels
        canvas = jnp.zeros((n, lh, lw, 2 * lc), tiles[0][4].dtype)
        weight = jnp.zeros((1, lh, lw, 1), jnp.float32)
        ov = overlap // f
        for (i0, i1, j0, j1, m) in tiles:
            th, tw = m.shape[1], m.shape[2]
            wy = jnp.ones((th,), jnp.float32)
            wx = jnp.ones((tw,), jnp.float32)
            ramp = (jnp.arange(ov) + 1) / (ov + 1)
            if i0 > 0:
                wy = wy.at[:ov].set(ramp)
            if i1 < h:
                wy = wy.at[-ov:].set(ramp[::-1])
            if j0 > 0:
                wx = wx.at[:ov].set(ramp)
            if j1 < w:
                wx = wx.at[-ov:].set(ramp[::-1])
            wmap = (wy[:, None] * wx[None, :])[None, :, :, None]
            y0, x0 = i0 // f, j0 // f
            canvas = canvas.at[:, y0:y0 + th, x0:x0 + tw].add(m * wmap.astype(m.dtype))
            weight = weight.at[:, y0:y0 + th, x0:x0 + tw].add(wmap)
        moments = canvas / jnp.maximum(weight, 1e-8).astype(canvas.dtype)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def tiled_decode(self, z: jnp.ndarray, tile: int = 64, overlap: int = 16) -> jnp.ndarray:
        """Decode in overlapping latent tiles with linear seam blending —
        the reference's tiled codec (reference: vsr/models/autoencoder_kl.py:
        214-307, blend_h/blend_v :204-212) for frames whose full decode does
        not fit HBM. tile/overlap are in latent pixels."""
        n, h, w, c = z.shape
        if h <= tile and w <= tile:
            return self.decode(z)
        f = self.config.downscale_factor
        stride = tile - overlap
        out_h, out_w = h * f, w * f

        rows = []
        for i0 in range(0, max(h - overlap, 1), stride):
            i1 = min(i0 + tile, h)
            row = []
            for j0 in range(0, max(w - overlap, 1), stride):
                j1 = min(j0 + tile, w)
                row.append((i0, i1, j0, j1, self.decode(z[:, i0:i1, j0:j1])))
            rows.append(row)

        canvas = jnp.zeros((n, out_h, out_w, self.config.out_channels), rows[0][0][4].dtype)
        weight = jnp.zeros((1, out_h, out_w, 1), jnp.float32)
        ov = overlap * f
        for row in rows:
            for (i0, i1, j0, j1, dec) in row:
                th, tw = dec.shape[1], dec.shape[2]
                # linear ramps on the overlapped edges
                wy = jnp.ones((th,), jnp.float32)
                wx = jnp.ones((tw,), jnp.float32)
                ramp_y = (jnp.arange(ov) + 1) / (ov + 1)
                ramp_x = (jnp.arange(ov) + 1) / (ov + 1)
                if i0 > 0:
                    wy = wy.at[:ov].set(ramp_y)
                if i1 < h:
                    wy = wy.at[-ov:].set(ramp_y[::-1])
                if j0 > 0:
                    wx = wx.at[:ov].set(ramp_x)
                if j1 < w:
                    wx = wx.at[-ov:].set(ramp_x[::-1])
                wmap = (wy[:, None] * wx[None, :])[None, :, :, None]
                y0, x0 = i0 * f, j0 * f
                canvas = canvas.at[:, y0:y0 + th, x0:x0 + tw].add(
                    dec * wmap.astype(dec.dtype)
                )
                weight = weight.at[:, y0:y0 + th, x0:x0 + tw].add(wmap)
        return canvas / jnp.maximum(weight, 1e-8).astype(canvas.dtype)
