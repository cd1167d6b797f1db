"""VSR temporal adapter modules.

TemporalModule3D (reference: vsr/models/temporal_module.py:65-178) is a
residual temporal block inserted after every down/mid/up UNet block: a true
3D temporal-conv resnet (kernel (5,1,1)) → a spatial resnet → a ZERO-INIT 1×1
shift conv added back to the input, so at init the module is a no-op over the
pretrained 2D upsampler.

The shipped VSR config disables the optional branches
(`attention_block_types: ["", ""]`, `video_condition: false`,
reference: vsr/configs/unet_3d_config.json:52-55,:64), but the full schema is
implemented: the versatile-attention transformer (nn/versatile_attention.py),
the conditioning-video concat branch (v_cond_conv), and the scale-shift
residual variant — each parity-tested against the reference torch module
(tests/test_ref_parity.py::TestVSRModuleParity).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from lavie_tpu.nn.layers import InflatedConv
from lavie_tpu.nn.resnet import ResnetBlock3D, ResnetBlock3DCNN

Dtype = Any


class TemporalModule3D(nn.Module):
    channels: int
    temb_channels: int
    norm_num_groups: int = 32
    # the attention wrapper's GroupNorm defaults to 8 groups in the reference
    # (temporal_module.py:83 norm_num_groups=8) while the resnets hard-code 32
    attention_norm_num_groups: int = 8
    # optional VersatileSelfAttention branch (disabled in the shipped config)
    attention_block_types: tuple = ("", "")
    cross_frame_attention_mode: str = "0_i-1_i"
    temporal_shift_fold_div: int = 2
    attention_dim_div: int = 2
    num_attention_heads: int = 8
    use_dcn_warpping: bool = False
    use_deformable_conv: bool = False
    # conditioning-video branch: RGB frames → ResnetBlock3D(3 → C/4,
    # groups=3/groups_out=32) concatenated onto the input channels before the
    # temporal resnet (reference: temporal_module.py:106-112, :155-163;
    # `video_condition: false` in the shipped config)
    video_condition: bool = False
    # scale-shift residual: zero-init 1×1 conv → (1+scale)·input + shift
    # instead of input + shift (reference: temporal_module.py:145-176; the
    # reference notes use_scale_shift=True NaNs in training and defaults off)
    use_scale_shift: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: Optional[jnp.ndarray],
        timesteps: Optional[jnp.ndarray] = None,
        condition_video: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        # The temporal 3D-CNN resnet can run on the flattened (B, F, H·W, C)
        # form — the (k,1,1) taps are spatially 1×1. The 3D-CNN resnet
        # receives the 5D form here; its fused Pallas path reads/writes the
        # token-major view that bitcasts to the surrounding convs' layout,
        # and its XLA fallback applies the flatten-to-GEMM-shift gate
        # internally — see ResnetBlock3DCNN.__call__.
        h_in = x
        in_ch = self.channels
        if self.video_condition:
            assert condition_video is not None, "video_condition needs frames"
            cond_dim = self.channels // 4
            hidden_condition = ResnetBlock3D(
                in_channels=3,
                out_channels=cond_dim,
                temb_channels=self.temb_channels,
                groups=3,
                groups_out=32,
                name="v_cond_conv",
                **common,
            )(condition_video, temb)
            h_in = jnp.concatenate([x, hidden_condition], axis=-1)
            in_ch = self.channels + cond_dim

        h = ResnetBlock3DCNN(
            in_channels=in_ch,
            out_channels=self.channels,
            kernel_frames=5,
            temb_channels=self.temb_channels,
            groups=self.norm_num_groups,
            name="resblocks_3d_t",
            **common,
        )(h_in, temb)
        h = ResnetBlock3D(
            in_channels=self.channels,
            out_channels=self.channels,
            temb_channels=self.temb_channels,
            groups=self.norm_num_groups,
            name="resblocks_3d_s",
            **common,
        )(h, temb)

        if any(self.attention_block_types):
            # versatile attention branch (reference: temporal_module.py:117-143
            # wraps the blocks in a TemporalTransformer3DModel — GroupNorm +
            # proj_in/out + residual; head_dim = C / heads / attention_dim_div)
            from lavie_tpu.nn.versatile_attention import TemporalTransformer3D

            b, f, hh, ww, c = h.shape
            tokens = h.reshape(b * f, hh * ww, c)
            ts = timesteps
            if ts is None:
                ts = jnp.zeros((b,), jnp.int32)
            ts = jnp.repeat(ts, f, axis=0)
            tokens = TemporalTransformer3D(
                dim=self.num_attention_heads
                * max(c // self.num_attention_heads // self.attention_dim_div, 1),
                heads=self.num_attention_heads,
                head_dim=max(c // self.num_attention_heads // self.attention_dim_div, 1),
                attention_block_types=tuple(self.attention_block_types),
                norm_num_groups=self.attention_norm_num_groups,
                cross_frame_attention_mode=self.cross_frame_attention_mode,
                temporal_shift_fold_div=self.temporal_shift_fold_div,
                use_dcn_warpping=self.use_dcn_warpping,
                use_deformable_conv=self.use_deformable_conv,
                name="attentions_0",
                **common,
            )(tokens, ts, video_length=f)
            h = tokens.reshape(b, f, hh, ww, c)
        # zero-init shift conv: residual is a no-op at init. NOTE: a fused
        # Pallas shift+add was tried and REVERTED — the kernel itself was
        # faster (6.0 vs 11.7 ms at L0) but the pallas_call boundary broke
        # the preceding spatial resnet's epilogue fusions (its residual add
        # unfused, +12.6 ms; conv2 dropped 177→154 TF/s): net −25 ms. A
        # token-GEMM form of the 1×1 was also tried and reverted (−11% TSR).
        if self.use_scale_shift:
            h = InflatedConv(
                self.channels * 2,
                (1, 1),
                kernel_init=nn.initializers.zeros,
                name="scale_shift_conv",
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(h)
            scale, shift = jnp.split(h, 2, axis=-1)
            return (1 + scale) * x + shift
        h = InflatedConv(
            self.channels,
            (1, 1),
            kernel_init=nn.initializers.zeros,
            name="shift_conv",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(h)
        return x + h
