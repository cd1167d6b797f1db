"""The spatio-temporal UNet.

One configurable model covers all three cascade stages (the reference ships
three near-copies: base/models/unet.py, interpolation/models/unet.py,
vsr/models/unet.py — see UNetConfig factory methods).

Layout: (B, F, H, W, C) channels-last video tensors throughout.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from lavie_tpu.core.config import UNetConfig
from lavie_tpu.nn.layers import GroupNorm, InflatedConv, TimestepEmbedding
from lavie_tpu.nn.resnet import Downsample3D, ResnetBlock3D, Upsample3D
from lavie_tpu.nn.temporal_module import TemporalModule3D
from lavie_tpu.nn.transformer import Transformer3D

Dtype = Any


def _attn_kwargs(cfg: UNetConfig, channels: int, only_cross: bool, dtype, param_dtype):
    return dict(
        in_channels=channels,
        heads=cfg.num_attention_heads,
        head_dim=channels // cfg.num_attention_heads,
        num_layers=1,
        cross_attention_dim=cfg.cross_attention_dim,
        only_cross_attention=only_cross,
        use_linear_projection=cfg.use_linear_projection,
        norm_num_groups=cfg.norm_num_groups,
        spatial_attention=cfg.spatial_attention,
        temporal_attention=cfg.temporal_attention,
        rope_dim=cfg.rope_dim,
        relpos_num_buckets=cfg.relpos_num_buckets,
        relpos_max_distance=cfg.relpos_max_distance,
        ff_before_temporal=cfg.ff_before_temporal,
        use_temporal_resblock=cfg.transformer_temporal_resblock,
        dtype=dtype,
        param_dtype=param_dtype,
    )


class CrossAttnDownBlock3D(nn.Module):
    """(resnet → Transformer3D) × layers + optional downsample
    (reference: base/models/unet_blocks.py:235-362)."""

    config: UNetConfig
    in_channels: int
    out_channels: int
    num_layers: int
    add_downsample: bool
    only_cross_attention: bool
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.resnets = [
            ResnetBlock3D(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                temb_channels=cfg.time_embed_dim,
                groups=cfg.norm_num_groups,
                eps=cfg.norm_eps,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )
            for i in range(self.num_layers)
        ]
        self.attentions = [
            Transformer3D(
                **_attn_kwargs(cfg, self.out_channels, self.only_cross_attention, self.dtype, self.param_dtype)
            )
            for _ in range(self.num_layers)
        ]
        if self.add_downsample:
            self.downsamplers = [
                Downsample3D(self.out_channels, dtype=self.dtype, param_dtype=self.param_dtype)
            ]
        else:
            self.downsamplers = None

    def __call__(self, hidden_states, temb, encoder_hidden_states, image_frames=0):
        output_states = []
        for resnet, attn in zip(self.resnets, self.attentions):
            hidden_states = resnet(hidden_states, temb)
            hidden_states = attn(hidden_states, encoder_hidden_states, image_frames)
            output_states.append(hidden_states)
        if self.downsamplers is not None:
            hidden_states = self.downsamplers[0](hidden_states)
            output_states.append(hidden_states)
        return hidden_states, output_states


class DownBlock3D(nn.Module):
    """resnet × layers + optional downsample
    (reference: base/models/unet_blocks.py:365-441)."""

    config: UNetConfig
    in_channels: int
    out_channels: int
    num_layers: int
    add_downsample: bool
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.resnets = [
            ResnetBlock3D(
                in_channels=self.in_channels if i == 0 else self.out_channels,
                out_channels=self.out_channels,
                temb_channels=cfg.time_embed_dim,
                groups=cfg.norm_num_groups,
                eps=cfg.norm_eps,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )
            for i in range(self.num_layers)
        ]
        if self.add_downsample:
            self.downsamplers = [
                Downsample3D(self.out_channels, dtype=self.dtype, param_dtype=self.param_dtype)
            ]
        else:
            self.downsamplers = None

    def __call__(self, hidden_states, temb):
        output_states = []
        for resnet in self.resnets:
            hidden_states = resnet(hidden_states, temb)
            output_states.append(hidden_states)
        if self.downsamplers is not None:
            hidden_states = self.downsamplers[0](hidden_states)
            output_states.append(hidden_states)
        return hidden_states, output_states


class UNetMidBlock3DCrossAttn(nn.Module):
    """resnet → (Transformer3D → resnet) × layers
    (reference: base/models/unet_blocks.py:145-232)."""

    config: UNetConfig
    in_channels: int
    num_layers: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.resnets = [
            ResnetBlock3D(
                in_channels=self.in_channels,
                out_channels=self.in_channels,
                temb_channels=cfg.time_embed_dim,
                groups=cfg.norm_num_groups,
                eps=cfg.norm_eps,
                output_scale_factor=cfg.mid_block_scale_factor,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )
            for _ in range(self.num_layers + 1)
        ]
        self.attentions = [
            Transformer3D(
                **_attn_kwargs(cfg, self.in_channels, False, self.dtype, self.param_dtype)
            )
            for _ in range(self.num_layers)
        ]

    def __call__(self, hidden_states, temb, encoder_hidden_states, image_frames=0):
        hidden_states = self.resnets[0](hidden_states, temb)
        for attn, resnet in zip(self.attentions, self.resnets[1:]):
            hidden_states = attn(hidden_states, encoder_hidden_states, image_frames)
            hidden_states = resnet(hidden_states, temb)
        return hidden_states


class CrossAttnUpBlock3D(nn.Module):
    """(skip-concat → resnet → Transformer3D) × layers + optional upsample
    (reference: base/models/unet_blocks.py:444-574)."""

    config: UNetConfig
    in_channels: int
    prev_output_channel: int
    out_channels: int
    num_layers: int
    add_upsample: bool
    only_cross_attention: bool
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        resnets = []
        for i in range(self.num_layers):
            res_skip = self.in_channels if i == self.num_layers - 1 else self.out_channels
            res_in = self.prev_output_channel if i == 0 else self.out_channels
            resnets.append(
                ResnetBlock3D(
                    in_channels=res_in + res_skip,
                    out_channels=self.out_channels,
                    temb_channels=cfg.time_embed_dim,
                    groups=cfg.norm_num_groups,
                    eps=cfg.norm_eps,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )
            )
        self.resnets = resnets
        self.attentions = [
            Transformer3D(
                **_attn_kwargs(cfg, self.out_channels, self.only_cross_attention, self.dtype, self.param_dtype)
            )
            for _ in range(self.num_layers)
        ]
        if self.add_upsample:
            self.upsamplers = [
                Upsample3D(self.out_channels, dtype=self.dtype, param_dtype=self.param_dtype)
            ]
        else:
            self.upsamplers = None

    def __call__(self, hidden_states, res_hidden_states, temb, encoder_hidden_states,
                 image_frames=0):
        for resnet, attn in zip(self.resnets, self.attentions):
            res = res_hidden_states.pop()
            hidden_states = jnp.concatenate([hidden_states, res], axis=-1)
            hidden_states = resnet(hidden_states, temb)
            hidden_states = attn(hidden_states, encoder_hidden_states, image_frames)
        if self.upsamplers is not None:
            hidden_states = self.upsamplers[0](hidden_states)
        return hidden_states


class UpBlock3D(nn.Module):
    """(skip-concat → resnet) × layers + optional upsample
    (reference: base/models/unet_blocks.py:577-648)."""

    config: UNetConfig
    in_channels: int
    prev_output_channel: int
    out_channels: int
    num_layers: int
    add_upsample: bool
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        resnets = []
        for i in range(self.num_layers):
            res_skip = self.in_channels if i == self.num_layers - 1 else self.out_channels
            res_in = self.prev_output_channel if i == 0 else self.out_channels
            resnets.append(
                ResnetBlock3D(
                    in_channels=res_in + res_skip,
                    out_channels=self.out_channels,
                    temb_channels=cfg.time_embed_dim,
                    groups=cfg.norm_num_groups,
                    eps=cfg.norm_eps,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )
            )
        self.resnets = resnets
        if self.add_upsample:
            self.upsamplers = [
                Upsample3D(self.out_channels, dtype=self.dtype, param_dtype=self.param_dtype)
            ]
        else:
            self.upsamplers = None

    def __call__(self, hidden_states, res_hidden_states, temb):
        for resnet in self.resnets:
            res = res_hidden_states.pop()
            hidden_states = jnp.concatenate([hidden_states, res], axis=-1)
            hidden_states = resnet(hidden_states, temb)
        if self.upsamplers is not None:
            hidden_states = self.upsamplers[0](hidden_states)
        return hidden_states


class UNet3D(nn.Module):
    """The full spatio-temporal UNet (reference: base/models/unet.py:98-512).

    __call__(sample (B,F,H,W,Cin), timesteps (B,), encoder_hidden_states
    (B,L,D), class_labels (B,) optional) → (B,F,H,W,Cout) prediction.
    """

    config: UNetConfig
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        cfg = self.config
        boc = cfg.block_out_channels
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        self.conv_in = InflatedConv(boc[0], (3, 3), name="conv_in", **common)
        self.time_embedding = TimestepEmbedding(
            sinusoid_dim=boc[0],
            embed_dim=cfg.time_embed_dim,
            flip_sin_to_cos=cfg.flip_sin_to_cos,
            freq_shift=cfg.freq_shift,
            name="time_embedding",
            **common,
        )
        if cfg.class_embed_type == "num_embeds":
            # VSR learned noise-level embedding
            # (reference: vsr/models/unet.py:179-186)
            self.class_embedding = nn.Embed(
                cfg.num_class_embeds,
                cfg.time_embed_dim,
                param_dtype=self.param_dtype,
                name="class_embedding",
            )
        else:
            self.class_embedding = None

        oca = cfg.only_cross_attention_per_block
        down_blocks = []
        output_channel = boc[0]
        for i, block_type in enumerate(cfg.down_block_types):
            input_channel = output_channel
            output_channel = boc[i]
            is_final = i == len(boc) - 1
            if block_type == "CrossAttnDownBlock3D":
                down_blocks.append(
                    CrossAttnDownBlock3D(
                        config=cfg,
                        in_channels=input_channel,
                        out_channels=output_channel,
                        num_layers=cfg.layers_per_block,
                        add_downsample=not is_final,
                        only_cross_attention=oca[i],
                        **common,
                    )
                )
            elif block_type == "DownBlock3D":
                down_blocks.append(
                    DownBlock3D(
                        config=cfg,
                        in_channels=input_channel,
                        out_channels=output_channel,
                        num_layers=cfg.layers_per_block,
                        add_downsample=not is_final,
                        **common,
                    )
                )
            else:
                raise ValueError(f"unknown down block type: {block_type}")
        self.down_blocks = down_blocks

        self.mid_block = UNetMidBlock3DCrossAttn(
            config=cfg, in_channels=boc[-1], **common
        )

        # VSR temporal adapters after every down/mid/up block
        # (reference: vsr/models/unet.py:239-247, 270-276, 325-332)
        if cfg.use_temporal_modules:
            tm = lambda ch: TemporalModule3D(
                channels=ch,
                temb_channels=cfg.time_embed_dim,
                norm_num_groups=cfg.norm_num_groups,
                attention_block_types=cfg.temporal_module_attention_types,
                cross_frame_attention_mode=cfg.temporal_module_cross_frame_mode,
                temporal_shift_fold_div=cfg.temporal_module_shift_fold_div,
                use_dcn_warpping=cfg.temporal_module_use_dcn_warpping,
                use_deformable_conv=cfg.temporal_module_use_deformable_conv,
                num_attention_heads=cfg.num_attention_heads,
                **common,
            )
            self.down_temporal_blocks = [tm(boc[i]) for i in range(len(cfg.down_block_types))]
            self.mid_temporal_block = tm(boc[-1])
            rev = list(reversed(boc))
            self.up_temporal_blocks = [tm(rev[i]) for i in range(len(cfg.up_block_types))]
        else:
            self.down_temporal_blocks = None
            self.mid_temporal_block = None
            self.up_temporal_blocks = None

        rev_boc = list(reversed(boc))
        rev_oca = list(reversed(oca))
        up_blocks = []
        output_channel = rev_boc[0]
        for i, block_type in enumerate(cfg.up_block_types):
            is_final = i == len(boc) - 1
            prev_output_channel = output_channel
            output_channel = rev_boc[i]
            input_channel = rev_boc[min(i + 1, len(boc) - 1)]
            if block_type == "CrossAttnUpBlock3D":
                up_blocks.append(
                    CrossAttnUpBlock3D(
                        config=cfg,
                        in_channels=input_channel,
                        prev_output_channel=prev_output_channel,
                        out_channels=output_channel,
                        num_layers=cfg.layers_per_block + 1,
                        add_upsample=not is_final,
                        only_cross_attention=rev_oca[i],
                        **common,
                    )
                )
            elif block_type == "UpBlock3D":
                up_blocks.append(
                    UpBlock3D(
                        config=cfg,
                        in_channels=input_channel,
                        prev_output_channel=prev_output_channel,
                        out_channels=output_channel,
                        num_layers=cfg.layers_per_block + 1,
                        add_upsample=not is_final,
                        **common,
                    )
                )
            else:
                raise ValueError(f"unknown up block type: {block_type}")
        self.up_blocks = up_blocks

        self.conv_norm_out = GroupNorm(
            num_groups=cfg.norm_num_groups, epsilon=cfg.norm_eps, dtype=self.dtype,
            name="conv_norm_out",
        )
        self.conv_out = InflatedConv(cfg.out_channels, (3, 3), name="conv_out", **common)

    @property
    def num_prefix_blocks(self) -> int:
        """Leading down blocks with no text dependence (no cross-attention).
        Everything up to and including these — conv_in, time/class embedding,
        the blocks and their temporal modules — computes identical values for
        the CFG cond/uncond halves; pipelines running split CFG evaluate it
        ONCE per step via forward_prefix (a structural saving XLA cannot find
        across two separate UNet applications). For the VSR UNet this is the
        full-resolution DownBlock3D — ~5% of the forward."""
        n = 0
        for t in self.config.down_block_types:
            if t == "DownBlock3D":
                n += 1
            else:
                break
        return n

    def _embed(self, timesteps, class_labels):
        emb = self.time_embedding(timesteps)
        if self.class_embedding is not None:
            assert class_labels is not None, "class_labels required (noise level)"
            emb = emb + self.class_embedding(class_labels).astype(emb.dtype)
        return emb

    def forward_prefix(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        class_labels: Optional[jnp.ndarray] = None,
    ):
        """Run the conditioning-independent prefix; returns the state to feed
        __call__(prefix=...) for each CFG half."""
        from lavie_tpu.nn.quant import conv_quant_scope

        with conv_quant_scope(self.config.conv_quant, self.config.conv_quant_exclude):
            return self._forward_prefix(sample, timesteps, class_labels)

    def _forward_prefix(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        class_labels: Optional[jnp.ndarray] = None,
    ):
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
        emb = self._embed(timesteps, class_labels)
        sample = sample.astype(self.dtype)
        sample = self.conv_in(sample)
        res_stack = [sample]
        for i in range(self.num_prefix_blocks):
            sample, res = self.down_blocks[i](sample, emb)
            res_stack.extend(res)
            if self.down_temporal_blocks is not None:
                sample = self.down_temporal_blocks[i](sample, emb, timesteps)
        return sample, res_stack

    def __call__(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        class_labels: Optional[jnp.ndarray] = None,
        image_frames: int = 0,
        prefix=None,
    ) -> jnp.ndarray:
        """image_frames: trailing still images appended to the frame axis for
        joint image-video training (reference: base/models/unet.py:366-375);
        they skip temporal attention and get their own text states.
        prefix: optional (sample, res_stack) from forward_prefix — skips the
        conditioning-independent leading blocks (split-CFG sharing)."""
        from lavie_tpu.nn.quant import conv_quant_scope

        with conv_quant_scope(self.config.conv_quant, self.config.conv_quant_exclude):
            return self._forward(
                sample, timesteps, encoder_hidden_states, class_labels,
                image_frames, prefix,
            )

    def _forward(
        self,
        sample: jnp.ndarray,
        timesteps: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        class_labels: Optional[jnp.ndarray] = None,
        image_frames: int = 0,
        prefix=None,
    ) -> jnp.ndarray:
        cfg = self.config
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        emb = self._embed(timesteps, class_labels)

        if prefix is not None:
            sample, res_stack = prefix
            res_stack = list(res_stack)
            start = self.num_prefix_blocks
        else:
            sample = sample.astype(self.dtype)
            sample = self.conv_in(sample)
            res_stack = [sample]
            start = 0

        # down
        for i, block in enumerate(self.down_blocks):
            if i < start:
                continue
            if isinstance(block, CrossAttnDownBlock3D):
                sample, res = block(sample, emb, encoder_hidden_states, image_frames)
            else:
                sample, res = block(sample, emb)
            res_stack.extend(res)
            if self.down_temporal_blocks is not None:
                sample = self.down_temporal_blocks[i](sample, emb, timesteps)

        # mid
        sample = self.mid_block(sample, emb, encoder_hidden_states, image_frames)
        if self.mid_temporal_block is not None:
            sample = self.mid_temporal_block(sample, emb, timesteps)

        # up
        for i, block in enumerate(self.up_blocks):
            n = len(block.resnets)
            res, res_stack = res_stack[-n:], res_stack[:-n]
            if isinstance(block, CrossAttnUpBlock3D):
                sample = block(sample, list(res), emb, encoder_hidden_states,
                               image_frames)
            else:
                sample = block(sample, list(res), emb)
            if self.up_temporal_blocks is not None:
                sample = self.up_temporal_blocks[i](sample, emb, timesteps)

        sample = self.conv_norm_out(sample)
        sample = nn.silu(sample)
        sample = self.conv_out(sample)
        return sample
