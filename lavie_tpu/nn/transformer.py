"""Spatio-temporal transformer blocks.

The core factorization of the cascade: per-frame spatial self-attention, text
cross-attention, then frame-axis temporal attention — never full (f·h·w)²
attention (reference: base/models/attention.py:294-560). That factorization
*is* the long-context strategy (SURVEY §5.7).
"""

from __future__ import annotations

import os

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from lavie_tpu.nn.attention import Attention, SparseCausalAttention, TemporalAttention
from lavie_tpu.nn.layers import GroupNorm, fold_frames, unfold_frames

Dtype = Any


class _LayerNormCore(nn.Module):
    """LayerNorm with fp32-accumulated statistics and native-dtype elementwise
    math (no materialized fp32 activation copies — same rationale as
    layers._GroupNormCore)."""

    epsilon: float

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = jnp.mean(x, axis=-1, dtype=jnp.float32, keepdims=True)
        mean_sq = jnp.mean(
            jnp.square(x.astype(jnp.float32)), axis=-1, dtype=jnp.float32, keepdims=True
        )
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        xn = (x - mean.astype(x.dtype)) * inv.astype(x.dtype)
        return xn * scale.astype(x.dtype) + bias.astype(x.dtype)


class LayerNorm(nn.Module):
    """LayerNorm with fp32 statistics, elementwise in the activation dtype.
    Param paths stay `<name>/norm/{scale,bias}` for the converter."""

    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _LayerNormCore(epsilon=self.epsilon, name="norm")(x)


class _DenseParams(nn.Module):
    """Parameter container with nn.Dense's tree layout ({kernel, bias}) so the
    checkpoint converter sees identical paths, while the parent is free to
    compute with a fused kernel."""

    features_in: int
    features_out: int
    param_dtype: Dtype = jnp.float32

    def setup(self):
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.features_in, self.features_out), self.param_dtype,
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros, (self.features_out,), self.param_dtype
        )


class FeedForward(nn.Module):
    """GEGLU feed-forward, dim → 4·dim → dim (diffusers FeedForward;
    reference: base/models/attention.py:479).

    On TPU, lane-aligned widths route through the fused Pallas GEGLU kernel
    (kernels/geglu.py): the 4·dim hidden tensor stays in VMEM instead of a
    (tokens × 4·dim) HBM round trip — at the VSR 512-channel levels that round
    trip is 5.4 GB per block and the XLA matmuls run bandwidth-bound."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        inner = self.dim * self.mult
        self.net_0_proj = _DenseParams(
            features_in=self.dim, features_out=inner * 2,
            param_dtype=self.param_dtype, name="net_0_proj",
        )
        self.net_2 = _DenseParams(
            features_in=inner, features_out=self.dim,
            param_dtype=self.param_dtype, name="net_2",
        )

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult
        w0, b0 = self.net_0_proj.kernel, self.net_0_proj.bias
        w2, b2 = self.net_2.kernel, self.net_2.bias
        if _geglu_kernel_enabled(x, self.dim, inner):
            from lavie_tpu.kernels.geglu import geglu

            return geglu(
                x, w0.astype(self.dtype), b0, w2.astype(self.dtype), b2
            )
        proj = (x @ w0.astype(self.dtype)) + b0.astype(self.dtype)
        hidden, gate = jnp.split(proj, 2, axis=-1)
        h = hidden * nn.gelu(gate, approximate=False)
        return (h @ w2.astype(self.dtype)) + b2.astype(self.dtype)


def _geglu_kernel_enabled(x, dim: int, inner: int) -> bool:

    if os.environ.get("LAVIE_DISABLE_FLASH") == "1":
        return False
    from lavie_tpu.kernels.attention import _on_tpu
    from lavie_tpu.kernels.geglu import geglu_supported_shape

    if not _on_tpu():
        return False
    n = 1
    for s in x.shape[:-1]:
        n *= s
    return geglu_supported_shape(n, dim, inner)


class BasicTransformerBlock(nn.Module):
    """One spatial/cross/temporal/FF block over spatially-folded tokens
    (B·F, S, C) (reference: base/models/attention.py:410-560)."""

    dim: int
    heads: int
    head_dim: int
    cross_attention_dim: Optional[int] = None
    only_cross_attention: bool = False
    spatial_attention: str = "self"  # self | sparse_causal
    temporal_attention: str = "rope_relbias"  # rope_relbias | learned_relpos | none
    rope_dim: int = 32
    relpos_num_buckets: int = 32
    relpos_max_distance: int = 32
    # The interpolation stage's block applies the FF BEFORE temporal
    # attention (reference: interpolation/models/attention.py:570-607);
    # base and VSR apply it after (base/models/attention.py:511-560,
    # vsr/models/attention.py:552-593). Order matters with trained weights.
    ff_before_temporal: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        if self.spatial_attention == "sparse_causal":
            self.attn1 = SparseCausalAttention(
                query_dim=self.dim, heads=self.heads, head_dim=self.head_dim, **common,
                name="attn1",
            )
        else:
            self.attn1 = Attention(
                query_dim=self.dim,
                heads=self.heads,
                head_dim=self.head_dim,
                cross_attention_dim=self.cross_attention_dim if self.only_cross_attention else None,
                **common,
                name="attn1",
            )
        self.norm1 = LayerNorm(dtype=self.dtype, name="norm1")

        # attn2 exists whenever cross_attention_dim is set — INCLUDING
        # only-cross blocks, which therefore run TWO text cross-attentions
        # (attn1 with text kv, then attn2): reference
        # vsr/models/attention.py:489-506 builds attn2 unconditionally and
        # :571-580 runs it. The x4-upscaler checkpoint carries those weights.
        if self.cross_attention_dim is not None:
            self.attn2 = Attention(
                query_dim=self.dim,
                heads=self.heads,
                head_dim=self.head_dim,
                cross_attention_dim=self.cross_attention_dim,
                **common,
                name="attn2",
            )
            self.norm2 = LayerNorm(dtype=self.dtype, name="norm2")
        else:
            self.attn2 = None

        if self.temporal_attention != "none":
            self.attn_temp = TemporalAttention(
                query_dim=self.dim,
                heads=self.heads,
                head_dim=self.head_dim,
                variant=self.temporal_attention,
                rope_dim=self.rope_dim,
                num_buckets=self.relpos_num_buckets,
                max_distance=self.relpos_max_distance,
                **common,
                name="attn_temp",
            )
            self.norm_temp = LayerNorm(dtype=self.dtype, name="norm_temp")
        else:
            self.attn_temp = None

        self.ff = FeedForward(dim=self.dim, **common, name="ff")
        self.norm3 = LayerNorm(dtype=self.dtype, name="norm3")

    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (B·F, S, C)
        encoder_hidden_states: Optional[jnp.ndarray],  # (B·F, L, D)
        video_length: int,
        image_frames: int = 0,
    ) -> jnp.ndarray:
        # spatial attention (self, sparse-causal, or only-cross for VSR blocks)
        norm_hs = self.norm1(hidden_states)
        if self.spatial_attention == "sparse_causal":
            hidden_states = self.attn1(norm_hs, video_length=video_length) + hidden_states
        elif self.only_cross_attention:
            hidden_states = self.attn1(norm_hs, encoder_hidden_states) + hidden_states
        else:
            hidden_states = self.attn1(norm_hs) + hidden_states

        # text cross-attention
        if self.attn2 is not None:
            hidden_states = (
                self.attn2(self.norm2(hidden_states), encoder_hidden_states)
                + hidden_states
            )

        # The interpolation block runs FF before temporal attention; base and
        # VSR run it after (see ff_before_temporal).
        if self.ff_before_temporal:
            hidden_states = self.ff(self.norm3(hidden_states)) + hidden_states

        # temporal attention over the frame axis: (B·F, S, C) → (B·S, F, C).
        # In joint image-video training the trailing `image_frames` stills are
        # excluded from temporal attention (reference:
        # base/models/attention.py:537-547 training branch).
        if self.attn_temp is not None:
            hidden_states = self._apply_temporal(
                hidden_states, video_length, image_frames
            )

        if not self.ff_before_temporal:
            hidden_states = self.ff(self.norm3(hidden_states)) + hidden_states
        return hidden_states

    def _apply_temporal(
        self, hidden_states: jnp.ndarray, video_length: int, image_frames: int
    ) -> jnp.ndarray:
        bf, s, c = hidden_states.shape
        b = bf // video_length
        if (
            image_frames == 0
            and not self.is_initializing()
            and self.attn_temp.channel_major_supported(video_length, s)
        ):
            # channel-major fused kernel: projections emit (C, B, F, S)
            # directly (transposes folded into the GEMMs), the kernel does
            # rope+bias+softmax in VMEM (kernels/temporal_fused.py)
            x4 = hidden_states.reshape(b, video_length, s, c)
            x4 = self.attn_temp.channel_major(self.norm_temp(x4)) + x4
            return x4.reshape(bf, s, c)
        if image_frames == 0 and self.attn_temp.folded_supported(video_length, s):
            # fused kernel path: stays in (B, F, S, C), no transposes
            x4 = hidden_states.reshape(b, video_length, s, c)
            x4 = self.attn_temp.folded(self.norm_temp(x4)) + x4
            return x4.reshape(bf, s, c)
        x = hidden_states.reshape(b, video_length, s, c)
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * s, video_length, c)
        if image_frames > 0:
            vid = x[:, : video_length - image_frames]
            img = x[:, video_length - image_frames:]
            vid = self.attn_temp(self.norm_temp(vid)) + vid
            x = jnp.concatenate([vid, img], axis=1)
        else:
            x = self.attn_temp(self.norm_temp(x)) + x
        x = x.reshape(b, s, video_length, c)
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(bf, s, c)

    def fused_only_cross_supported(self, n_tokens: int, kv_len: int) -> bool:
        """Gate for the fused only-cross path (kernels/cross_block.py):
        head kernel [proj_in → LN1+attn1 → LN2+attn2] and tail kernel
        [LN3 → GEGLU ff → proj_out → +residual]. Disable with
        LAVIE_CROSS_BLOCK=0."""

        mode = os.environ.get("LAVIE_CROSS_BLOCK", "1")
        if mode not in ("1", "force"):  # "force" = interpret mode off-TPU (tests)
            return False
        if os.environ.get("LAVIE_DISABLE_FLASH") == "1":
            return False
        if not (
            self.only_cross_attention
            and self.attn2 is not None
            and not self.ff_before_temporal
        ):
            return False
        from lavie_tpu.kernels.attention import _on_tpu
        from lavie_tpu.kernels.cross_block import (
            cross_block_supported,
            tail_supported,
        )

        import jax.numpy as _jnp

        return (
            (_on_tpu() or mode == "force")
            and cross_block_supported(
                n_tokens, self.dim, self.heads, self.head_dim, kv_len
            )
            and tail_supported(
                n_tokens, self.dim, self.dim * 4,
                itemsize=_jnp.dtype(self.dtype).itemsize,
            )
        )

    def fused_only_cross(
        self,
        hidden_states: jnp.ndarray,  # (B·F, S, C) GroupNorm'd, pre-proj_in
        encoder_hidden_states: jnp.ndarray,  # (B·F, L, D)
        video_length: int,
        wpi: jnp.ndarray, bpi: jnp.ndarray,  # Transformer3D proj_in
        wpo: jnp.ndarray, bpo: jnp.ndarray,  # Transformer3D proj_out
        residual: jnp.ndarray,  # (B·F, S, C) transformer outer residual
    ) -> jnp.ndarray:
        """The VSR only-cross block as two fused Pallas passes around the
        temporal attention (which needs the frame axis and forces the kernel
        boundary). Numerics match the unfused path to bf16 tolerance; the
        interpret-mode tests (tests/test_cross_block.py) pin fp32 exactness."""

        from lavie_tpu.kernels.attention import _on_tpu
        from lavie_tpu.kernels.cross_block import (
            cross_attention_head,
            transformer_tail,
        )

        interpret = (
            not _on_tpu() and os.environ.get("LAVIE_CROSS_BLOCK") == "force"
        )

        def attn_params(attn, norm):
            p = lambda m, k: m.variables["params"][k]["kernel"].astype(self.dtype)
            nrm = norm.variables["params"]["norm"]
            kw = p(attn, "to_k")
            vw = p(attn, "to_v")
            k = encoder_hidden_states @ kw
            v = encoder_hidden_states @ vw
            return (
                nrm["scale"], nrm["bias"],
                p(attn, "to_q"),
                p(attn, "to_out_0"),
                attn.to_out_0.variables["params"]["bias"],
                k, v,
            )

        x = cross_attention_head(
            hidden_states, wpi, bpi,
            attn_params(self.attn1, self.norm1),
            attn_params(self.attn2, self.norm2),
            heads=self.heads, scale=self.head_dim ** -0.5,
            interpret=interpret,
        )
        if self.attn_temp is not None:
            x = self._apply_temporal(x, video_length, 0)
        ln3 = self.norm3.variables["params"]["norm"]
        return transformer_tail(
            x, residual, ln3["scale"], ln3["bias"],
            self.ff.net_0_proj.kernel.astype(self.dtype), self.ff.net_0_proj.bias,
            self.ff.net_2.kernel.astype(self.dtype), self.ff.net_2.bias,
            wpo, bpo,
            interpret=interpret,
        )


class Transformer3D(nn.Module):
    """GroupNorm → proj_in → transformer blocks → proj_out, with the frame
    axis folded into batch for all spatial work
    (reference: base/models/attention.py:294-407)."""

    in_channels: int
    heads: int
    head_dim: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    only_cross_attention: bool = False
    use_linear_projection: bool = False
    norm_num_groups: int = 32
    spatial_attention: str = "self"
    temporal_attention: str = "rope_relbias"
    rope_dim: int = 32
    relpos_num_buckets: int = 32
    relpos_max_distance: int = 32
    ff_before_temporal: bool = False
    # VSR: a ResnetBlock3DCNN(kernel (3,1,1)) runs before the transformer,
    # inside its residual (reference: vsr/models/attention.py:350, :396-399)
    use_temporal_resblock: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def setup(self):
        inner = self.heads * self.head_dim
        if self.use_temporal_resblock:
            from lavie_tpu.nn.resnet import ResnetBlock3DCNN

            self.temporal_resblock = ResnetBlock3DCNN(
                in_channels=self.in_channels,
                out_channels=self.in_channels,
                kernel_frames=3,
                temb_channels=None,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="resblock_temporal",
            )
        else:
            self.temporal_resblock = None
        self.norm = GroupNorm(
            num_groups=self.norm_num_groups, epsilon=1e-6, dtype=self.dtype, name="norm"
        )
        # use_linear_projection is intentionally layout-only here: in
        # channels-last a 1×1 conv IS a dense over the channel axis, so both
        # reference variants (nn.Linear vs nn.Conv2d 1×1 —
        # vsr/configs/unet_3d_config.json use_linear_projection=true vs the
        # base UNet's conv projections) collapse to the same module; the
        # converter maps either weight shape onto it (io/convert.py).
        self.proj_in = nn.Dense(
            inner, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_in"
        )
        self.proj_out = nn.Dense(
            self.in_channels, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_out"
        )
        self.transformer_blocks = [
            BasicTransformerBlock(
                dim=inner,
                heads=self.heads,
                head_dim=self.head_dim,
                cross_attention_dim=self.cross_attention_dim,
                only_cross_attention=self.only_cross_attention,
                spatial_attention=self.spatial_attention,
                temporal_attention=self.temporal_attention,
                rope_dim=self.rope_dim,
                relpos_num_buckets=self.relpos_num_buckets,
                relpos_max_distance=self.relpos_max_distance,
                ff_before_temporal=self.ff_before_temporal,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )
            for _ in range(self.num_layers)
        ]

    def __call__(
        self,
        hidden_states: jnp.ndarray,  # (B, F, H, W, C)
        encoder_hidden_states: Optional[jnp.ndarray],  # (B, L, D) or, for
        # joint image-video training, (B, 1+image_frames, L, D) — one row of
        # text states for the video plus one per appended still
        # (reference: base/models/attention.py:358-364)
        image_frames: int = 0,
    ) -> jnp.ndarray:
        b, f, h, w, c = hidden_states.shape
        if self.temporal_resblock is not None:
            # VSR: a (3,1,1) 3D-CNN resnet runs BEFORE the transformer and
            # INSIDE its residual — output = transformer(x') + x' with
            # x' = resblock_temporal(x) (reference:
            # vsr/models/attention.py:350, :396-399, :436 residual placement).
            # Run it on (B, F, H·W, C): the 1×1-spatial taps make the flat
            # form identical, and it avoids the degenerate conv layout XLA
            # picks between token-shaped neighbors (see layers.TemporalConv).
            hidden_states = self.temporal_resblock(
                hidden_states.reshape(b, f, h * w, c), None
            ).reshape(b, f, h, w, c)
        residual = hidden_states
        x, _ = fold_frames(hidden_states)  # (B·F, H, W, C)
        x = self.norm(x)
        # tokens
        x = x.reshape(b * f, h * w, c)

        ehs = None
        if encoder_hidden_states is not None:
            if encoder_hidden_states.ndim == 4:
                video_f = f - image_frames
                vid = jnp.repeat(encoder_hidden_states[:, 0], video_f, axis=0)
                vid = vid.reshape(b, video_f, *vid.shape[1:])
                ehs = jnp.concatenate([vid, encoder_hidden_states[:, 1:]], axis=1)
                ehs = ehs.reshape(b * f, *ehs.shape[2:])
            else:
                # repeat text states per frame: (B, L, D) → (B·F, L, D)
                ehs = jnp.repeat(encoder_hidden_states, f, axis=0)

        # VSR only-cross fast path: one transformer layer fused into two
        # Pallas passes (head: proj_in+attn1+attn2, tail: ff+proj_out) around
        # the temporal attention (kernels/cross_block.py)
        if (
            self.num_layers == 1
            and image_frames == 0
            and ehs is not None
            and not self.is_initializing()
            and self.transformer_blocks[0].fused_only_cross_supported(
                h * w, ehs.shape[1]
            )
        ):
            pin = self.proj_in.variables["params"]
            pout = self.proj_out.variables["params"]
            x = self.transformer_blocks[0].fused_only_cross(
                x, ehs, f,
                pin["kernel"].astype(self.dtype), pin["bias"],
                pout["kernel"].astype(self.dtype), pout["bias"],
                residual.reshape(b * f, h * w, c),
            )
            return x.reshape(b, f, h, w, c)

        x = self.proj_in(x)
        for block in self.transformer_blocks:
            x = block(x, ehs, video_length=f, image_frames=image_frames)

        x = self.proj_out(x)
        x = x.reshape(b, f, h, w, c)
        return x + residual
