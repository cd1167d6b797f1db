"""Core layers shared by all models.

Layout convention: video activations are channels-last (B, F, H, W, C) —
the TPU-native layout (XLA convs want NHWC; the reference is NCHW,
reference: base/models/resnet.py:13-21). Spatial ops fold frames into batch
as (B·F, H, W, C), which is a free reshape in this layout.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from lavie_tpu.nn.embeddings import sinusoidal_timestep_embedding

Dtype = Any


def _module_path(m: nn.Module) -> Optional[str]:
    """The module's flax scope path as "a/b/c" — used by the selective
    quantization gate (nn/quant.py exclude patterns); None outside apply."""
    try:
        return "/".join(m.scope.path)
    except Exception:
        return None


def fold_frames(x: jnp.ndarray) -> Tuple[jnp.ndarray, int]:
    """(B, F, H, W, C) → (B·F, H, W, C). The TPU analog of the reference's
    `rearrange(x, "b c f h w -> (b f) c h w")` per-frame fold
    (reference: base/models/resnet.py:17)."""
    b, f = x.shape[0], x.shape[1]
    return x.reshape((b * f,) + x.shape[2:]), f


def unfold_frames(x: jnp.ndarray, video_length: int) -> jnp.ndarray:
    """(B·F, H, W, C) → (B, F, H, W, C)."""
    bf = x.shape[0]
    return x.reshape((bf // video_length, video_length) + x.shape[1:])


def groupnorm_affine(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, num_groups: int,
    epsilon: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold GroupNorm statistics with gamma/beta into a per-(batch, channel)
    affine: GN(x) == x·w + u. One read of x (per-channel fp32 reductions with
    C minor — see _GroupNormCore for why the layout matters); the tiny (B, C)
    stats fold channels→groups exactly. Lets fused kernels apply GN as a
    multiply-add (kernels/temporal_resblock.py)."""
    # Reduce over all-but-(B, C) axes WITHOUT reshaping: a (b, -1, c) reshape
    # is only free on row-major layouts, so on a conv-layout producer
    # ({4,1,3,2,0} NHWC with the frame axis tucked inside H/W) XLA had to
    # materialize a transposed copy of the whole activation just to feed the
    # stats reduce — measured ~2 ms per call at the VSR L0 level. An axis
    # reduction fuses with the producer in whatever layout it already has.
    axes = tuple(range(1, x.ndim - 1))
    s1 = jnp.mean(x, axis=axes, dtype=jnp.float32)  # (B, C)
    s2 = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=axes, dtype=jnp.float32)
    return groupnorm_affine_from_moments(s1, s2, scale, bias, num_groups, epsilon)


def groupnorm_affine_from_moments(
    mean_c: jnp.ndarray, meansq_c: jnp.ndarray,  # (B, C) per-CHANNEL moments
    scale: jnp.ndarray, bias: jnp.ndarray, num_groups: int, epsilon: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The groupnorm_affine fold given precomputed per-channel E[x], E[x²] —
    e.g. the (Σ, Σ²)/n a fused producer kernel emits alongside its output
    (kernels/temporal_resblock.py emit_stats)."""
    g = num_groups
    b, c = mean_c.shape
    gm = jnp.mean(mean_c.reshape(b, g, c // g), axis=-1)  # (B, g)
    gs = jnp.mean(meansq_c.reshape(b, g, c // g), axis=-1)
    var = jnp.maximum(gs - jnp.square(gm), 0.0)
    inv = jax.lax.rsqrt(var + epsilon)  # (B, g)
    inv_c = jnp.repeat(inv, c // g, axis=-1)  # (B, C)
    mc = jnp.repeat(gm, c // g, axis=-1)
    w = inv_c * scale[None]
    u = bias[None] - mc * inv_c * scale[None]
    return w, u


class _GroupNormCore(nn.Module):
    """Hand-rolled GroupNorm: fp32 mean/var ACCUMULATION without materializing
    an fp32 copy of the activation, elementwise math in the input dtype.

    Reduction layout matters enormously on TPU: reducing a
    (B, S, groups, c/g) view puts c/g (=8) in the minor/lane dim — measured
    39% of the whole VSR UNet step in `convert_reduce_fusion`s. Instead we
    reduce PER-CHANNEL over the major axes (C stays minor, lanes fully
    utilized), then fold channels→groups on the tiny (B, C) stats array —
    mathematically identical, ~an order of magnitude less reduce time. The
    apply phase folds (mean, inv, scale, bias) into one per-channel
    multiply-add."""

    num_groups: int
    epsilon: float

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = self.num_groups
        c = x.shape[-1]
        assert c % g == 0, f"channels {c} not divisible by groups {g}"
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        b = x.shape[0]
        wf, uf = groupnorm_affine(x, scale, bias, g, self.epsilon)
        w = wf.astype(x.dtype)
        u = uf.astype(x.dtype)
        bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
        return x * w.reshape(bshape) + u.reshape(bshape)


class GroupNorm(nn.Module):
    """GroupNorm with fp32 statistics and native-dtype elementwise math
    (channels-last; consecutive channel grouping matches torch). Param paths
    stay `<name>/norm/{scale,bias}` for checkpoint-converter compatibility."""

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return _GroupNormCore(
            num_groups=self.num_groups, epsilon=self.epsilon, name="norm"
        )(x)


class QuantConv2D(nn.Module):
    """Drop-in for flax `nn.Conv` on (N, H, W, C) tensors with the opt-in
    int8 turbo routing of InflatedConv. Param tree, init streams, and the
    exact (non-quant) math are identical to nn.Conv — `kernel` (HWIO,
    lecun_normal) and `bias` (zeros) at the module's own path — so swapping
    call sites changes nothing for checkpoints or the bf16 parity path.
    Used by the VAE, whose full-res decode convs are the last MXU-heavy
    pass outside the UNet (reference decode: vsr/models/autoencoder_kl.py)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype
        )
        from lavie_tpu.nn.quant import int8_conv2d, quant_eligible

        dt = self.dtype or jnp.result_type(x, kernel)
        if not self.is_initializing() and quant_eligible(
            self.kernel_size, x.shape[-1], self.features, dt,
            path=_module_path(self),
        ):
            return int8_conv2d(x, kernel, bias, self.strides, self.padding, dt)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = jax.lax.conv_general_dilated(
            x,
            kernel,
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.reshape((1,) * (y.ndim - 1) + (-1,))


class InflatedConv(nn.Module):
    """Per-frame 2D convolution over (B, F, H, W, C) video tensors.

    All '3D' convs in the reference's base/interpolation stages are 2D convs
    applied per frame (reference: base/models/resnet.py:13-21); here the frame
    fold is a reshape and XLA batches the conv over B·F on the MXU.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        video = x.ndim == 5
        if video:
            x, f = fold_frames(x)
        # Opt-in int8 turbo path (nn/quant.py): init always runs the exact
        # nn.Conv below so the param tree is identical in every mode; at
        # apply time an eligible conv reads those same params and runs the
        # dynamic-quant int8 conv instead. OFF unless the caller opened a
        # conv_quant_scope — the parity path is bf16/fp32.
        from lavie_tpu.nn.quant import int8_conv2d, quant_eligible

        if (
            not self.is_initializing()
            and quant_eligible(
                self.kernel_size, x.shape[-1], self.features, x.dtype,
                path=_module_path(self),
            )
        ):
            p = self.variables["params"]["conv"]
            x = int8_conv2d(
                x,
                p["kernel"],
                p["bias"] if self.use_bias else None,
                self.strides,
                self.padding,
                x.dtype,
            )
            if video:
                x = unfold_frames(x, f)
            return x
        # NOTE: a "1×1 conv as token GEMM" fast path was tried here and
        # REVERTED: neutral in the VSR forward (996.2 vs 994.8 ms) but a
        # measured −11% on the TSR sample (63.1 vs 56.7 s) — the dot-layout
        # shortcut outputs forced relayouts at the conv-layout residual adds.
        # Keep 1×1 convs as convs; XLA's conv fusions handle them.
        x = nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        if video:
            x = unfold_frames(x, f)
        return x


class _TemporalConvGemm(nn.Module):
    """Frame-axis k-tap conv over (B, F, S, C) computed as one (C → k·O)
    GEMM plus shifted adds (see TemporalConv for why). Param tree is
    nn.Conv's 2D layout: kernel (k, 1, C, O), bias (O,)."""

    features: int
    kernel_frames: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_frames
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k, 1, cin, self.features),
            self.param_dtype,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), self.param_dtype)
        if x.ndim == 5:
            # true 3D conv route for (B, F, H, W, C) — same params, kernel
            # re-expanded to (k,1,1,C,O). Kept so the activation-size gate in
            # TemporalModule3D can pick conv vs GEMM per call WITHOUT the
            # param tree depending on activation shapes (init may use tiny
            # spatial sizes).
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel[:, :, None].astype(self.dtype),
                window_strides=(1, 1, 1),
                padding=((k // 2, k // 2), (0, 0), (0, 0)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            return y + bias.astype(y.dtype)
        # (k,1,C,O) → (C, k·O): one MXU-friendly wide GEMM. NOTE the k×-sized
        # intermediate: callers must not route huge activations here (the
        # VSR L0 level at k=5 would transiently need 6.7 GB — measured HBM
        # OOM; a per-tap GEMM variant avoided that but ran bandwidth-bound
        # at 660 GB/s, 2× slower than the true conv). TemporalModule3D gates
        # on the intermediate size (nn/temporal_module.py).
        wcat = jnp.transpose(kernel[:, 0], (1, 0, 2)).reshape(cin, k * self.features)
        y = x @ wcat.astype(x.dtype)  # (B, F, S, k·O)
        pad = k // 2
        out = None
        for j in range(k):
            yj = y[..., j * self.features : (j + 1) * self.features]
            shift = j - pad  # out[f] += y_j[f + shift]
            if shift > 0:
                yj = jnp.concatenate(
                    [yj[:, shift:], jnp.zeros_like(yj[:, :shift])], axis=1
                )
            elif shift < 0:
                yj = jnp.concatenate(
                    [jnp.zeros_like(yj[:, shift:]), yj[:, :shift]], axis=1
                )
            out = yj if out is None else out + yj
        return out + bias.astype(x.dtype)


class TemporalConv(nn.Module):
    """True 3D temporal convolution, kernel (k, 1, 1) over the frame axis —
    the VSR stage's only genuine 3D convs
    (reference: vsr/models/resnet.py:255, 271)."""

    features: int
    kernel_frames: int = 5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # (B, F, H, W, C): conv over (F, H, W) with kernel (k, 1, 1).
        # A (B, F, S, C) input uses the equivalent (k, 1) 2D conv — same
        # math (the spatial taps are 1×1), but when the conv sits between
        # token-shaped transformer ops the 2D form lets XLA keep one layout:
        # measured in the full VSR UNet the 5D form got a degenerate
        # T(2,128) layout at 27 TF/s (19.2 ms/L1-call) vs 6.2 ms standalone.
        # One module, one param layout (k,1,C,O), two routes by input rank:
        #   (B, F, S, C)   → GEMM-shift: one (C → k·O) GEMM + shifted adds.
        #     Matmul layouts are robust where XLA's conv layout assignment is
        #     not: in the full VSR UNet the conv form (5D or (k,1)-2D alike)
        #     gets a degenerate T(2,128) layout and runs at 22-27 TF/s
        #     (19.2 ms at L1) vs ~180 TF/s for the GEMM form.
        #   (B, F, H, W, C) → true (k,1,1) lax conv — streams, no k×-wide
        #     intermediate; right for the large L0 levels.
        # Callers choose by reshaping; the param tree never depends on the
        # activation shape.
        return _TemporalConvGemm(
            features=self.features, kernel_frames=self.kernel_frames,
            dtype=self.dtype, param_dtype=self.param_dtype, name="conv",
        )(x)


class TimestepEmbedding(nn.Module):
    """Sinusoidal projection + 2-layer MLP (diffusers TimestepEmbedding;
    reference: base/models/unet.py:153-156)."""

    sinusoid_dim: int
    embed_dim: int
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        t_emb = sinusoidal_timestep_embedding(
            timesteps,
            self.sinusoid_dim,
            flip_sin_to_cos=self.flip_sin_to_cos,
            downscale_freq_shift=self.freq_shift,
        ).astype(self.dtype)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        x = nn.Dense(self.embed_dim, dtype=self.dtype, param_dtype=self.param_dtype, name="linear_2")(x)
        return x
