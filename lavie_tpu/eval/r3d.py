"""R3D-18 (torchvision VideoResNet) in flax — the FVD feature extractor.

The reference computes FVD over the penultimate (512-d, global-avg-pooled)
features of torchvision's pretrained `r3d_18` with the classifier head
stripped (reference: base/pipelines/fine_tuning.py:791-795,
ucf.py:159-170). This is that architecture natively: stem (3,7,7) conv →
four 2-block BasicBlock stages (64/128/256/512, stride-2 from stage 2) →
global average pool; all convs (3,3,3)/bias-free, BatchNorm in inference
mode (running statistics are parameters, converted from the checkpoint).

Param paths mirror torchvision's state-dict keys exactly
(`stem.0.weight`, `layer2.0.conv1.0.weight`, `layer2.0.downsample.1.running_var`,
…) so `convert_r3d18` is the generic string-map conversion; the layout is
locked by tests/test_torch_parity.py against a plain-torch.nn re-creation of
torchvision's module tree.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


class BatchNormInference(nn.Module):
    """BatchNorm with running statistics as converted parameters (the FVD
    extractor only ever runs in eval mode)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.ones, (self.features,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param(
            "running_mean", nn.initializers.zeros, (self.features,), jnp.float32
        )
        var = self.param(
            "running_var", nn.initializers.ones, (self.features,), jnp.float32
        )
        inv = jax.lax.rsqrt(var + self.eps)
        return (x - mean) * inv * w + b


class BasicBlock3D(nn.Module):
    """torchvision VideoResNet BasicBlock: conv-bn-relu → conv-bn, residual
    (1×1×1 conv-bn downsample when shape changes), relu."""

    in_channels: int
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = (self.stride,) * 3
        residual = x
        h = nn.Conv(
            self.out_channels, (3, 3, 3), strides=s, use_bias=False,
            padding=((1, 1), (1, 1), (1, 1)), name="conv1_0",
        )(x)
        h = BatchNormInference(self.out_channels, name="conv1_1")(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.out_channels, (3, 3, 3), use_bias=False,
            padding=((1, 1), (1, 1), (1, 1)), name="conv2_0",
        )(h)
        h = BatchNormInference(self.out_channels, name="conv2_1")(h)
        if self.stride != 1 or self.in_channels != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1, 1), strides=s, use_bias=False,
                name="downsample_0",
            )(x)
            residual = BatchNormInference(self.out_channels, name="downsample_1")(residual)
        return nn.relu(h + residual)


class R3D18(nn.Module):
    """(B, F, H, W, 3) channels-last video → (B, 512) penultimate features
    (or (B, num_classes) logits with `features_only=False`)."""

    num_classes: int = 400
    features_only: bool = True
    widths: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w0 = self.widths[0]
        x = nn.Conv(
            w0, (3, 7, 7), strides=(1, 2, 2), use_bias=False,
            padding=((1, 1), (3, 3), (3, 3)), name="stem_0",
        )(x)
        x = BatchNormInference(w0, name="stem_1")(x)
        x = nn.relu(x)
        cin = w0
        for i, w in enumerate(self.widths):
            stride = 1 if i == 0 else 2
            x = BasicBlock3D(cin, w, stride, name=f"layer{i + 1}_0")(x)
            x = BasicBlock3D(w, w, 1, name=f"layer{i + 1}_1")(x)
            cin = w
        x = jnp.mean(x, axis=(1, 2, 3))  # adaptive avg pool to (1,1,1)
        if self.features_only:
            return x
        return nn.Dense(self.num_classes, name="fc")(x)


def convert_r3d18(
    init_params: Mapping[str, Any], state_dict: Mapping[str, np.ndarray]
) -> Dict[str, Any]:
    """torchvision r3d_18 state dict → R3D18 params. The generic converter
    handles everything (param paths mirror the torch keys; running stats are
    raw-named leaves); num_batches_tracked buffers are ignored."""
    from lavie_tpu.io.convert import convert_state_dict

    sd = {k: v for k, v in state_dict.items() if not k.endswith("num_batches_tracked")}
    return convert_state_dict(init_params, sd, strict_unused=False)
