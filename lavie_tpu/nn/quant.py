"""Opt-in int8 "turbo" convolution path.

The v5e MXU runs int8×int8→int32 at 2× its bf16 rate (394 vs 197 TOPS) and
an int8 activation read is half the HBM traffic of bf16. The VSR UNet's
spatial-resnet convs are measured at ~90% of bf16 peak (DESIGN.md round-3
floor table) — the only way past that floor without changing the model's
FLOPs is to change the multiply width. Measured in isolation on this chip a
requantizing 3×3-conv chain runs 1.55× faster than bf16 (DESIGN.md round-3
turbo record).

This is an ACCELERATION MODE, not the parity path: quantization changes
outputs, so it is off by default everywhere and the reference-parity
contract (BASELINE.md ≥35 dB PSNR) is stated for the bf16 path only.
The reference has no analog (pure fp16/fp32 CUDA); this is TPU-native
extra capability.

Scheme (standard symmetric dynamic PTQ):
  - weights: per-output-channel |w|∞/127 scales, quantized inside the jitted
    step (the extra pass over the weights is ~1 ms against an ~0.8 GB/fwd
    weight read the conv pays anyway);
  - activations: dynamic per-sample (per frame, since frames fold into the
    conv batch) |x|∞/127 scales — one fused abs-max read, no calibration
    data needed;
  - conv in int8 with int32 accumulation, dequantized by the rank-1 outer
    product of the two scale vectors, bias added in fp32.

The mode is a trace-time context (same pattern as the LAVIE_* kernel gates):
`with conv_quant_scope("int8"): ...` around a module body marks every
InflatedConv under it eligible; each conv applies its own size gate
(3×3 kernels with ≥128 channels on both sides — where the MXU time is).
"""

from __future__ import annotations

import contextlib
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

_MODE: str = "none"
_EXCLUDE: Tuple[str, ...] = ()

VALID_MODES = ("none", "int8")


def conv_quant_mode() -> str:
    return _MODE


@contextlib.contextmanager
def conv_quant_scope(mode: Optional[str], exclude: Sequence[str] = ()):
    """Trace-time scope: convs constructed/called under it may quantize.
    `None` or "none" leaves the bf16/fp32 path untouched.

    `exclude`: substring patterns matched against the conv's flax module
    path (e.g. "up_blocks", "resnets_0/conv1", "samplers") — a matching
    conv keeps the exact bf16/fp32 path even in int8 mode. This is the
    selective-quantization knob for the drift-vs-speed Pareto
    (tools/turbo_quality.py --exclude / --sweep): quantize only the layer
    classes whose drift contribution is cheap."""
    global _MODE, _EXCLUDE
    mode = mode or "none"
    if mode not in VALID_MODES:
        raise ValueError(f"unknown conv_quant mode {mode!r}; valid: {VALID_MODES}")
    prev, prev_ex = _MODE, _EXCLUDE
    _MODE = mode
    _EXCLUDE = tuple(exclude or ())
    try:
        yield
    finally:
        _MODE, _EXCLUDE = prev, prev_ex


# Channel threshold for the per-conv gate. Module-level so tests can lower
# it to exercise the int8 path on tiny configs.
MIN_CHANNELS = 128


def quant_eligible(
    kernel_size: Tuple[int, int], cin: int, cout: int, x_dtype,
    path: Optional[str] = None,
) -> bool:
    """Per-conv gate: only the MXU-heavy 3×3 convs with wide channels.
    conv_in/conv_out (4-7 channels) and 1×1 shortcuts stay exact.
    `path` (the conv's flax module path) is checked against the scope's
    exclude patterns — substring match keeps the conv exact."""
    return (
        _MODE == "int8"
        and tuple(kernel_size) == (3, 3)
        and min(cin, cout) >= MIN_CHANNELS
        and jnp.issubdtype(x_dtype, jnp.floating)
        and not (path and any(pat in path for pat in _EXCLUDE))
    )


def int8_conv2d(
    x: jnp.ndarray,  # (N, H, W, Cin) float
    kernel: jnp.ndarray,  # (kh, kw, Cin, Cout) float param
    bias: Optional[jnp.ndarray],  # (Cout,) float param or None
    strides: Tuple[int, int],
    padding: Union[str, Sequence[Tuple[int, int]]],
    out_dtype,
) -> jnp.ndarray:
    """Symmetric dynamic-quant NHWC conv: per-sample activation scales ×
    per-output-channel weight scales, int8×int8→int32 on the MXU."""
    xf = x.astype(jnp.float32)
    # per-sample (= per-frame after the batch fold) activation scale
    a_amax = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)
    a_scale = jnp.maximum(a_amax, 1e-12) / 127.0  # (N,1,1,1)
    xq = jnp.clip(jnp.round(xf / a_scale), -127.0, 127.0).astype(jnp.int8)

    wf = kernel.astype(jnp.float32)
    w_amax = jnp.max(jnp.abs(wf), axis=(0, 1, 2), keepdims=True)
    w_scale = jnp.maximum(w_amax, 1e-12) / 127.0  # (1,1,1,Cout)
    wq = jnp.clip(jnp.round(wf / w_scale), -127.0, 127.0).astype(jnp.int8)

    y = jax.lax.conv_general_dilated(
        xq,
        wq,
        window_strides=strides,
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = y.astype(jnp.float32) * (a_scale * w_scale[0, 0])  # (N,1,1,1)·(1,1,Cout)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(out_dtype)
