"""Flash-attention kernel tests (interpreter mode on CPU) against the XLA
reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lavie_tpu.kernels.attention import _xla_attention
from lavie_tpu.kernels.flash_attention import (
    _pick_block,
    flash_attention,
    flash_supported_shape,
)


class TestBlockSelection:
    def test_pick_block(self):
        # largest multiple-of-128 divisor ≤ target (divisor-aware: grid
        # overhead dominated the kernel with small power-of-two blocks)
        assert _pick_block(2560) == 640
        assert _pick_block(640) == 640
        assert _pick_block(1024) == 1024
        assert _pick_block(5120) == 1024
        assert _pick_block(2560, target=512) == 512
        assert _pick_block(100) == 0

    def test_supported_shapes(self):
        q128 = jnp.zeros((2, 2560, 8, 128))
        assert flash_supported_shape(q128, q128)
        # d=40 stays on XLA: at the production CFG-2 batch XLA's fused
        # attention regime wins (see flash_supported_shape docstring)
        q40 = jnp.zeros((2, 2560, 8, 40))
        assert not flash_supported_shape(q40, q40)
        q12 = jnp.zeros((2, 2560, 8, 12))
        assert not flash_supported_shape(q12, q12)  # sublane-unaligned d
        q77 = jnp.zeros((2, 77, 8, 128))
        assert not flash_supported_shape(q77, q77)  # short seq
        kx = jnp.zeros((2, 77, 8, 128))
        assert not flash_supported_shape(q128, kx)  # cross (unless padding)


class TestFlashMatchesXLA:
    @pytest.mark.parametrize("d", [40, 128])
    def test_matches_reference_fp32(self, d):
        rng = np.random.RandomState(0)
        b, s, h = 1, 512, 2
        q = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, s, h, d), jnp.float32)
        scale = d**-0.5
        ref = _xla_attention(q, k, v, None, scale)
        out = flash_attention(q, k, v, scale=scale, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)

    def test_matches_reference_bf16(self):
        rng = np.random.RandomState(1)
        b, s, h, d = 1, 512, 2, 64
        q = jnp.asarray(rng.randn(b, s, h, d), jnp.bfloat16)
        k = jnp.asarray(rng.randn(b, s, h, d), jnp.bfloat16)
        v = jnp.asarray(rng.randn(b, s, h, d), jnp.bfloat16)
        scale = d**-0.5
        ref = _xla_attention(q, k, v, None, scale)
        out = flash_attention(q, k, v, scale=scale, interpret=True)
        # bf16 tolerance
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.06
        )
        assert out.dtype == jnp.bfloat16


class TestCrossLengthFlash:
    def test_sparse_causal_kv_shape(self):
        """Sk = 2·Sq (sparse-causal) must match the XLA reference."""
        rng = np.random.RandomState(2)
        b, sq, h, d = 1, 512, 2, 40
        q = jnp.asarray(rng.randn(b, sq, h, d), jnp.float32)
        k = jnp.asarray(rng.randn(b, 2 * sq, h, d), jnp.float32)
        v = jnp.asarray(rng.randn(b, 2 * sq, h, d), jnp.float32)
        scale = d**-0.5
        ref = _xla_attention(q, k, v, None, scale)
        out = flash_attention(q, k, v, scale=scale, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5,
                                   rtol=1e-4)

    def test_allow_padding_gate(self):
        q = jnp.zeros((1, 2560, 8, 40))
        k = jnp.zeros((1, 5120, 8, 40))
        assert flash_supported_shape(q, k, allow_padding=True)
        assert not flash_supported_shape(q, k)  # strict gate: padding + Sq!=Sk
