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


class TestFlashCmajor:
    """Channel-major flash (transposed blocks — kernels described in
    _flash_cmajor_kernel) vs the XLA reference."""

    def _run(self, b, sq, sk, h, d, dtype, seed):
        from lavie_tpu.kernels.flash_attention import flash_cmajor

        rng = np.random.RandomState(seed)
        c = h * d
        q = jnp.asarray(rng.randn(b, c, sq), dtype)
        k = jnp.asarray(rng.randn(b, c, sk), dtype)
        v = jnp.asarray(rng.randn(b, c, sk), dtype)
        scale = d**-0.5
        out = flash_cmajor(q, k, v, heads=h, scale=scale, interpret=True)

        def rows(x):
            s = x.shape[2]
            return jnp.transpose(x, (0, 2, 1)).reshape(b, s, h, d)

        ref = _xla_attention(rows(q), rows(k), rows(v), None, scale)
        ref = jnp.transpose(ref.reshape(b, sq, c), (0, 2, 1))
        return out, ref

    @pytest.mark.parametrize("d", [40, 64])
    def test_matches_reference_fp32(self, d):
        out, ref = self._run(1, 256, 512, 2, d, jnp.float32, 3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-4)

    def test_matches_reference_bf16_multihead(self):
        out, ref = self._run(2, 256, 512, 8, 40, jnp.bfloat16, 4)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=0.06
        )
        assert out.dtype == jnp.bfloat16

    def test_supported_gate(self):
        from lavie_tpu.kernels.flash_attention import flash_cmajor_supported

        assert flash_cmajor_supported(8, 40, 2560, 5120)  # TSR L0
        assert flash_cmajor_supported(16, 40, 640, 1280)  # TSR L1
        assert not flash_cmajor_supported(8, 44, 2560, 5120)  # d not 8-aligned
        assert not flash_cmajor_supported(8, 40, 100, 200)  # untileable seq


class TestSparseCausalCmajorPath:
    def test_module_cmajor_matches_standard(self, monkeypatch):
        """SparseCausalAttention channel-major path (projections emit
        (BF, C, S), kv built on the channel-major layout, out-projection
        contracts the sublane dim) must match the standard path."""
        from lavie_tpu.nn.attention import SparseCausalAttention

        attn = SparseCausalAttention(query_dim=32, heads=2, head_dim=16)
        rng = np.random.RandomState(5)
        b, f, s, c = 1, 3, 128, 32
        x = jnp.asarray(rng.randn(b * f, s, c), jnp.float32)
        params = attn.init(jax.random.PRNGKey(0), x, f)

        std = attn.apply(params, x, f)

        # drive the cmajor path directly (the gate requires a TPU; the
        # kernel runs under interpret via monkeypatched flash_cmajor)
        import lavie_tpu.kernels.flash_attention as fa

        orig = fa.flash_cmajor
        orig_sparse = fa.flash_cmajor_sparse
        monkeypatch.setattr(
            fa, "flash_cmajor",
            lambda *a, **kw: orig(*a, **{**kw, "interpret": True}),
        )
        monkeypatch.setattr(
            fa, "flash_cmajor_sparse",
            lambda *a, **kw: orig_sparse(*a, **{**kw, "interpret": True}),
        )
        for hoist in ("1", "0"):  # copy-free kv path AND materialized path
            monkeypatch.setenv("LAVIE_SPARSE_HOIST", hoist)
            cm = attn.apply(params, x, f, method=SparseCausalAttention.cmajor)
            np.testing.assert_allclose(np.asarray(cm), np.asarray(std),
                                       atol=2e-5, rtol=1e-4)


class TestFlashCmajorSparse:
    """Copy-free sparse-causal kv (index-map synthesized concat) must be
    BIT-IDENTICAL to the materialized concat path — same block sequence,
    same online-softmax arithmetic."""

    @pytest.mark.parametrize("b,f,s,h,d", [
        (2, 3, 256, 2, 40),   # multi-video: exercises b - b % f row math
        (1, 5, 128, 8, 16),   # frame-0 self-kv edge (prev(0) = 0)
    ])
    def test_bit_identical_to_materialized(self, b, f, s, h, d, monkeypatch):
        from lavie_tpu.kernels.flash_attention import (
            flash_cmajor, flash_cmajor_sparse)

        # same kv block size on both paths — otherwise the materialized 2S
        # axis can pick a larger block than the per-frame S axis and the
        # online-softmax accumulation order (hence rounding) differs
        monkeypatch.setenv("LAVIE_FC_BLKK", "128")

        rng = np.random.RandomState(7)
        c = h * d
        bf = b * f
        mk = lambda: jnp.asarray(rng.randn(bf, c, s), jnp.float32)
        q, k, v = mk(), mk(), mk()

        def sparse_cm(x):
            x = x.reshape(b, f, c, s)
            anchor = jnp.broadcast_to(x[:, 0:1], x.shape)
            prev = jnp.concatenate([x[:, 0:1], x[:, :-1]], axis=1)
            return jnp.concatenate([anchor, prev], axis=3).reshape(bf, c, 2 * s)

        scale = d**-0.5
        ref = flash_cmajor(q, sparse_cm(k), sparse_cm(v), heads=h,
                           scale=scale, interpret=True)
        out = flash_cmajor_sparse(q, k, v, frames=f, heads=h, scale=scale,
                                  interpret=True)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
