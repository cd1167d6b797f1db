"""Fused GN+SiLU+temporal-conv kernel (kernels/temporal_resblock.py) vs the
unfused ResnetBlock3DCNN composition, interpret mode (CPU-runnable)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lavie_tpu.kernels.temporal_resblock import (
    gn_silu_tconv,
    resblock_conv_supported,
)
from lavie_tpu.nn.layers import groupnorm_affine
from lavie_tpu.nn.resnet import ResnetBlock3DCNN


def test_kernel_matches_composition():
    b, f, s, c, k = 2, 4, 256, 256, 5
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (b, f, s, c))
    gamma = jax.random.normal(ks[1], (c,)) * 0.2 + 1.0
    beta = jax.random.normal(ks[2], (c,)) * 0.2
    wc = jax.random.normal(ks[3], (k, c, c)) * c**-0.5
    bias = jax.random.normal(ks[4], (b, c)) * 0.1

    wa, ua = groupnorm_affine(x, gamma, beta, 32, 1e-6)
    xn = jax.nn.silu(x * wa[:, None, None] + ua[:, None, None])
    pad = k // 2
    ref = jnp.zeros_like(x) + bias[:, None, None]
    for j in range(k):
        lo, hi = max(0, pad - j), min(f, f + pad - j)
        ref = ref.at[:, lo:hi].add(xn[:, lo + j - pad:hi + j - pad] @ wc[j])

    out = gn_silu_tconv(x, wa, ua, wc, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_kernel_residual_and_k3():
    b, f, s, c, k = 1, 8, 128, 128, 3
    ks = jax.random.split(jax.random.PRNGKey(1), 6)
    x = jax.random.normal(ks[0], (b, f, s, c))
    res = jax.random.normal(ks[5], (b, f, s, c))
    gamma = jnp.ones((c,))
    beta = jnp.zeros((c,))
    wc = jax.random.normal(ks[3], (k, c, c)) * c**-0.5
    bias = jnp.zeros((b, c))
    wa, ua = groupnorm_affine(x, gamma, beta, 32, 1e-6)
    xn = jax.nn.silu(x * wa[:, None, None] + ua[:, None, None])
    pad = k // 2
    ref = res + 0.0
    for j in range(k):
        lo, hi = max(0, pad - j), min(f, f + pad - j)
        ref = ref.at[:, lo:hi].add(xn[:, lo + j - pad:hi + j - pad] @ wc[j])
    out = gn_silu_tconv(x, wa, ua, wc, bias, residual=res, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("ndim", [4, 5])
@pytest.mark.parametrize("with_temb", [True, False])
def test_module_fused_matches_unfused(monkeypatch, ndim, with_temb):
    """Whole ResnetBlock3DCNN: Pallas-fused (interpret) vs XLA path."""
    b, f, c = 1, 4, 128
    shape = (b, f, 4, 64, c) if ndim == 5 else (b, f, 256, c)
    x = jax.random.normal(jax.random.PRNGKey(2), shape)
    temb = jax.random.normal(jax.random.PRNGKey(3), (b, 512)) if with_temb else None
    block = ResnetBlock3DCNN(
        in_channels=c, out_channels=c, kernel_frames=5,
        temb_channels=512 if with_temb else None, groups=32,
    )
    params = block.init(jax.random.PRNGKey(4), x, temb)

    monkeypatch.setenv("LAVIE_TRESBLOCK", "0")
    ref = block.apply(params, x, temb)
    monkeypatch.setenv("LAVIE_TRESBLOCK", "force")
    out = block.apply(params, x, temb)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_kernel_emit_stats_matches_direct_moments():
    b, f, s, c, k = 2, 4, 512, 128, 5
    ks = jax.random.split(jax.random.PRNGKey(9), 4)
    x = jax.random.normal(ks[0], (b, f, s, c))
    gamma = jax.random.normal(ks[1], (c,)) * 0.2 + 1.0
    beta = jax.random.normal(ks[2], (c,)) * 0.2
    wc = jax.random.normal(ks[3], (k, c, c)) * c**-0.5
    bias = jnp.zeros((b, c))
    wa, ua = groupnorm_affine(x, gamma, beta, 32, 1e-6)
    y, s1, s2 = gn_silu_tconv(
        x, wa, ua, wc, bias, emit_stats=True, interpret=True
    )
    y_ref = gn_silu_tconv(x, wa, ua, wc, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5, rtol=1e-5)
    yf = np.asarray(y, np.float64).reshape(b, -1, c)
    np.testing.assert_allclose(np.asarray(s1), yf.sum(axis=1), rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(s2), (yf**2).sum(axis=1), rtol=1e-4, atol=1e-2)


def test_kernel_activation_none_is_plain_conv():
    b, f, s, c = 1, 4, 256, 128
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    x = jax.random.normal(ks[0], (b, f, s, c))
    res = jax.random.normal(ks[1], (b, f, s, c))
    w = jax.random.normal(ks[2], (1, c, c)) * c**-0.5
    bias = jnp.full((b, c), 0.25)
    ref = res + x @ w[0] + 0.25
    out = gn_silu_tconv(
        x, None, None, w, bias, residual=res, activation="none", interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4)


def test_module_stats_path_matches(monkeypatch):
    """LAVIE_TRESBLOCK_STATS=1: norm2 affine from kernel-emitted moments."""
    b, f, c = 1, 4, 128
    x = jax.random.normal(jax.random.PRNGKey(10), (b, f, 256, c))
    block = ResnetBlock3DCNN(in_channels=c, out_channels=c, kernel_frames=5,
                             temb_channels=None, groups=32)
    params = block.init(jax.random.PRNGKey(11), x, None)
    monkeypatch.setenv("LAVIE_TRESBLOCK", "force")
    monkeypatch.delenv("LAVIE_TRESBLOCK_STATS", raising=False)
    ref = block.apply(params, x, None)
    monkeypatch.setenv("LAVIE_TRESBLOCK_STATS", "1")
    out = block.apply(params, x, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4)


def test_supported_gate():
    assert resblock_conv_supported(8, 40960, 512, 512, 5)
    assert resblock_conv_supported(8, 40960, 512, 512, 3, with_res=True)
    assert not resblock_conv_supported(8, 40960, 512, 520, 5)  # misaligned
    assert not resblock_conv_supported(8, 40961, 512, 512, 5)  # indivisible
    assert not resblock_conv_supported(64, 40960, 1024, 1024, 5)  # no fit


def test_sfc_kernel_matches_frame_major():
    """Token-major (B,S,F,C) kernel ≡ frame-major (B,F,S,C) kernel on the
    same data, incl. residual and emit_stats."""
    from lavie_tpu.kernels.temporal_resblock import gn_silu_tconv_sfc

    b, f, s, c, k = 2, 8, 256, 128, 5
    ks = jax.random.split(jax.random.PRNGKey(7), 6)
    x = jax.random.normal(ks[0], (b, f, s, c))
    res = jax.random.normal(ks[1], (b, f, s, c))
    gamma = jax.random.normal(ks[2], (c,)) * 0.2 + 1.0
    beta = jax.random.normal(ks[3], (c,)) * 0.2
    wc = jax.random.normal(ks[4], (k, c, c)) * c**-0.5
    bias = jax.random.normal(ks[5], (b, c)) * 0.1
    wa, ua = groupnorm_affine(x, gamma, beta, 32, 1e-6)

    ref, r1, r2 = gn_silu_tconv(
        x, wa, ua, wc, bias, residual=res, emit_stats=True, interpret=True
    )
    xs = jnp.transpose(x, (0, 2, 1, 3))  # (B, S, F, C)
    out, s1, s2 = gn_silu_tconv_sfc(
        xs, wa, ua, wc, bias, residual=jnp.transpose(res, (0, 2, 1, 3)),
        emit_stats=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(out, (0, 2, 1, 3))), np.asarray(ref),
        atol=1e-4, rtol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(s1), np.asarray(r1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(r2), rtol=1e-4)


def test_sfc_activation_none():
    from lavie_tpu.kernels.temporal_resblock import gn_silu_tconv_sfc

    b, f, s, c, k = 1, 4, 128, 128, 3
    ks = jax.random.split(jax.random.PRNGKey(9), 2)
    x = jax.random.normal(ks[0], (b, f, s, c))
    wc = jax.random.normal(ks[1], (k, c, c)) * c**-0.5
    bias = jnp.zeros((b, c))
    ref = gn_silu_tconv(x, None, None, wc, bias, activation="none", interpret=True)
    out = gn_silu_tconv_sfc(
        jnp.transpose(x, (0, 2, 1, 3)), None, None, wc, bias,
        activation="none", interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(out, (0, 2, 1, 3))), np.asarray(ref),
        atol=1e-5, rtol=1e-5,
    )


class TestSfcInt8Turbo:
    """int8 quant path of the token-major kernel (turbo mode)."""

    def _data(self, b=2, f=4, s=256, c=128, k=5, seed=21):
        ks = jax.random.split(jax.random.PRNGKey(seed), 6)
        x = jax.random.normal(ks[0], (b, s, f, c))  # token-major
        gamma = jax.random.normal(ks[1], (c,)) * 0.2 + 1.0
        beta = jax.random.normal(ks[2], (c,)) * 0.2
        wc = jax.random.normal(ks[3], (k, c, c)) * c**-0.5
        bias = jax.random.normal(ks[4], (b, c)) * 0.1
        res = jax.random.normal(ks[5], (b, s, f, c))
        wa, ua = groupnorm_affine(
            jnp.transpose(x, (0, 2, 1, 3)), gamma, beta, 32, 1e-6
        )
        return x, wa, ua, wc, bias, res

    def test_matches_explicit_quant_oracle(self):
        """Bit-level check vs the documented scheme: shared per-(batch,
        token-block) activation scale, per-output-channel weight scales,
        int32 tap accumulation. s == the picked block so the activation
        scale is per-batch and the oracle is closed-form."""
        from lavie_tpu.kernels.temporal_resblock import (
            _pick_block,
            gn_silu_tconv_sfc,
        )

        b, f, s, c, k = 2, 4, 256, 128, 5
        assert _pick_block(s, f, c, c, k, False, 4, "int8") == s
        x, wa, ua, wc, bias, _ = self._data(b, f, s, c, k)

        xn = jax.nn.silu(
            x.astype(jnp.float32) * wa[:, None, None] + ua[:, None, None]
        )
        a_scale = jnp.maximum(
            jnp.max(jnp.abs(xn), axis=(1, 2, 3), keepdims=True), 1e-12
        ) / 127.0  # (B,1,1,1): one block per batch
        xq = jnp.clip(jnp.round(xn / a_scale), -127, 127).astype(jnp.int8)
        w_scale = jnp.maximum(
            jnp.max(jnp.abs(wc), axis=(0, 1), keepdims=True), 1e-12
        ) / 127.0
        wq = jnp.clip(jnp.round(wc / w_scale), -127, 127).astype(jnp.int8)
        pad = k // 2
        ref = jnp.zeros((b, s, f, c), jnp.int32)
        for j in range(k):
            lo, hi = max(0, pad - j), min(f, f + pad - j)
            ref = ref.at[:, :, lo:hi].add(
                jax.lax.dot_general(
                    xq[:, :, lo + j - pad:hi + j - pad], wq[j],
                    (((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            )
        ref = (
            ref.astype(jnp.float32) * (a_scale * w_scale[0])
            + bias[:, None, None]
        )

        out = gn_silu_tconv_sfc(
            x, wa, ua, wc, bias, interpret=True, quant="int8"
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-4
        )

    def test_close_to_bf16_with_residual(self):
        """Quant error bound vs the exact kernel on gaussian data, incl.
        the fused residual (which must stay exact — added after dequant)."""
        from lavie_tpu.kernels.temporal_resblock import gn_silu_tconv_sfc

        x, wa, ua, wc, bias, res = self._data(k=3)
        exact = gn_silu_tconv_sfc(x, wa, ua, wc, bias, residual=res, interpret=True)
        got = gn_silu_tconv_sfc(
            x, wa, ua, wc, bias, residual=res, interpret=True, quant="int8"
        )
        err = np.linalg.norm(np.asarray(got - exact)) / np.linalg.norm(
            np.asarray(exact)
        )
        assert err < 0.02, err

    def test_module_quant_scope_routes_and_stays_close(self, monkeypatch):
        """ResnetBlock3DCNN under conv_quant_scope('int8'): 5D fused path
        quantizes (bounded drift), and the path is OFF outside the scope."""
        from lavie_tpu.nn import quant

        b, f, c = 1, 4, 128
        x = jax.random.normal(jax.random.PRNGKey(30), (b, f, 4, 64, c))
        block = ResnetBlock3DCNN(
            in_channels=c, out_channels=c, kernel_frames=5,
            temb_channels=None, groups=32,
        )
        params = block.init(jax.random.PRNGKey(31), x, None)
        monkeypatch.setenv("LAVIE_TRESBLOCK", "force")
        monkeypatch.setenv("LAVIE_TRESBLOCK_INT8", "1")  # measured-negative path, opt-in
        monkeypatch.setattr(quant, "MIN_CHANNELS", 128)
        ref = block.apply(params, x, None)
        with quant.conv_quant_scope("int8"):
            got = block.apply(params, x, None)
        diff = np.linalg.norm(np.asarray(got - ref)) / np.linalg.norm(np.asarray(ref))
        assert 0.0 < diff < 0.05, diff  # engaged (nonzero) and bounded
        again = block.apply(params, x, None)  # scope exited -> exact path
        np.testing.assert_array_equal(np.asarray(again), np.asarray(ref))
