"""int8 turbo conv path (nn/quant.py).

The quant path is an opt-in acceleration mode, NOT the parity path: these
tests pin (a) that it is numerically close to the exact conv (symmetric
8-bit dynamic quant error bounds), (b) that it is OFF by default and changes
nothing when off, (c) that the param tree is identical in both modes so one
checkpoint serves both, and (d) that a full UNet forward under
conv_quant="int8" runs and stays close to the bf16 forward.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lavie_tpu.core.config import UNetConfig
from lavie_tpu.nn import quant
from lavie_tpu.nn.layers import InflatedConv
from lavie_tpu.nn.quant import conv_quant_scope, int8_conv2d, quant_eligible


def _rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


class TestInt8Conv2D:
    def test_close_to_exact(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        x = jax.random.normal(k1, (4, 8, 8, 128), jnp.float32)
        w = jax.random.normal(k2, (3, 3, 128, 128), jnp.float32) * 0.05
        b = jnp.linspace(-0.5, 0.5, 128, dtype=jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        got = int8_conv2d(x, w, b, (1, 1), "SAME", jnp.float32)
        # symmetric 8-bit dynamic quant on gaussian data: ~1-2% relative
        assert _rel_err(got, ref) < 0.05

    def test_per_channel_weight_scale(self):
        # one output channel with 100× larger weights must not wash out the
        # quantization grid of the others (per-channel scales)
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        x = jax.random.normal(k1, (2, 6, 6, 128), jnp.float32)
        w = jax.random.normal(k2, (3, 3, 128, 128), jnp.float32) * 0.05
        w = w.at[..., 0].multiply(100.0)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        got = int8_conv2d(x, w, None, (1, 1), "SAME", jnp.float32)
        assert _rel_err(got[..., 1:], ref[..., 1:]) < 0.05

    def test_per_sample_activation_scale(self):
        # sample 0 scaled 50× must not coarsen sample 1's grid
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        x = jax.random.normal(k1, (2, 6, 6, 128), jnp.float32)
        x = x.at[0].multiply(50.0)
        w = jax.random.normal(k2, (3, 3, 128, 128), jnp.float32) * 0.05
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        got = int8_conv2d(x, w, None, (1, 1), "SAME", jnp.float32)
        assert _rel_err(got[1], ref[1]) < 0.05

    def test_strided_explicit_padding(self):
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        x = jax.random.normal(k1, (2, 8, 8, 128), jnp.float32)
        w = jax.random.normal(k2, (3, 3, 128, 128), jnp.float32) * 0.05
        pad = ((1, 1), (1, 1))
        ref = jax.lax.conv_general_dilated(
            x, w, (2, 2), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        got = int8_conv2d(x, w, None, (2, 2), pad, jnp.float32)
        assert got.shape == ref.shape
        assert _rel_err(got, ref) < 0.05


class TestGates:
    def test_off_by_default(self):
        assert quant.conv_quant_mode() == "none"
        assert not quant_eligible((3, 3), 256, 256, jnp.bfloat16)

    def test_scope_and_eligibility(self):
        with conv_quant_scope("int8"):
            assert quant_eligible((3, 3), 128, 128, jnp.bfloat16)
            assert not quant_eligible((1, 1), 256, 256, jnp.bfloat16)  # 1x1 exact
            assert not quant_eligible((3, 3), 64, 256, jnp.bfloat16)  # narrow
            assert not quant_eligible((3, 3), 256, 256, jnp.int32)  # non-float
        assert quant.conv_quant_mode() == "none"

    def test_exclude_patterns(self):
        # selective quantization: a path matching any exclude pattern stays
        # exact; non-matching (or pathless) convs still quantize
        with conv_quant_scope("int8", exclude=("up_blocks", "resnets_0/conv1")):
            assert quant_eligible((3, 3), 128, 128, jnp.bfloat16)  # no path
            assert quant_eligible(
                (3, 3), 128, 128, jnp.bfloat16,
                path="down_blocks_0/resnets_1/conv2/conv")
            assert not quant_eligible(
                (3, 3), 128, 128, jnp.bfloat16,
                path="up_blocks_2/resnets_1/conv2/conv")
            assert not quant_eligible(
                (3, 3), 128, 128, jnp.bfloat16,
                path="down_blocks_0/resnets_0/conv1/conv")
        # scope restores the empty exclude list
        with conv_quant_scope("int8"):
            assert quant_eligible(
                (3, 3), 128, 128, jnp.bfloat16,
                path="up_blocks_2/resnets_1/conv2/conv")

    def test_exclude_reproduces_exact_path(self, monkeypatch):
        # a conv whose module path matches an exclude pattern must run the
        # EXACT conv (bit-identical), not the quantized one
        import flax.linen as nn

        monkeypatch.setattr(quant, "MIN_CHANNELS", 8)

        class Wrap(nn.Module):
            @nn.compact
            def __call__(self, x):
                return InflatedConv(32, (3, 3), dtype=jnp.float32,
                                    name="myconv")(x)

        mod = Wrap()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 6, 6, 32))
        params = mod.init(jax.random.PRNGKey(1), x)
        y_exact = mod.apply(params, x)
        with conv_quant_scope("int8"):
            y_q = mod.apply(params, x)
        with conv_quant_scope("int8", exclude=("myconv",)):
            y_ex = mod.apply(params, x)
        assert not np.allclose(np.asarray(y_q), np.asarray(y_exact))
        assert np.array_equal(np.asarray(y_ex), np.asarray(y_exact))

    def test_bad_mode_raises(self):
        with pytest.raises(ValueError):
            with conv_quant_scope("fp4"):
                pass

    def test_scope_restores_on_error(self):
        with pytest.raises(RuntimeError):
            with conv_quant_scope("int8"):
                raise RuntimeError("boom")
        assert quant.conv_quant_mode() == "none"


class TestInflatedConvQuant:
    def test_param_tree_identical_and_default_unchanged(self):
        mod = InflatedConv(128, (3, 3), dtype=jnp.float32)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 6, 6, 128))
        params = mod.init(jax.random.PRNGKey(1), x)
        y0 = mod.apply(params, x)
        with conv_quant_scope("int8"):
            params_q = mod.init(jax.random.PRNGKey(1), x)
            yq = mod.apply(params_q, x)
        assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_q)
        assert np.allclose(params["params"]["conv"]["kernel"],
                           params_q["params"]["conv"]["kernel"])
        # quant output close to, but not identical with, the exact conv
        assert _rel_err(yq, y0) < 0.05
        assert not np.allclose(np.asarray(yq), np.asarray(y0))

    def test_unet_forward_int8(self, monkeypatch):
        # tiny UNet: lower the channel gate so the int8 path actually runs
        monkeypatch.setattr(quant, "MIN_CHANNELS", 16)
        cfg = UNetConfig(
            block_out_channels=(16, 32),
            down_block_types=("CrossAttnDownBlock3D", "DownBlock3D"),
            up_block_types=("UpBlock3D", "CrossAttnUpBlock3D"),
            layers_per_block=1,
            cross_attention_dim=32,
            num_attention_heads=2,
            norm_num_groups=8,
            rope_dim=8,
        )
        from lavie_tpu.nn.unet import UNet3D

        x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 4))
        t = jnp.array([3], jnp.int32)
        ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 32))

        m0 = UNet3D(config=cfg, dtype=jnp.float32)
        params = m0.init(jax.random.PRNGKey(2), x, t, ctx)
        y0 = m0.apply(params, x, t, ctx)

        mq = UNet3D(config=dataclasses.replace(cfg, conv_quant="int8"),
                    dtype=jnp.float32)
        yq = mq.apply(params, x, t, ctx)

        assert yq.shape == y0.shape
        assert np.isfinite(np.asarray(yq)).all()
        # random-init nets amplify quant noise through GN; just bound it
        assert _rel_err(yq, y0) < 0.35
        assert not np.allclose(np.asarray(yq), np.asarray(y0))


class TestVAEQuant:
    """Opt-in int8 turbo in the VAE codec (QuantConv2D call sites)."""

    def _vae(self, conv_quant="none"):
        from lavie_tpu.core.config import VAEConfig
        from lavie_tpu.nn.vae import AutoencoderKL

        cfg = dataclasses.replace(VAEConfig.vsr().tiny(), conv_quant=conv_quant)
        return AutoencoderKL(config=cfg, dtype=jnp.float32)

    def test_param_tree_identical_and_off_by_default(self, monkeypatch):
        monkeypatch.setattr(quant, "MIN_CHANNELS", 16)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
        exact = self._vae("none")
        turbo = self._vae("int8")
        p1 = exact.init(jax.random.PRNGKey(1), z, method=exact.decode)
        p2 = turbo.init(jax.random.PRNGKey(1), z, method=turbo.decode)
        assert jax.tree.all(
            jax.tree.map(lambda a, b: a.shape == b.shape and bool(jnp.all(a == b)), p1, p2)
        )
        # same params through the exact model twice: deterministic
        y1 = exact.apply(p1, z, method=exact.decode)
        y2 = exact.apply(p2, z, method=exact.decode)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))

    def test_turbo_decode_bounded_drift(self, monkeypatch):
        monkeypatch.setattr(quant, "MIN_CHANNELS", 16)
        z = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 4))
        exact = self._vae("none")
        turbo = self._vae("int8")
        p = exact.init(jax.random.PRNGKey(3), z, method=exact.decode)
        ref = exact.apply(p, z, method=exact.decode)
        got = turbo.apply(p, z, method=turbo.decode)
        err = _rel_err(got, ref)
        assert 0.0 < err < 0.2, err  # engaged and bounded (deep conv chain)

    def test_two_phase_decode_consistent_under_quant(self, monkeypatch):
        """decode_up(decode_mid(z)) ≡ decode(z) must hold in turbo mode too
        (the scope wraps each phase identically)."""
        monkeypatch.setattr(quant, "MIN_CHANNELS", 16)
        z = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 4))
        turbo = self._vae("int8")
        p = turbo.init(jax.random.PRNGKey(5), z, method=turbo.decode)
        whole = turbo.apply(p, z, method=turbo.decode)
        mid = turbo.apply(p, z, method=turbo.decode_mid)
        up = turbo.apply(p, mid, method=turbo.decode_up)
        np.testing.assert_allclose(np.asarray(up), np.asarray(whole), atol=1e-5, rtol=1e-5)
