"""VSR stage tests: the temporally-augmented upscaler UNet, temporal modules,
v-pred sampling, and the windowed pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lavie_tpu.core.config import CLIPTextConfig, UNetConfig, VAEConfig
from lavie_tpu.nn.temporal_module import TemporalModule3D
from lavie_tpu.nn.unet import UNet3D
from lavie_tpu.pipelines import VideoSuperResolutionPipeline


class TestTemporalModule:
    def test_noop_at_init(self):
        """Zero-init shift conv → the module is an identity at init,
        preserving the pretrained 2D upsampler behavior
        (reference: vsr/models/temporal_module.py:170-176)."""
        m = TemporalModule3D(channels=16, temb_channels=32, norm_num_groups=4)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 3, 8, 8, 16), jnp.float32)
        temb = jnp.ones((1, 32))
        params = m.init(jax.random.PRNGKey(0), x, temb)
        out = m.apply(params, x, temb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=0)

    def test_temporal_mixing_when_nonzero(self):
        """With a non-zero shift conv, a perturbation in frame j must reach
        frame j±2 (kernel (5,1,1) 3D conv actually mixes frames)."""
        m = TemporalModule3D(channels=16, temb_channels=32, norm_num_groups=4)
        x = np.zeros((1, 5, 4, 4, 16), np.float32)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.ones((1, 32)))
        params = jax.tree.map(lambda v: jnp.ones_like(v) * 0.01, params)
        base = np.asarray(m.apply(params, jnp.asarray(x), jnp.ones((1, 32))))
        x2 = x.copy()
        x2[:, 2] += 1.0
        out = np.asarray(m.apply(params, jnp.asarray(x2), jnp.ones((1, 32))))
        diff_frames = np.abs(out - base).sum(axis=(0, 2, 3, 4))
        assert diff_frames[0] > 0 and diff_frames[4] > 0  # reaches ±2 frames


class TestVSRUNet:
    def test_vsr_unet_tiny_forward(self):
        cfg = UNetConfig.vsr().tiny()
        assert cfg.in_channels == 7 and cfg.use_temporal_modules
        model = UNet3D(config=cfg)
        x = jnp.ones((1, 2, 16, 16, 7))
        ctx = jnp.ones((1, 7, cfg.cross_attention_dim))
        nl = jnp.array([50])
        params = model.init(jax.random.PRNGKey(0), x, jnp.array([10]), ctx, nl)
        out = model.apply(params, x, jnp.array([10]), ctx, nl)
        assert out.shape == (1, 2, 16, 16, 4)

    def test_noise_level_changes_output(self):
        cfg = UNetConfig.vsr().tiny()
        model = UNet3D(config=cfg)
        x = jnp.ones((1, 2, 16, 16, 7))
        ctx = jnp.ones((1, 7, cfg.cross_attention_dim))
        params = model.init(jax.random.PRNGKey(0), x, jnp.array([10]), ctx, jnp.array([50]))
        a = model.apply(params, x, jnp.array([10]), ctx, jnp.array([50]))
        b = model.apply(params, x, jnp.array([10]), ctx, jnp.array([300]))
        assert not np.array_equal(np.asarray(a), np.asarray(b))

    def test_prefix_sharing_matches_full_forward(self):
        # split-CFG prefix sharing: forward_prefix + __call__(prefix=...) must
        # reproduce the plain forward exactly (same ops, same order)
        cfg = UNetConfig.vsr().tiny()
        model = UNet3D(config=cfg)
        assert model.num_prefix_blocks == 1  # the full-res DownBlock3D
        rng = jax.random.PRNGKey(3)
        x = jax.random.normal(rng, (1, 2, 16, 16, 7))
        ctx = jax.random.normal(jax.random.PRNGKey(4), (1, 7, cfg.cross_attention_dim))
        t, nl = jnp.array([10]), jnp.array([50])
        params = model.init(jax.random.PRNGKey(0), x, t, ctx, nl)
        full = model.apply(params, x, t, ctx, nl)
        prefix = model.apply(params, x, t, nl, method=UNet3D.forward_prefix)
        shared = model.apply(params, x, t, ctx, nl, prefix=prefix)
        np.testing.assert_array_equal(np.asarray(full), np.asarray(shared))

    def test_base_unet_has_no_prefix(self):
        # base/TSR start with cross-attention blocks — nothing to share
        assert UNet3D(config=UNetConfig.base_t2v()).num_prefix_blocks == 0
        assert UNet3D(config=UNetConfig.interpolation()).num_prefix_blocks == 0

    def test_missing_class_labels_raises(self):
        cfg = UNetConfig.vsr().tiny()
        model = UNet3D(config=cfg)
        x = jnp.ones((1, 2, 16, 16, 7))
        ctx = jnp.ones((1, 7, cfg.cross_attention_dim))
        with pytest.raises(AssertionError):
            model.init(jax.random.PRNGKey(0), x, jnp.array([10]), ctx)


@pytest.fixture(scope="module")
def tiny_vsr():
    return VideoSuperResolutionPipeline.init_random(
        jax.random.PRNGKey(0),
        unet_config=UNetConfig.vsr().tiny(),
        vae_config=VAEConfig.vsr().tiny(),
        text_config=CLIPTextConfig.open_clip_h().tiny(),
        dtype=jnp.float32,
        window=4,
        decode_chunk=2,
    )


class TestVSRPipeline:
    def test_upscales_4x_with_windowing(self, tiny_vsr):
        video_in = (np.random.RandomState(0).rand(6, 32, 32, 3) * 255).astype(np.uint8)
        out = tiny_vsr(video_in, "a cat", num_inference_steps=2, seed=0)
        # 6 frames > window 4 → one full window + a natural-size 2-frame tail
        # program (serial execution compiles the tail at its own length
        # instead of padding — no wasted compute)
        assert out.video.shape == (6, 128, 128, 3)
        assert out.video.dtype == np.uint8
        # the tail really ran as a 2-frame program, not a padded 4-frame one
        assert any(k[1] == 2 for k in tiny_vsr._compiled)

    def test_batched_windows_pad_tail(self, tiny_vsr):
        """window_batch > 1 keeps the padded uniform-size batch (concurrent
        windows: the wall clock is the max over windows, so padding is free,
        while a ragged batch would break the single batched program)."""
        video_in = (np.random.RandomState(3).rand(6, 32, 32, 3) * 255).astype(np.uint8)
        old = tiny_vsr.window_batch
        tiny_vsr.window_batch = 2
        try:
            out = tiny_vsr(video_in, "a cat", num_inference_steps=2, seed=0)
        finally:
            tiny_vsr.window_batch = old
        assert out.video.shape == (6, 128, 128, 3)
        # both windows went through one batched (bsz=2, win=4) program
        assert any(k[0] == 2 and k[1] == 4 for k in tiny_vsr._compiled)

    def test_deterministic(self, tiny_vsr):
        video_in = (np.random.RandomState(1).rand(2, 32, 32, 3) * 255).astype(np.uint8)
        a = tiny_vsr(video_in, "x", num_inference_steps=2, seed=5).video
        b = tiny_vsr(video_in, "x", num_inference_steps=2, seed=5).video
        np.testing.assert_array_equal(a, b)


class TestPythonLoopModeVSR:
    def test_matches_scan(self, tiny_vsr):
        video_in = (np.random.RandomState(7).rand(2, 32, 32, 3) * 255).astype(np.uint8)
        ref = tiny_vsr(video_in, "x", num_inference_steps=2, seed=4).video
        tiny_vsr.loop_mode = "python"
        try:
            out = tiny_vsr(video_in, "x", num_inference_steps=2, seed=4).video
        finally:
            tiny_vsr.loop_mode = "scan"
        # different jit fusion boundaries (separate decode-chunk programs) can
        # flip LSB rounding on a handful of pixels
        diff = np.abs(out.astype(int) - ref.astype(int))
        assert diff.max() <= 2 and (diff > 0).mean() < 0.01

    def test_hybrid_matches_python(self, tiny_vsr):
        """'hybrid' scans the denoise loop in K-step chunks (one compiled
        program re-dispatched) but keeps prep and per-chunk decode as separate
        programs; the denoise math is the same fp32 stepper, so vs the python
        loop the output is bit-identical. scan_chunk=2 over 5 steps exercises
        chunking incl. the ragged tail chunk."""
        video_in = (np.random.RandomState(9).rand(2, 32, 32, 3) * 255).astype(np.uint8)
        tiny_vsr.loop_mode = "python"
        try:
            ref = tiny_vsr(video_in, "x", num_inference_steps=5, seed=11).video
            tiny_vsr.loop_mode = "hybrid"
            tiny_vsr.scan_chunk = 2
            out = tiny_vsr(video_in, "x", num_inference_steps=5, seed=11).video
        finally:
            tiny_vsr.loop_mode = "scan"
            tiny_vsr.scan_chunk = 10
        np.testing.assert_array_equal(out, ref)


class TestVSRWithVersatileAttention:
    def test_unet_with_attention_temporal_modules(self):
        """The stretch config: temporal modules with the versatile attention
        branch enabled (the reference schema's cross_frame '0_i-1_i' mode)."""
        import dataclasses

        cfg = dataclasses.replace(
            UNetConfig.vsr().tiny(),
            temporal_module_attention_types=("Temporal", "CrossFrame"),
        )
        model = UNet3D(config=cfg)
        x = jnp.ones((1, 2, 16, 16, 7))
        ctx = jnp.ones((1, 7, cfg.cross_attention_dim))
        nl = jnp.array([50])
        params = model.init(jax.random.PRNGKey(0), x, jnp.array([10]), ctx, nl)
        out = model.apply(params, x, jnp.array([10]), ctx, nl)
        assert out.shape == (1, 2, 16, 16, 4)


class TestLowResSchedule:
    """The conditioning noise schedule is NOT the sampler schedule: the
    reference noises the low-res frames with the pretrained pipeline's
    low_res_scheduler (scaled_linear-β DDPM shipped with the x4-upscaler,
    reference: vsr/models/pipeline_stable_diffusion_upscale_video_3d.py:631-634)
    while only the MAIN scheduler's β is overridden to linear
    (reference: vsr/sample.py:50-53)."""

    def test_default_low_res_schedule_is_scaled_linear(self):
        from lavie_tpu.diffusion.noise_aug import low_scale_schedule

        pipe = VideoSuperResolutionPipeline.init_random(
            jax.random.PRNGKey(0),
            unet_config=UNetConfig.vsr().tiny(),
            vae_config=VAEConfig.vsr().tiny(),
            text_config=CLIPTextConfig.open_clip_h().tiny(),
        )
        want = low_scale_schedule(pipe.sampling.num_train_timesteps)
        np.testing.assert_allclose(
            np.asarray(pipe.low_res_schedule.alphas_cumprod),
            np.asarray(want.alphas_cumprod),
        )
        # ...and it differs from the linear sampler schedule (the r1 bug)
        assert not np.allclose(
            np.asarray(pipe.low_res_schedule.alphas_cumprod),
            np.asarray(pipe.schedule.alphas_cumprod),
        )

    def test_scaled_linear_matches_diffusers_formula(self):
        from lavie_tpu.diffusion.noise_aug import low_scale_schedule

        sched = low_scale_schedule(1000)
        betas = np.linspace(1e-4**0.5, 2e-2**0.5, 1000, dtype=np.float64) ** 2
        ac = np.cumprod(1.0 - betas)
        np.testing.assert_allclose(
            np.asarray(sched.alphas_cumprod), ac, rtol=1e-5
        )


class TestWarpModule:
    def test_deform_conv_zero_offsets_equals_plain_conv(self):
        """With zero offsets and unit mask, modulated deformable conv is a
        plain 3×3 zero-padded conv — the core invariant of the gather-based
        rebuild of torchvision's op (reference: temporal_module.py:605-612)."""
        from lavie_tpu.nn.versatile_attention import deform_conv2d

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 6, 6, 5).astype(np.float32))
        w = jnp.asarray(rng.randn(4, 5, 3, 3).astype(np.float32))
        got = deform_conv2d(x, jnp.zeros((2, 6, 6, 18)), w, jnp.ones((2, 6, 6, 9)))
        want = jax.lax.conv_general_dilated(
            x, jnp.transpose(w, (2, 3, 1, 0)), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def test_deform_conv_integer_offset_is_shift(self):
        """An integer (+1, +1) offset on every tap samples the input shifted
        by one pixel — checks the (Δy, Δx) interleaved layout and bilinear
        corner handling."""
        from lavie_tpu.nn.versatile_attention import deform_conv2d

        rng = np.random.RandomState(1)
        x = np.zeros((1, 6, 6, 3), np.float32)
        x[:, 1:, 1:] = rng.randn(1, 5, 5, 3)
        w = jnp.asarray(rng.randn(2, 3, 3, 3).astype(np.float32))
        off = jnp.ones((1, 6, 6, 18))
        got = deform_conv2d(jnp.asarray(x), off, w, jnp.ones((1, 6, 6, 9)))
        # same as plain conv of the (+1,+1)-shifted input
        shifted = np.zeros_like(x)
        shifted[:, :-1, :-1] = x[:, 1:, 1:]
        want = jax.lax.conv_general_dilated(
            jnp.asarray(shifted), jnp.transpose(w, (2, 3, 1, 0)), (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        # interior matches exactly; the border rows sample across the shift
        # boundary where plain conv sees zeros
        np.testing.assert_allclose(
            np.asarray(got)[:, :4, :4], np.asarray(want)[:, :4, :4], atol=1e-4
        )

    @pytest.mark.parametrize("use_dcn", [True, False])
    def test_warp_module_paths_run(self, use_dcn):
        from lavie_tpu.nn.versatile_attention import WarpModule

        m = WarpModule(in_channels=8, use_deformable_conv=use_dcn)
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
        off = jnp.asarray(rng.randn(2, 16, 8).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x, off)["params"]
        out = m.apply({"params": params}, x, off)
        assert out.shape == x.shape
        if use_dcn:
            # alpha is zero-init → DCN path is an exact no-op at init
            np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)
            assert params["dcn_weight"].shape == (8, 8, 3, 3)

    def test_unet_with_dcn_temporal_modules_runs(self):
        cfg = UNetConfig.vsr().tiny(
            norm_num_groups=8,
            temporal_module_attention_types=("Temporal", "CrossFrame"),
            temporal_module_use_dcn_warpping=True,
            temporal_module_use_deformable_conv=True,
        )
        model = UNet3D(config=cfg)
        x = jnp.zeros((1, 2, 16, 16, 7))
        ctx = jnp.zeros((1, 7, cfg.cross_attention_dim))
        t = jnp.array([1])
        cl = jnp.array([5])
        params = model.init(jax.random.PRNGKey(0), x, t, ctx, cl)["params"]
        out = model.apply({"params": params}, x, t, ctx, cl)
        assert out.shape == (1, 2, 16, 16, 4)
