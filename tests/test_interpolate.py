"""Interpolation (TSR) stage tests: spaced timesteps, copied-video
conditioning indices, and the tiny end-to-end pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lavie_tpu.core.config import CLIPTextConfig, SamplingConfig, UNetConfig, VAEConfig
from lavie_tpu.diffusion.samplers import spaced_timesteps
from lavie_tpu.pipelines.interpolate import (
    VideoInterpolationPipeline,
    copied_video_indices,
)


class TestSpacedTimesteps:
    def test_openai_fractional_striding(self):
        ts, pts = spaced_timesteps(50, 1000)
        assert len(ts) == 50
        assert ts[0] == 999 and ts[-1] == 0
        # frac stride 999/49 ≈ 20.387: second kept step is round(20.387) = 20,
        # third round(40.77) = 41
        kept = sorted(ts)
        assert kept[1] == 20 and kept[2] == 41
        # prev chain is ts shifted with -1 terminal
        assert pts[-1] == -1
        np.testing.assert_array_equal(pts[:-1], ts[1:])

    def test_small_counts(self):
        ts, pts = spaced_timesteps(4, 100)
        assert ts[0] == 99 and ts[-1] == 0 and pts[-1] == -1


class TestCopiedVideoIndices:
    def test_61_frame_pattern(self):
        idx = copied_video_indices(61)
        assert len(idx) == 61
        assert idx[0] == 0 and idx[-1] == 60
        assert np.all(idx % 4 == 0)
        assert np.all(np.diff(idx) >= 0)
        # each slot's conditioning source is the nearest every-4th frame above
        np.testing.assert_array_equal(idx, 4 * ((np.arange(61) + 1) // 4))

    def test_13_frame_pattern(self):
        idx = copied_video_indices(13)
        assert len(idx) == 13
        np.testing.assert_array_equal(idx, 4 * ((np.arange(13) + 1) // 4))


@pytest.fixture(scope="module")
def tiny_tsr():
    return VideoInterpolationPipeline.init_random(
        jax.random.PRNGKey(0),
        unet_config=UNetConfig.interpolation().tiny(),
        vae_config=VAEConfig.sd().tiny(),
        text_config=CLIPTextConfig.vit_l().tiny(),
        dtype=jnp.float32,
    )


class TestInterpolationPipeline:
    def test_output_contract(self, tiny_tsr):
        video_in = (np.random.RandomState(0).rand(4, 64, 64, 3) * 255).astype(np.uint8)
        out = tiny_tsr(video_in, "a horse", num_inference_steps=2, out_frames=13, seed=0)
        assert out.video.shape == (1, 13, 64, 64, 3)
        assert out.video.dtype == np.uint8

    def test_deterministic(self, tiny_tsr):
        video_in = (np.random.RandomState(1).rand(4, 64, 64, 3) * 255).astype(np.uint8)
        a = tiny_tsr(video_in, "x", num_inference_steps=2, out_frames=13, seed=3).video
        b = tiny_tsr(video_in, "x", num_inference_steps=2, out_frames=13, seed=3).video
        np.testing.assert_array_equal(a, b)

    def test_conditioning_affects_output(self, tiny_tsr):
        v1 = (np.random.RandomState(2).rand(4, 64, 64, 3) * 255).astype(np.uint8)
        v2 = (np.random.RandomState(3).rand(4, 64, 64, 3) * 255).astype(np.uint8)
        a = tiny_tsr(v1, "x", num_inference_steps=2, out_frames=13, seed=0).video
        b = tiny_tsr(v2, "x", num_inference_steps=2, out_frames=13, seed=0).video
        assert not np.array_equal(a, b)


class TestMaskGeneration:
    def test_tsr_mask(self):
        from lavie_tpu.utils.masks import mask_generation

        m = mask_generation("tsr", (2, 61))
        assert m.shape == (2, 61)
        np.testing.assert_array_equal(m[0, ::4], 0.0)  # every 4th kept
        assert m[0].sum() == 61 - 16

    def test_named_masks(self):
        from lavie_tpu.utils.masks import mask_generation

        assert mask_generation("first3", (1, 8))[0, :3].sum() == 0
        assert mask_generation("all", (1, 8)).sum() == 8
        m = mask_generation("onelast2", (1, 10))[0]
        assert m[:2].sum() == 0 and m[-2:].sum() == 0 and m[2:-2].sum() == 6
        m = mask_generation("random0.5", (1, 10))[0]
        assert m.sum() == 5
        m = mask_generation("interpolate", (1, 16))[0]
        np.testing.assert_array_equal(m[::4], 0.0)
        with pytest.raises(ValueError):
            mask_generation("bogus", (1, 4))


class TestMaskedInterpolation:
    def test_masked_path_runs(self):
        pipe = VideoInterpolationPipeline.init_random(
            jax.random.PRNGKey(0),
            unet_config=UNetConfig.interpolation(use_mask=True).tiny(),
            vae_config=VAEConfig.sd().tiny(),
            text_config=CLIPTextConfig.vit_l().tiny(),
            dtype=jnp.float32,
        )
        assert pipe.unet_config.in_channels == 9
        video_in = (np.random.RandomState(0).rand(4, 64, 64, 3) * 255).astype(np.uint8)
        out = pipe(video_in, "x", num_inference_steps=2, out_frames=13, seed=0,
                   mask_type="tsr")
        assert out.video.shape == (1, 13, 64, 64, 3)

    def test_mask_requires_9ch_unet(self, tiny_tsr):
        video_in = np.zeros((4, 64, 64, 3), np.uint8)
        with pytest.raises(AssertionError):
            tiny_tsr(video_in, "x", num_inference_steps=2, out_frames=13,
                     mask_type="tsr")


class TestPythonLoopModeTSR:
    def test_matches_scan(self, tiny_tsr):
        video_in = (np.random.RandomState(5).rand(4, 64, 64, 3) * 255).astype(np.uint8)
        ref = tiny_tsr(video_in, "x", num_inference_steps=2, out_frames=13, seed=2).video
        tiny_tsr.loop_mode = "python"
        try:
            out = tiny_tsr(video_in, "x", num_inference_steps=2, out_frames=13, seed=2).video
        finally:
            tiny_tsr.loop_mode = "scan"
        np.testing.assert_array_equal(out, ref)

    def test_hybrid_matches_python(self, tiny_tsr):
        """'hybrid' scans the denoise loop in K-step chunks (one compiled
        program re-dispatched); same step math as the python loop →
        bit-identical output. scan_chunk=2 over 5 steps exercises chunking
        incl. the ragged tail chunk."""
        video_in = (np.random.RandomState(6).rand(4, 64, 64, 3) * 255).astype(np.uint8)
        tiny_tsr.loop_mode = "python"
        try:
            ref = tiny_tsr(video_in, "x", num_inference_steps=5, out_frames=13, seed=8).video
            tiny_tsr.loop_mode = "hybrid"
            tiny_tsr.scan_chunk = 2
            out = tiny_tsr(video_in, "x", num_inference_steps=5, out_frames=13, seed=8).video
        finally:
            tiny_tsr.loop_mode = "scan"
            tiny_tsr.scan_chunk = 10
        np.testing.assert_array_equal(out, ref)


class TestDDPMSampleLoop:
    def test_ddpm_mode_runs_and_differs_from_ddim(self, tiny_tsr_factory=None):
        """use_ddim_sample_loop: False → ancestral p_sample (FIXED_LARGE) on
        the spaced chain (reference: interpolation/sample.py:124-126).
        Stepper parity vs the reference file is proven in
        test_ref_parity.py::TestOpenAIDiffusionParity; this exercises the
        pipeline wiring (per-step fold_in noise, scan + python loop modes)."""
        import dataclasses

        from lavie_tpu.core.config import (
            CLIPTextConfig,
            SamplingConfig,
            UNetConfig,
            VAEConfig,
        )
        from lavie_tpu.pipelines import VideoInterpolationPipeline

        def make(method):
            return VideoInterpolationPipeline.init_random(
                jax.random.PRNGKey(0),
                unet_config=UNetConfig.interpolation().tiny(),
                vae_config=VAEConfig.sd().tiny(),
                text_config=CLIPTextConfig.vit_l().tiny(),
                sampling=SamplingConfig(
                    video_length=9, num_inference_steps=2, guidance_scale=4.0,
                    sample_method=method, clip_sample=False,
                ),
            )

        video_in = (np.random.RandomState(0).rand(3, 64, 64, 3) * 255).astype(np.uint8)
        ddpm_pipe = make("ddpm")
        a = ddpm_pipe(video_in, "x", out_frames=9, seed=3).video
        b = ddpm_pipe(video_in, "x", out_frames=9, seed=3).video
        np.testing.assert_array_equal(a, b)  # deterministic under a seed

        ddim_pipe = make("ddim")
        c = ddim_pipe(video_in, "x", out_frames=9, seed=3).video
        assert a.shape == c.shape == (1, 9, 64, 64, 3)
        assert np.abs(a.astype(int) - c.astype(int)).max() > 0

        # python loop mode matches the scanned program
        ddpm_pipe.loop_mode = "python"
        try:
            d = ddpm_pipe(video_in, "x", out_frames=9, seed=3).video
        finally:
            ddpm_pipe.loop_mode = "scan"
        diff = np.abs(d.astype(int) - a.astype(int))
        assert diff.max() <= 2 and (diff > 0).mean() < 0.01
