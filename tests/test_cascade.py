"""Full-cascade test on tiny configs: option-4 chain shape contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lavie_tpu.pipelines import VideoCascadePipeline


@pytest.fixture(scope="module")
def tiny_cascade():
    return VideoCascadePipeline.init_random(
        jax.random.PRNGKey(0), tiny=True, dtype=jnp.float32
    )


class TestCascade:
    def test_option4_chain(self, tiny_cascade):
        out = tiny_cascade(
            "a cat",
            video_length=2,
            height=64,
            width=64,
            num_inference_steps=2,
            interp_steps=2,
            vsr_steps=2,
            seed=0,
            keep_intermediates=True,
        )
        assert out.base_video.shape == (2, 64, 64, 3)
        assert out.interpolated_video.shape == (61, 64, 64, 3)
        assert out.video.shape == (61, 256, 256, 3)  # tiny VSR VAE is still f4
        assert out.video.dtype == np.uint8

    def test_option1_base_only(self, tiny_cascade):
        out = tiny_cascade(
            "a cat", interpolation=False, super_resolution=False,
            video_length=2, height=64, width=64, num_inference_steps=2, seed=0,
        )
        assert out.video.shape == (2, 64, 64, 3)


class TestPredictor:
    def test_serve_predictor_surface(self, tmp_path):
        """The Cog-equivalent serving entry (reference: predict.py:45-340)."""
        import jax.numpy as jnp

        from lavie_tpu.serve import Predictor

        p = Predictor()
        p.setup(tiny=True)
        # cast all stage pipelines to fp32 already default bf16 on CPU is fine
        out_path = p.predict(
            "a cat", output_path=str(tmp_path / "out.mp4"),
            video_length=2, height=64, width=64, num_inference_steps=2,
            sample_method="ddim", seed=1,
        )
        import os

        assert os.path.exists(out_path)
        from lavie_tpu.io.video import read_video

        assert read_video(out_path).shape == (2, 64, 64, 3)
