"""End-to-end pipeline tests on tiny configs (no pretrained weights —
structure, determinism, and contract checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lavie_tpu.core.config import CLIPTextConfig, SamplingConfig, UNetConfig, VAEConfig
from lavie_tpu.pipelines import TextToVideoPipeline


@pytest.fixture(scope="module")
def tiny_pipeline():
    return TextToVideoPipeline.init_random(
        jax.random.PRNGKey(0),
        unet_config=UNetConfig.base_t2v().tiny(),
        vae_config=VAEConfig.sd().tiny(),
        text_config=CLIPTextConfig.vit_l().tiny(),
        sampling=SamplingConfig(video_length=2, height=64, width=64, num_inference_steps=3),
        dtype=jnp.float32,
    )


class TestT2VPipeline:
    def test_output_contract(self, tiny_pipeline):
        out = tiny_pipeline("a cat", video_length=2, height=64, width=64,
                            num_inference_steps=2, seed=0)
        assert out.video.shape == (1, 2, 64, 64, 3)
        assert out.video.dtype == np.uint8

    def test_determinism_same_seed(self, tiny_pipeline):
        a = tiny_pipeline("a cat", num_inference_steps=2, seed=7).video
        b = tiny_pipeline("a cat", num_inference_steps=2, seed=7).video
        np.testing.assert_array_equal(a, b)

    def test_different_seed_differs(self, tiny_pipeline):
        a = tiny_pipeline("a cat", num_inference_steps=2, seed=1).video
        b = tiny_pipeline("a cat", num_inference_steps=2, seed=2).video
        assert not np.array_equal(a, b)

    def test_injected_latents_override_seed(self, tiny_pipeline):
        lat = np.random.RandomState(0).randn(1, 2, 8, 8, 4).astype(np.float32)
        a = tiny_pipeline("a cat", num_inference_steps=2, seed=1, latents=lat).video
        b = tiny_pipeline("a cat", num_inference_steps=2, seed=2, latents=lat).video
        # ddpm adds per-step noise keyed by seed; use ddim for a pure test
        c = tiny_pipeline("a cat", num_inference_steps=2, seed=1, latents=lat,
                          sample_method="ddim").video
        d = tiny_pipeline("a cat", num_inference_steps=2, seed=2, latents=lat,
                          sample_method="ddim").video
        np.testing.assert_array_equal(c, d)

    def test_all_sample_methods_run(self, tiny_pipeline):
        for method in ("ddpm", "ddim", "eulerdiscrete"):
            out = tiny_pipeline("x", num_inference_steps=2, sample_method=method, seed=0)
            assert out.video.shape == (1, 2, 64, 64, 3), method

    def test_guidance_changes_output(self, tiny_pipeline):
        a = tiny_pipeline("a cat", num_inference_steps=2, seed=0, guidance_scale=1.0,
                          sample_method="ddim").video
        b = tiny_pipeline("a cat", num_inference_steps=2, seed=0, guidance_scale=7.5,
                          sample_method="ddim").video
        assert not np.array_equal(a, b)


class TestTokenizer:
    def test_fallback_contract(self):
        from lavie_tpu.io.tokenizer import CLIPTokenizer

        tok = CLIPTokenizer()
        ids = tok(["a cat", "a dog playing piano"])
        assert ids.shape == (2, 77) and ids.dtype == np.int32
        assert ids[0, 0] == 49406  # BOS
        assert np.all(ids < 49408) and np.all(ids >= 0)
        # deterministic
        np.testing.assert_array_equal(ids, tok(["a cat", "a dog playing piano"]))

    def test_bpe_with_synthetic_vocab(self, tmp_path):
        """Exercise the real BPE path with a toy vocab/merges."""
        import json

        from lavie_tpu.io.tokenizer import CLIPTokenizer

        vocab = {tok: i for i, tok in enumerate(
            ["a</w>", "b</w>", "ab</w>", "c</w>", "a", "b", "c",
             "<|startoftext|>", "<|endoftext|>"]
        )}
        (tmp_path / "vocab.json").write_text(json.dumps(vocab))
        (tmp_path / "merges.txt").write_text("#version\na b</w>\n")
        tok = CLIPTokenizer(str(tmp_path / "vocab.json"), str(tmp_path / "merges.txt"),
                            max_length=8)
        ids = tok("ab c")
        # "ab" merges to the single token ab</w> (id 2); "c" → c</w> (id 3)
        assert ids[0, 0] == vocab["<|startoftext|>"]
        assert ids[0, 1] == vocab["ab</w>"]
        assert ids[0, 2] == vocab["c</w>"]
        assert ids[0, 3] == vocab["<|endoftext|>"]


class TestImageConditionedT2V:
    """The fork's image-conditioned pipeline variant
    (reference: base/pipelines/inference.py:67-629)."""

    @pytest.fixture(scope="class")
    def img_pipeline(self):
        return TextToVideoPipeline.init_random(
            jax.random.PRNGKey(0),
            unet_config=UNetConfig.base_t2v().tiny(),
            vae_config=VAEConfig.sd().tiny(),
            text_config=CLIPTextConfig.vit_l().tiny(),
            sampling=SamplingConfig(video_length=2, height=64, width=64,
                                    num_inference_steps=2),
            dtype=jnp.float32,
            with_image_conditioning=True,
        )

    def test_image_conditioning_changes_output(self, img_pipeline):
        rng = np.random.RandomState(0)
        img1 = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
        img2 = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
        a = img_pipeline("a cat", image=img1, num_inference_steps=2, seed=0,
                         sample_method="ddim").video
        b = img_pipeline("a cat", image=img2, num_inference_steps=2, seed=0,
                         sample_method="ddim").video
        c = img_pipeline("a cat", num_inference_steps=2, seed=0,
                         sample_method="ddim").video
        assert not np.array_equal(a, b)
        assert not np.array_equal(a, c)
        assert a.shape == c.shape

    def test_image_without_mapper_raises(self, tiny_pipeline):
        img = np.zeros((40, 40, 3), np.uint8)
        with pytest.raises(AssertionError):
            tiny_pipeline("x", image=img, num_inference_steps=2)


class TestPythonLoopMode:
    def test_matches_scan_mode(self, tiny_pipeline):
        """The step-level-jit loop must produce identical output to the
        scanned program (ddim, deterministic)."""
        ref = tiny_pipeline("a cat", num_inference_steps=3, seed=5,
                            sample_method="ddim").video
        tiny_pipeline.loop_mode = "python"
        try:
            out = tiny_pipeline("a cat", num_inference_steps=3, seed=5,
                                sample_method="ddim").video
            out_e = tiny_pipeline("a cat", num_inference_steps=2, seed=5,
                                  sample_method="eulerdiscrete").video
            out_d = tiny_pipeline("a cat", num_inference_steps=2, seed=5,
                                  sample_method="ddpm").video
        finally:
            tiny_pipeline.loop_mode = "scan"
        np.testing.assert_array_equal(out, ref)
        assert out_e.shape == ref.shape and out_d.shape == ref.shape

    def test_hybrid_matches_python(self, tiny_pipeline):
        """'hybrid' scans the denoise loop in K-step chunks (text encode and
        decode stay separate programs); the step math is shared with the
        python loop, so all three sampler methods must be bit-identical to
        it. scan_chunk=2 over 5 steps exercises chunking incl. the ragged
        tail chunk and the PRNG-key carry across chunks (ddpm)."""
        tiny_pipeline.loop_mode = "python"
        try:
            refs = {
                m: tiny_pipeline("a cat", num_inference_steps=5, seed=5,
                                 sample_method=m).video
                for m in ("ddim", "ddpm", "eulerdiscrete")
            }
            tiny_pipeline.loop_mode = "hybrid"
            tiny_pipeline.scan_chunk = 2
            outs = {
                m: tiny_pipeline("a cat", num_inference_steps=5, seed=5,
                                 sample_method=m).video
                for m in ("ddim", "ddpm", "eulerdiscrete")
            }
        finally:
            tiny_pipeline.loop_mode = "scan"
            tiny_pipeline.scan_chunk = 10
        for m in refs:
            np.testing.assert_array_equal(outs[m], refs[m], err_msg=m)
