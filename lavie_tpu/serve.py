"""Serving predictor — the in-process full-cascade entry.

Mirrors the reference's Cog/Replicate server surface
(reference: predict.py:45-340): load all three stages once in setup(), then
predict(prompt, ..., interpolation=?, super_resolution=?) per request. Unlike
the reference, stages chain through host arrays, not temp mp4 files.
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

import jax

from lavie_tpu.io.video import write_video
from lavie_tpu.pipelines import VideoCascadePipeline


class Predictor:
    """setup() once, predict() many times (reference: predict.py:45, 159)."""

    def __init__(self):
        self.pipeline: Optional[VideoCascadePipeline] = None

    def setup(
        self,
        ckpt_dir: Optional[str] = None,
        tiny: bool = False,
        seed: int = 0,
        conv_quant: str = "none",
        conv_quant_exclude: tuple = (),
    ) -> None:
        self.pipeline = VideoCascadePipeline.init_random(
            jax.random.PRNGKey(seed), tiny=tiny, conv_quant=conv_quant,
            conv_quant_exclude=tuple(conv_quant_exclude),
        )
        if ckpt_dir:
            self._load_checkpoints(ckpt_dir)

    def _load_checkpoints(self, ckpt_dir: str) -> None:
        from lavie_tpu.io.checkpoints import load_pipeline_params

        base_ckpt = os.path.join(ckpt_dir, "lavie_base.pt")
        tsr_ckpt = os.path.join(ckpt_dir, "lavie_interpolation.pt")
        vsr_ckpt = os.path.join(ckpt_dir, "lavie_vsr.pt")
        sd_path = os.path.join(ckpt_dir, "stable-diffusion-v1-4")
        p = self.pipeline
        if os.path.exists(base_ckpt):
            p.base.params = load_pipeline_params(p.base.params, base_ckpt, sd_path)
        if os.path.exists(tsr_ckpt):
            p.interpolation.params = load_pipeline_params(
                p.interpolation.params, tsr_ckpt, sd_path
            )
        if os.path.exists(vsr_ckpt):
            p.vsr.params = load_pipeline_params(
                p.vsr.params, vsr_ckpt,
                os.path.join(ckpt_dir, "stable-diffusion-x4-upscaler"),
            )

    def predict(
        self,
        prompt: str,
        output_path: Optional[str] = None,
        sample_method: str = "ddpm",
        width: int = 512,
        height: int = 320,
        video_length: int = 16,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        seed: Optional[int] = None,
        quality: int = 9,
        interpolation: bool = False,
        super_resolution: bool = False,
    ) -> str:
        """Returns the path of the written video (reference surface:
        predict.py:159-208's flag set)."""
        assert self.pipeline is not None, "call setup() first"
        out = self.pipeline(
            prompt,
            interpolation=interpolation,
            super_resolution=super_resolution,
            video_length=video_length,
            height=height,
            width=width,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            sample_method=sample_method,
            seed=seed if seed is not None else 0,
        )
        if output_path is None:
            output_path = os.path.join(tempfile.mkdtemp(), "out.mp4")
        fps = 24 if interpolation else 8
        return write_video(output_path, out.video, fps=fps, quality=quality)
