"""Full three-stage cascade: base T2V → temporal interpolation → VSR.

The reference chains stages THROUGH THE FILESYSTEM (stage N writes mp4, stage
N+1 globs the folder; reference: interpolation/sample.py:233-235,
vsr/sample.py:59-61) — only the Cog server chains in-process
(reference: predict.py:227-277). Here the cascade streams arrays between
stages in host memory; each stage is its own compiled program.

Options mirror the README contract (reference: README.md:88-93):
  option1 = base only            (16f @ 320×512)
  option2 = base + interpolation (61f @ 320×512)
  option3 = base + vsr           (16f @ 1280×2048)
  option4 = all three            (61f @ 1280×2048)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import numpy as np

from lavie_tpu.core.config import CLIPTextConfig, SamplingConfig, UNetConfig, VAEConfig
from lavie_tpu.pipelines.interpolate import VideoInterpolationPipeline
from lavie_tpu.pipelines.t2v import TextToVideoPipeline
from lavie_tpu.pipelines.vsr import VideoSuperResolutionPipeline


@dataclasses.dataclass
class CascadeOutput:
    video: np.ndarray  # (F, H, W, 3) uint8
    base_video: Optional[np.ndarray] = None
    interpolated_video: Optional[np.ndarray] = None


class VideoCascadePipeline:
    def __init__(
        self,
        base: TextToVideoPipeline,
        interpolation: Optional[VideoInterpolationPipeline] = None,
        vsr: Optional[VideoSuperResolutionPipeline] = None,
        mesh: Optional[Any] = None,
    ):
        self.base = base
        self.interpolation = interpolation
        self.vsr = vsr
        if mesh is not None:
            self.set_mesh(mesh)

    def set_mesh(self, mesh) -> None:
        """Frame-shard all stages over the mesh (v5e-8 option-4 target)."""
        self.base.mesh = mesh
        if self.interpolation is not None:
            self.interpolation.mesh = mesh
        if self.vsr is not None:
            self.vsr.mesh = mesh

    @classmethod
    def init_random(
        cls,
        rng: jax.Array,
        tiny: bool = False,
        dtype: Any = None,
        conv_quant: str = "none",
        conv_quant_exclude: tuple = (),
    ) -> "VideoCascadePipeline":
        import dataclasses

        import jax.numpy as jnp

        dtype = dtype or jnp.bfloat16
        k1, k2, k3 = jax.random.split(rng, 3)
        _mk = (lambda c: c.tiny()) if tiny else (lambda c: c)
        # opt-in int8 turbo convs across all stages (nn/quant.py) — NOT the
        # parity path; one switch for the whole cascade. conv_quant_exclude
        # quantizes selectively ("VAE" keeps the codecs exact; other
        # patterns match conv module paths — DESIGN.md round-5 Pareto)
        ex = tuple(p for p in conv_quant_exclude if p != "VAE")
        def mk(c):
            c = _mk(c)
            if conv_quant != "none" and hasattr(c, "conv_quant"):
                q = ("none" if isinstance(c, VAEConfig)
                     and "VAE" in conv_quant_exclude else conv_quant)
                c = dataclasses.replace(c, conv_quant=q, conv_quant_exclude=ex)
            return c
        base = TextToVideoPipeline.init_random(
            k1,
            unet_config=mk(UNetConfig.base_t2v()),
            vae_config=mk(VAEConfig.sd()),
            text_config=mk(CLIPTextConfig.vit_l()),
            dtype=dtype,
        )
        interp = VideoInterpolationPipeline.init_random(
            k2,
            unet_config=mk(UNetConfig.interpolation()),
            vae_config=mk(VAEConfig.sd()),
            text_config=mk(CLIPTextConfig.vit_l()),
            dtype=dtype,
        )
        vsr = VideoSuperResolutionPipeline.init_random(
            k3,
            unet_config=mk(UNetConfig.vsr()),
            vae_config=mk(VAEConfig.vsr()),
            text_config=mk(CLIPTextConfig.open_clip_h()),
            dtype=dtype,
        )
        return cls(base, interp, vsr)

    def __call__(
        self,
        prompt: str,
        *,
        interpolation: bool = True,
        super_resolution: bool = True,
        video_length: int = 16,
        height: int = 320,
        width: int = 512,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        sample_method: str = "ddpm",
        interp_steps: int = 50,
        interp_guidance: float = 4.0,
        vsr_steps: int = 50,
        vsr_guidance: float = 5.0,
        noise_level: int = 50,
        seed: int = 0,
        quality_prompt_suffix: str = ", 4k.",
        keep_intermediates: bool = False,
    ) -> CascadeOutput:
        base_out = self.base(
            prompt,
            video_length=video_length,
            height=height,
            width=width,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            sample_method=sample_method,
            seed=seed,
        ).video[0]
        video = base_out

        interp_out = None
        if interpolation:
            assert self.interpolation is not None, "no interpolation pipeline loaded"
            # the reference appends a quality suffix to the TSR prompt
            # (reference: interpolation/sample.py:156-158)
            video = self.interpolation(
                video,
                prompt=prompt + quality_prompt_suffix,
                num_inference_steps=interp_steps,
                guidance_scale=interp_guidance,
                seed=seed,
            ).video[0]
            interp_out = video

        if super_resolution:
            assert self.vsr is not None, "no VSR pipeline loaded"
            video = self.vsr(
                video,
                prompt=prompt,
                num_inference_steps=vsr_steps,
                guidance_scale=vsr_guidance,
                noise_level=noise_level,
                seed=seed,
            ).video

        return CascadeOutput(
            video=video,
            base_video=base_out if keep_intermediates else None,
            interpolated_video=interp_out if keep_intermediates else None,
        )
