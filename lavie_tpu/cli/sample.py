"""Base T2V sampling CLI.

Mirrors the reference surface (reference: base/pipelines/sample.py:95-100):
    python -m lavie_tpu.cli.sample --config configs/sample.yaml
with the same YAML keys (text_prompt, ckpt_path, image_size, video_length,
beta schedule, sample_method, num_sampling_steps, guidance_scale, seed,
output_folder; reference: base/configs/sample.yaml).

Extra keys:
  model_scale: "full" (default) | "tiny"  — tiny runs weight-free for smoke
  sd_path: directory with converted/torch SD weights (vae/text_encoder/unet)
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import jax.numpy as jnp

from lavie_tpu.core.config import (
    CLIPTextConfig,
    SamplingConfig,
    UNetConfig,
    VAEConfig,
    load_yaml_config,
)
from lavie_tpu.io.video import write_video
from lavie_tpu.pipelines import TextToVideoPipeline


def build_pipeline(cfg: dict) -> TextToVideoPipeline:
    scale = cfg.get("model_scale", "full")
    sampling = SamplingConfig(
        video_length=cfg.get("video_length", 16),
        height=cfg.get("image_size", [320, 512])[0],
        width=cfg.get("image_size", [320, 512])[1],
        num_inference_steps=cfg.get("num_sampling_steps", 50),
        guidance_scale=cfg.get("guidance_scale", 7.5),
        sample_method=cfg.get("sample_method", "ddpm"),
        beta_start=cfg.get("beta_start", 1e-4),
        beta_end=cfg.get("beta_end", 0.02),
        beta_schedule=cfg.get("beta_schedule", "linear"),
        fps=cfg.get("fps", 8),
        # diffusers-config-derived flags (SD-1.4 defaults; see SamplingConfig)
        clip_sample=cfg.get("clip_sample", True),
        set_alpha_to_one=cfg.get("set_alpha_to_one", False),
    )
    if scale == "tiny":
        unet_cfg = UNetConfig.base_t2v().tiny()
        vae_cfg = VAEConfig.sd().tiny()
        text_cfg = CLIPTextConfig.vit_l().tiny()
    else:
        unet_cfg = UNetConfig.base_t2v()
        vae_cfg = VAEConfig.sd()
        text_cfg = CLIPTextConfig.vit_l()
    # opt-in int8 turbo conv path (nn/quant.py) — NOT the parity path
    quant = str(cfg.get("conv_quant", "none"))
    # selective quantization: path patterns kept exact even in int8 mode
    # (the drift-vs-speed Pareto knob — DESIGN.md round-5; e.g. the VSR
    # promote config excludes "VAE,samplers,up_blocks")
    quant_exclude = tuple(
        p for p in str(cfg.get("conv_quant_exclude", "")).split(",") if p
    )
    if quant != "none":
        import dataclasses

        vae_quant = "none" if "VAE" in quant_exclude else quant
        ex = tuple(p for p in quant_exclude if p != "VAE")
        unet_cfg = dataclasses.replace(unet_cfg, conv_quant=quant,
                                       conv_quant_exclude=ex)
        vae_cfg = dataclasses.replace(vae_cfg, conv_quant=vae_quant,
                                      conv_quant_exclude=ex)

    ckpt_path = cfg.get("ckpt_path")
    if ckpt_path and os.path.exists(str(ckpt_path)):
        from lavie_tpu.io.checkpoints import load_pipeline_params

        pipe = TextToVideoPipeline.init_random(
            jax.random.PRNGKey(0), unet_cfg, vae_cfg, text_cfg, sampling
        )
        pipe.params = load_pipeline_params(
            pipe.params, ckpt_path, sd_path=cfg.get("pretrained_path")
        )
        return pipe
    print(
        "[lavie_tpu] no checkpoint found — running with random weights "
        "(structure/perf demo; outputs are noise)",
        file=sys.stderr,
    )
    with_image = bool(cfg.get("image_path") or cfg.get("image_paths"))
    return TextToVideoPipeline.init_random(
        jax.random.PRNGKey(cfg.get("seed") or 0), unet_cfg, vae_cfg, text_cfg, sampling,
        with_image_conditioning=with_image,
    )


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args(argv)
    cfg = load_yaml_config(args.config)

    pipeline = build_pipeline(cfg)
    out_dir = cfg.get("output_folder", "./res/base/")
    os.makedirs(out_dir, exist_ok=True)

    fps = cfg.get("fps", 8)
    # optional image conditioning (fork surface: sample.py zips text_prompt
    # with image_paths, reference: base/pipelines/sample.py:78-89)
    image_paths = cfg.get("image_paths") or [cfg.get("image_path")] * len(
        cfg.get("text_prompt", [])
    )
    for prompt, image_path in zip(cfg.get("text_prompt", []), image_paths):
        print(f"Processing the ({prompt}) prompt")
        image = None
        if image_path and os.path.exists(str(image_path)):
            from PIL import Image
            import numpy as np

            image = np.asarray(Image.open(image_path).convert("RGB"))
        out = pipeline(prompt, image=image, seed=cfg.get("seed"))
        path = os.path.join(out_dir, prompt.replace(" ", "_") + ".mp4")
        written = write_video(path, out.video[0], fps=fps)
        print(f"wrote {written}")


if __name__ == "__main__":
    main()
