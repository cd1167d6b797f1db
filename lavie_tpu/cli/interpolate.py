"""Temporal interpolation CLI (reference surface: interpolation/sample.py:303-307
with interpolation/configs/sample.yaml's `args:` block).

    python -m lavie_tpu.cli.interpolate --config configs/interpolation.yaml

Reads every video in input_path, interpolates 16 → 61 frames, writes at fps 24.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import jax

from lavie_tpu.core.config import (
    CLIPTextConfig,
    SamplingConfig,
    UNetConfig,
    VAEConfig,
    load_yaml_config,
)
from lavie_tpu.io.video import read_video, write_video
from lavie_tpu.pipelines import VideoInterpolationPipeline


def build_pipeline(cfg: dict) -> VideoInterpolationPipeline:
    scale = cfg.get("model_scale", "full")
    tiny = scale == "tiny"
    mk = (lambda c: c.tiny()) if tiny else (lambda c: c)
    use_mask = bool(cfg.get("mask_type")) or cfg.get("use_mask", False)
    unet_cfg = mk(UNetConfig.interpolation(use_mask=use_mask))
    vae_cfg = mk(VAEConfig.sd())
    text_cfg = mk(CLIPTextConfig.vit_l())
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
    sampling = SamplingConfig(
        video_length=cfg.get("num_frames", 61),
        num_inference_steps=cfg.get("num_sampling_steps", 50),
        guidance_scale=cfg.get("guidance_scale", 4.0),
        # reference key: use_ddim_sample_loop False -> p_sample_loop (DDPM
        # FIXED_LARGE on the spaced chain, interpolation/sample.py:118-126)
        sample_method="ddim" if cfg.get("use_ddim_sample_loop", True) else "ddpm",
    )
    pipe = VideoInterpolationPipeline.init_random(
        jax.random.PRNGKey(cfg.get("seed") or 0),
        unet_config=unet_cfg, vae_config=vae_cfg, text_config=text_cfg,
        sampling=sampling,
    )
    ckpt = cfg.get("ckpt_path")
    if ckpt and os.path.exists(str(ckpt)):
        from lavie_tpu.io.checkpoints import load_pipeline_params

        pipe.params = load_pipeline_params(pipe.params, ckpt, sd_path=cfg.get("pretrained_path"))
    else:
        print("[lavie_tpu] no TSR checkpoint — random weights (smoke mode)", file=sys.stderr)
    return pipe


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args(argv)
    cfg = load_yaml_config(args.config)
    if "args" in cfg:  # reference nests everything under `args:`
        cfg = cfg["args"]

    pipe = build_pipeline(cfg)
    out_dir = cfg.get("output_folder", "./res/interpolation/")
    os.makedirs(out_dir, exist_ok=True)

    inputs = sorted(
        glob.glob(os.path.join(cfg.get("input_folder", "./res/base/"), "*.mp4"))
        + glob.glob(os.path.join(cfg.get("input_folder", "./res/base/"), "*.npy"))
        + glob.glob(os.path.join(cfg.get("input_folder", "./res/base/"), "*.gif"))
        + glob.glob(os.path.join(cfg.get("input_folder", "./res/base/"), "*.avi"))
    )
    suffix = cfg.get("additional_prompt", ", 4k.")
    for path in inputs:
        name = os.path.splitext(os.path.basename(path))[0]
        prompt = name.replace("_", " ")
        print(f"Interpolating ({prompt})")
        frames = read_video(path)
        out = pipe(
            frames,
            prompt=prompt + suffix,
            negative_prompt=cfg.get("negative_prompt", "None"),
            num_inference_steps=cfg.get("num_sampling_steps", 50),
            out_frames=cfg.get("num_frames", 61),
            seed=cfg.get("seed", 0) or 0,
            mask_type=cfg.get("mask_type"),
        )
        written = write_video(
            os.path.join(out_dir, name + ".mp4"), out.video[0], fps=cfg.get("fps", 24)
        )
        print(f"wrote {written}")


if __name__ == "__main__":
    main()
