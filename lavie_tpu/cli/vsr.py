"""Video super-resolution CLI (reference surface: vsr/sample.py:145-151 with
vsr/configs/sample.yaml).

    python -m lavie_tpu.cli.vsr --config configs/vsr.yaml
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time

import jax

from lavie_tpu.core.config import (
    CLIPTextConfig,
    UNetConfig,
    VAEConfig,
    load_yaml_config,
)
from lavie_tpu.io.video import read_video, write_video
from lavie_tpu.pipelines import VideoSuperResolutionPipeline


def build_pipeline(cfg: dict) -> VideoSuperResolutionPipeline:
    tiny = cfg.get("model_scale", "full") == "tiny"
    mk = (lambda c: c.tiny()) if tiny else (lambda c: c)
    # opt-in int8 turbo conv path (nn/quant.py) — NOT the parity path
    unet_cfg = mk(UNetConfig.vsr())
    vae_cfg = mk(VAEConfig.vsr())
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
    pipe = VideoSuperResolutionPipeline.init_random(
        jax.random.PRNGKey(10),
        unet_config=unet_cfg,
        vae_config=vae_cfg,
        text_config=mk(CLIPTextConfig.open_clip_h()),
        noise_level=cfg.get("noise_level", 50),
        window=cfg.get("window", 8),
    )
    ckpt = cfg.get("ckpt_path")
    if ckpt and os.path.exists(str(ckpt)):
        from lavie_tpu.io.checkpoints import load_pipeline_params

        pipe.params = load_pipeline_params(pipe.params, ckpt, sd_path=cfg.get("pretrained_path"))
    else:
        print("[lavie_tpu] no VSR checkpoint — random weights (smoke mode)", file=sys.stderr)
    return pipe


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args(argv)
    cfg = load_yaml_config(args.config)

    pipe = build_pipeline(cfg)
    out_dir = cfg.get("output_path", "./res/vsr/")
    os.makedirs(out_dir, exist_ok=True)

    in_dir = cfg.get("input_path", "./res/base/")
    inputs = sorted(
        glob.glob(os.path.join(in_dir, "*.mp4"))
        + glob.glob(os.path.join(in_dir, "*.npy"))
        + glob.glob(os.path.join(in_dir, "*.gif"))
        + glob.glob(os.path.join(in_dir, "*.avi"))
    )
    print(f"video num: {len(inputs)}")
    for i, path in enumerate(inputs):
        name = os.path.splitext(os.path.basename(path))[0]
        prompt = name.replace("_", " ")
        print(f"[{i+1}/{len(inputs)}]: {name}")
        frames = read_video(path)
        t0 = time.time()
        out = pipe(
            frames,
            prompt=prompt,
            negative_prompt=cfg.get("negative_prompt", "blur, worst quality"),
            num_inference_steps=cfg.get("inference_steps", 50),
            guidance_scale=cfg.get("guidance_scale", 5.0),
            noise_level=cfg.get("noise_level", 50),
        )
        written = write_video(os.path.join(out_dir, name + ".mp4"), out.video, fps=cfg.get("fps", 8))
        print(f"wrote {written}, time (sec): {time.time()-t0:.1f}")


if __name__ == "__main__":
    main()
