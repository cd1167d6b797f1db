"""Full-cascade CLI — the in-process equivalent of the reference's Cog server
(reference: predict.py:159-340) without the temp-file round trips.

    python -m lavie_tpu.cli.cascade --config configs/cascade.yaml
"""

from __future__ import annotations

import argparse
import os
import sys

import jax

from lavie_tpu.core.config import load_yaml_config
from lavie_tpu.io.video import write_video
from lavie_tpu.pipelines import VideoCascadePipeline


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    args = parser.parse_args(argv)
    cfg = load_yaml_config(args.config)

    tiny = cfg.get("model_scale", "full") == "tiny"
    if tiny:
        print("[lavie_tpu] tiny cascade (random weights, smoke mode)", file=sys.stderr)
    pipe = VideoCascadePipeline.init_random(
        jax.random.PRNGKey(cfg.get("seed") or 0), tiny=tiny,
        conv_quant=str(cfg.get("conv_quant", "none")),  # int8 = turbo (non-parity)
        conv_quant_exclude=tuple(
            p for p in str(cfg.get("conv_quant_exclude", "")).split(",") if p
        ),
    )

    out_dir = cfg.get("output_folder", "./res/cascade/")
    os.makedirs(out_dir, exist_ok=True)
    for prompt in cfg.get("text_prompt", []):
        print(f"Processing the ({prompt}) prompt")
        out = pipe(
            prompt,
            interpolation=cfg.get("interpolation", True),
            super_resolution=cfg.get("super_resolution", True),
            video_length=cfg.get("video_length", 16),
            height=cfg.get("image_size", [320, 512])[0],
            width=cfg.get("image_size", [320, 512])[1],
            num_inference_steps=cfg.get("num_sampling_steps", 50),
            guidance_scale=cfg.get("guidance_scale", 7.5),
            sample_method=cfg.get("sample_method", "ddpm"),
            seed=cfg.get("seed", 0) or 0,
        )
        written = write_video(
            os.path.join(out_dir, prompt.replace(" ", "_") + ".mp4"),
            out.video,
            fps=cfg.get("fps", 24 if cfg.get("interpolation", True) else 8),
        )
        print(f"wrote {written}")


if __name__ == "__main__":
    main()
