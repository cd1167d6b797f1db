"""Measure int8-turbo output drift vs the bf16 parity path, full scale.

Runs ONE full-size VSR window (8f, 320x512 -> 1280x2048, 50 v-pred DDIM
steps incl. the two-phase VAE decode) twice over the SAME params, input
video, and seed — once bf16, once conv_quant="int8" (UNet + VAE) — and
reports PSNR between the two uint8 outputs.

With random-init weights this measures the numerical drift of the quantized
compute path through the full 50-step feedback loop, not perceptual quality
(that needs real checkpoints — rerun this tool with ckpt paths when they
exist; see DESIGN.md turbo record).

Usage: python tools/turbo_quality.py [--steps 50] [--frames 8]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

# full-size scanned programs hang the axon remote compiler (see
# .claude/skills/verify): use the chunked hybrid loop like bench.py
os.environ.setdefault("LAVIE_LOOP_MODE", "hybrid")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.lavie_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--check", action="store_true",
                    help="regression gate: exit 1 if PSNR < --min-psnr "
                         "(measured 39.10 dB at 8f/50 steps, DESIGN.md "
                         "round-4 turbo drift record)")
    ap.add_argument("--min-psnr", type=float, default=37.0)
    args = ap.parse_args()

    from lavie_tpu.pipelines.vsr import VideoSuperResolutionPipeline

    print("init full-size VSR pipeline...", file=sys.stderr, flush=True)
    pipe = VideoSuperResolutionPipeline.init_random(jax.random.PRNGKey(0))
    pipe.params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), pipe.params)

    rng = np.random.RandomState(7)
    video = (rng.rand(args.frames, 320, 512, 3) * 255).astype(np.uint8)

    outs = {}
    for mode in ("none", "int8"):
        p = VideoSuperResolutionPipeline(
            dataclasses.replace(pipe.unet_config, conv_quant=mode),
            dataclasses.replace(pipe.vae_config, conv_quant=mode),
            pipe.text_config, pipe.params,
        )
        t0 = time.time()
        out = p(video, prompt="a cat, 4k.", num_inference_steps=args.steps, seed=123)
        outs[mode] = np.asarray(out.video).astype(np.float64)
        print(f"{mode}: {time.time()-t0:.1f}s  shape={outs[mode].shape}",
              file=sys.stderr, flush=True)

    mse = float(np.mean((outs["none"] - outs["int8"]) ** 2))
    psnr = 10.0 * np.log10(255.0**2 / max(mse, 1e-12))
    mad = float(np.mean(np.abs(outs["none"] - outs["int8"])))
    mx = float(np.max(np.abs(outs["none"] - outs["int8"])))
    print(f"turbo-vs-bf16: PSNR {psnr:.2f} dB  mean|Δ| {mad:.3f}  max|Δ| {mx:.0f} "
          f"(uint8 scale, {args.frames}f x {args.steps} steps, random-init weights)")
    if args.check and psnr < args.min_psnr:
        print(f"FAIL: PSNR {psnr:.2f} < {args.min_psnr}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
