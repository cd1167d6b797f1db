"""Measure int8-turbo output drift vs the bf16 parity path, full scale.

Default (--stage vsr): ONE full-size VSR window (8f, 320x512 -> 1280x2048,
50 v-pred DDIM steps incl. the two-phase VAE decode) run twice over the SAME
params, input video, and seed — once bf16, once conv_quant="int8"
(UNet + VAE) — reporting PSNR between the two uint8 outputs and the wall
clock of each run.

--stage base / tsr do the same for the other cascade stages (VERDICT r4
missing #4: `conv_quant: int8` is exposed on all three stage surfaces, so
all three drift numbers are part of the contract).

--exclude PAT[,PAT...] quantizes selectively: convs whose flax module path
contains any pattern stay exact (nn/quant.py conv_quant_scope exclude).

--sweep runs the drift-vs-speed Pareto over the VSR window (VERDICT r4 #3):
for each named layer-class exclusion it measures PSNR + window wall clock,
printing a table to find the subset that keeps most of the turbo win at
>= ~45 dB (the promote bar: enough margin inside the 35 dB parity contract).

With random-init weights this measures the numerical drift of the quantized
compute path through the full feedback loop, not perceptual quality
(that needs real checkpoints — rerun with ckpt paths when they exist; see
DESIGN.md turbo record).

Usage:
  python tools/turbo_quality.py [--steps 50] [--frames 8] [--stage vsr]
  python tools/turbo_quality.py --stage base   # base drift
  python tools/turbo_quality.py --stage tsr    # TSR drift
  python tools/turbo_quality.py --exclude up_blocks,samplers
  python tools/turbo_quality.py --sweep [--sweep-steps 50]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def psnr_stats(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    return (
        10.0 * np.log10(255.0**2 / max(mse, 1e-12)),
        float(np.mean(np.abs(a - b))),
        float(np.max(np.abs(a - b))),
    )


# Layer classes for the selective-quantization sweep (--sweep): each entry is
# (name, exclude patterns). Patterns substring-match the conv module paths of
# nn/unet.py (e.g. "down_blocks_0/resnets_1/conv2/conv") and nn/vae.py.
SWEEP_CLASSES = [
    ("all-int8", ()),  # the r4-measured baseline config
    ("exc-vae", ("VAE",)),  # special-cased below: vae stays bf16
    ("exc-resnet-conv2", ("conv2",)),  # second conv of every resnet
    ("exc-resnet-conv1", ("conv1",)),
    ("exc-samplers", ("samplers",)),  # up/downsampler convs
    ("exc-temporal", ("temporal_blocks", "temporal_block")),  # temporal-module spatial resnets
    ("exc-up-blocks", ("up_blocks",)),  # decoder half of the UNet
    ("exc-down-blocks", ("down_blocks",)),
    # combinations informed by the single-class round-5 sweep (DESIGN.md):
    # VAE and sampler quantization are PURE LOSSES (quantize overhead beats
    # their int8 win AND they cost drift); up-block quantization is the
    # dominant drift source. The promote candidate excludes all three.
    ("exc-vae-samplers", ("VAE", "samplers")),
    ("exc-vae-samplers-up", ("VAE", "samplers", "up_blocks")),
    ("exc-vae-up", ("VAE", "up_blocks")),
]


def build_vsr(base_pipe, mode, exclude):
    from lavie_tpu.pipelines.vsr import VideoSuperResolutionPipeline

    vae_mode = "none" if "VAE" in exclude else mode
    ex = tuple(p for p in exclude if p != "VAE")
    return VideoSuperResolutionPipeline(
        dataclasses.replace(base_pipe.unet_config, conv_quant=mode,
                            conv_quant_exclude=ex),
        dataclasses.replace(base_pipe.vae_config, conv_quant=vae_mode,
                            conv_quant_exclude=ex),
        base_pipe.text_config, base_pipe.params,
    )


def run_vsr(pipe, video, steps):
    t0 = time.time()
    out = pipe(video, prompt="a cat, 4k.", num_inference_steps=steps, seed=123)
    v = np.asarray(out.video)
    return v, time.time() - t0


def stage_vsr(args):
    from lavie_tpu.pipelines.vsr import VideoSuperResolutionPipeline

    log("init full-size VSR pipeline...")
    pipe = VideoSuperResolutionPipeline.init_random(jax.random.PRNGKey(0))
    pipe.params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), pipe.params)

    rng = np.random.RandomState(7)
    video = (rng.rand(args.frames, 320, 512, 3) * 255).astype(np.uint8)

    exclude = tuple(p for p in (args.exclude or "").split(",") if p)
    outs = {}
    times = {}
    for mode in ("none", "int8"):
        p = build_vsr(pipe, mode, exclude if mode == "int8" else ())
        outs[mode], times[mode] = run_vsr(p, video, args.steps)
        log(f"{mode}{' exc=' + ','.join(exclude) if mode == 'int8' and exclude else ''}: "
            f"{times[mode]:.1f}s  shape={outs[mode].shape}")

    psnr, mad, mx = psnr_stats(outs["none"], outs["int8"])
    print(f"turbo-vs-bf16: PSNR {psnr:.2f} dB  mean|Δ| {mad:.3f}  max|Δ| {mx:.0f} "
          f"(uint8 scale, {args.frames}f x {args.steps} steps, random-init weights"
          f"{', exclude=' + ','.join(exclude) if exclude else ''})")
    if args.check and psnr < args.min_psnr:
        print(f"FAIL: PSNR {psnr:.2f} < {args.min_psnr}", file=sys.stderr)
        sys.exit(1)


def stage_base(args):
    from lavie_tpu.pipelines.t2v import TextToVideoPipeline

    log("init full-size base pipeline...")
    pipe = TextToVideoPipeline.init_random(jax.random.PRNGKey(0))
    pipe.params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), pipe.params)

    outs = {}
    for mode in ("none", "int8"):
        p = TextToVideoPipeline(
            dataclasses.replace(pipe.unet_config, conv_quant=mode),
            dataclasses.replace(pipe.vae_config, conv_quant=mode),
            pipe.text_config, pipe.params,
        )
        t0 = time.time()
        out = p("a teddy bear walking on the street, 4k, high resolution",
                video_length=16, height=320, width=512,
                num_inference_steps=args.steps, guidance_scale=7.5,
                sample_method="ddpm", seed=123)
        outs[mode] = np.asarray(out.video)
        log(f"{mode}: {time.time()-t0:.1f}s  shape={outs[mode].shape}")

    psnr, mad, mx = psnr_stats(outs["none"], outs["int8"])
    print(f"base turbo-vs-bf16: PSNR {psnr:.2f} dB  mean|Δ| {mad:.3f}  "
          f"max|Δ| {mx:.0f} (uint8, 16f x {args.steps} DDPM steps, random-init)")
    if args.check and psnr < args.min_psnr:
        sys.exit(1)


def stage_tsr(args):
    from lavie_tpu.pipelines.interpolate import VideoInterpolationPipeline

    log("init full-size TSR pipeline...")
    pipe = VideoInterpolationPipeline.init_random(jax.random.PRNGKey(0))
    pipe.params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), pipe.params)

    rng = np.random.RandomState(7)
    video = (rng.rand(16, 320, 512, 3) * 255).astype(np.uint8)

    exclude = tuple(p for p in (args.exclude or "").split(",") if p)
    outs = {}
    for mode in ("none", "int8"):
        ex = exclude if mode == "int8" else ()
        vae_mode = "none" if "VAE" in ex else mode
        p = VideoInterpolationPipeline(
            dataclasses.replace(pipe.unet_config, conv_quant=mode,
                                conv_quant_exclude=tuple(x for x in ex if x != "VAE")),
            dataclasses.replace(pipe.vae_config, conv_quant=vae_mode,
                                conv_quant_exclude=tuple(x for x in ex if x != "VAE")),
            pipe.text_config, pipe.params,
        )
        t0 = time.time()
        out = p(video, prompt="a cat, 4k.", num_inference_steps=args.steps,
                out_frames=61, seed=123)
        outs[mode] = np.asarray(out.video)
        log(f"{mode}: {time.time()-t0:.1f}s  shape={outs[mode].shape}")

    psnr, mad, mx = psnr_stats(outs["none"], outs["int8"])
    print(f"tsr turbo-vs-bf16: PSNR {psnr:.2f} dB  mean|Δ| {mad:.3f}  "
          f"max|Δ| {mx:.0f} (uint8, 16->61f x {args.steps} DDIM steps, random-init"
          f"{', exclude=' + ','.join(exclude) if exclude else ''})")
    if args.check and psnr < args.min_psnr:
        sys.exit(1)


def sweep(args):
    """Drift-vs-speed Pareto over the VSR window (VERDICT r4 #3)."""
    from lavie_tpu.pipelines.vsr import VideoSuperResolutionPipeline

    log("init full-size VSR pipeline...")
    pipe = VideoSuperResolutionPipeline.init_random(jax.random.PRNGKey(0))
    pipe.params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), pipe.params)

    rng = np.random.RandomState(7)
    video = (rng.rand(args.frames, 320, 512, 3) * 255).astype(np.uint8)
    steps = args.sweep_steps

    log(f"bf16 reference ({steps} steps)...")
    ref_pipe = build_vsr(pipe, "none", ())
    ref, t_ref = run_vsr(ref_pipe, video, steps)
    # second bf16 run for a wall-clock floor reference (first may compile)
    ref2, t_ref2 = run_vsr(ref_pipe, video, steps)
    assert np.array_equal(ref, ref2)
    t_bf16 = min(t_ref, t_ref2)
    log(f"bf16 window: {t_bf16:.1f}s")

    rows = []
    for name, exclude in SWEEP_CLASSES:
        if args.only and name not in args.only.split(","):
            continue
        log(f"--- {name} (exclude={exclude}) ---")
        p = build_vsr(pipe, "int8", exclude)
        out, t_cold = run_vsr(p, video, steps)  # includes compile
        out2, t_warm = run_vsr(p, video, steps)
        assert np.array_equal(out, out2)
        psnr, mad, mx = psnr_stats(ref, out)
        win_pct = (t_bf16 / min(t_cold, t_warm) - 1) * 100
        row = {"config": name, "exclude": list(exclude),
               "psnr_db": round(psnr, 2), "mean_abs": round(mad, 3),
               "max_abs": round(mx, 0), "window_s": round(min(t_cold, t_warm), 1),
               "bf16_window_s": round(t_bf16, 1),
               "speedup_vs_bf16_pct": round(win_pct, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n== Pareto table (steps={}, frames={}) ==".format(steps, args.frames))
    print(f"{'config':<20} {'PSNR dB':>8} {'window s':>9} {'vs bf16':>8}")
    for r in sorted(rows, key=lambda r: -r["psnr_db"]):
        print(f"{r['config']:<20} {r['psnr_db']:>8.2f} {r['window_s']:>9.1f} "
              f"{r['speedup_vs_bf16_pct']:>7.1f}%")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--stage", choices=("vsr", "base", "tsr"), default="vsr")
    ap.add_argument("--exclude", default="",
                    help="comma-separated path patterns kept exact (VSR stage)")
    ap.add_argument("--sweep", action="store_true",
                    help="run the per-layer-class drift-vs-speed Pareto")
    ap.add_argument("--sweep-steps", type=int, default=50)
    ap.add_argument("--only", default="",
                    help="comma-separated sweep config names to run")
    ap.add_argument("--check", action="store_true",
                    help="regression gate: exit 1 if PSNR < --min-psnr "
                         "(measured 39.10 dB at 8f/50 steps, DESIGN.md "
                         "round-4 turbo drift record)")
    ap.add_argument("--min-psnr", type=float, default=37.0)
    args = ap.parse_args()

    if args.sweep:
        sweep(args)
    elif args.stage == "vsr":
        stage_vsr(args)
    elif args.stage == "base":
        stage_base(args)
    else:
        stage_tsr(args)


if __name__ == "__main__":
    main()
