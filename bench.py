"""Benchmark: the full cascade on one chip, one JSON line per stage.

Stages (select with BENCH_STAGES=base,tsr,vsr — default all):
  - base: T2V 50-step DDPM+CFG denoise + VAE decode at 16f @ 320×512
    (reference hot path, SURVEY §3.1) → frames/s
  - tsr: full 16→61-frame interpolation sample, DDIM 50 steps incl. VAE
    encode/decode (SURVEY §3.2) → s/sample
  - vsr: one full 8-frame VSR window 320×512 → 1280×2048, 50 v-pred DDIM
    steps + fp32-interface decode (SURVEY §3.3) → s/window

Output contract (hardened after BENCH_r03 was lost to a timeout, rc 124):
  - every per-stage JSON line is printed the MOMENT that stage finishes
    (a timeout mid-run still leaves every completed stage on stdout);
  - the option-4 headline is printed as soon as base+tsr+vsr are all
    known, BEFORE any optional extra work;
  - the FINAL stdout line is always the headline metric the driver
    records: option-4 total when all three stages ran (re-printed last
    if opt-in extras emitted lines after it), else the last stage line.
  - int8 turbo is OPT-IN (BENCH_TURBO=1) and runs only after the
    headline is already on stdout; default is off.

Timing hygiene (DESIGN.md): fresh inputs per run (the axon tunnel dedupes
identical dispatches) and np.asarray host materialization (block_until_ready
can defer through the tunnel).

The option-4 headline is a sum of independently-benched stages; the SAME
recipe measured as ONE in-process program chain (prompt → base → TSR →
VSR → uint8 video, interstage glue included, like the reference's
predict.py) is tools/run_cascade_full.py — its measured wall clock and the
reconciliation against this sum are recorded in DESIGN.md ("Round-4
one-shot cascade").
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: the axon tunnel compiles large programs slowly;
# cache so repeat bench runs (and the driver's end-of-round run) are warm
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.lavie_tpu_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

# Round-1 pinned values (one v5e chip); later rounds compare against them.
ROUND1_BASELINE_FPS = 1.4358       # base frames/s (hardened timing)
ROUND1_OPTION4_S = 953.0           # 9.6 + 56.1 + 8×111.0 (end of round 1)
ROUND1_TSR_S = 56.1
ROUND1_VSR_WINDOW_S = 111.0

# Regression guard (VERDICT r4 #1: BENCH_r04 recorded TSR 15% slower than the
# same round's cascade without anyone noticing — a backward step must never
# again be recorded silently). Each stage line carries a
# "regression_vs_last_round" field computed against the most recent committed
# BENCH_r0*.json artifact, plus a loud stderr warning past the tunnel band.
_STAGE_PREFIXES = {
    "base": "frames/sec/chip base T2V",
    "tsr": "TSR 16->61f",
    "vsr": "VSR 8f window 320x512->1280x2048 50-step (incl. decode)",
    "vsr_tail": "VSR 5f tail window",
    "option4": "option-4 single-chip total",
}
REGRESSION_WARN_PCT = 5.0  # tunnel run-to-run band is ±2.5% (DESIGN.md)


def _prev_round_values():
    """{stage: (round_file, value)} from the MOST RECENT committed
    BENCH_r0*.json that carries each stage metric (artifacts store the run's
    stdout tail; stage lines are JSON)."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    prev = {}
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(path) as f:
                d = json.load(f)
        except Exception:
            continue
        for line in str(d.get("tail", "")).splitlines():
            if not line.startswith("{"):
                continue
            try:
                j = json.loads(line)
            except Exception:
                continue
            metric, v = j.get("metric", ""), j.get("value")
            if not isinstance(v, (int, float)):
                continue
            for stage, prefix in _STAGE_PREFIXES.items():
                if metric.startswith(prefix):
                    prev[stage] = (os.path.basename(path), float(v))
    return prev


_PREV = None


def check_regression(stage, value, smaller_is_better=True):
    """Returns (field_value, prev_desc) — the fractional regression vs the
    last committed round (positive = THIS run is worse), or (None, None)
    when no prior artifact carries the stage."""
    global _PREV
    if _PREV is None:
        _PREV = _prev_round_values()
    if stage not in _PREV:
        return None, None
    fname, pv = _PREV[stage]
    if pv <= 0:
        return None, None
    reg = (value / pv - 1.0) if smaller_is_better else (pv / value - 1.0)
    desc = f"{fname}={pv:g}"
    if reg * 100 > REGRESSION_WARN_PCT:
        log(f"*** REGRESSION WARNING: {stage} = {value:g} is "
            f"{reg*100:.1f}% worse than the last recorded round "
            f"({desc}; tunnel band is ±2.5%) — diagnose before recording ***")
    return round(reg, 4), desc

STEPS = int(os.environ.get("BENCH_STEPS", "50"))
FRAMES = int(os.environ.get("BENCH_FRAMES", "16"))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", "320"))
WIDTH = int(os.environ.get("BENCH_WIDTH", "512"))
TINY = os.environ.get("BENCH_TINY", "0") == "1"
STAGES = os.environ.get("BENCH_STAGES", "base,tsr,vsr").split(",")

# The ONE-program scanned samplers hang the axon remote compiler at full
# size, and the remote worker kills single device programs past ~100 s —
# "hybrid" scans the denoise loop in K-step chunk programs (one compiled
# executable re-dispatched; LAVIE_SCAN_CHUNK=10 default), bit-identical to
# the python loop (tested) and measured faster: VSR window 108.9 → 102.6 s.
os.environ.setdefault("LAVIE_LOOP_MODE", "hybrid")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def adaptive_runs(run, stage, seed0, n=3, max_n=5, spread_pct=5.0):
    """Best-of-N with adaptive extension: when the run-to-run spread exceeds
    the tunnel band (a measured 23.9% TSR spread in one r5 session vs the
    ±2.5% typical band), take up to max_n samples so the best-of reaches the
    fast envelope instead of recording one noisy session as a regression.
    The spread is reported alongside the best either way."""
    times = [run(seed0 + i) for i in range(n)]
    while (len(times) < max_n
           and (max(times) / min(times) - 1.0) * 100 > spread_pct):
        log(f"{stage}: spread {((max(times)/min(times))-1)*100:.1f}% > "
            f"{spread_pct}% — extra run {len(times)+1}/{max_n}")
        times.append(run(seed0 + len(times)))
    return times


def bench_base():
    """Base T2V through the SHIPPED pipeline class (text encode → CFG-doubled
    UNet → DDPM stepper → VAE decode), not a hand-rebuilt subset — the
    measured number includes the CLIP text encode the real pipeline runs,
    like the tsr/vsr benches already do."""
    from lavie_tpu.core.config import CLIPTextConfig, SamplingConfig, UNetConfig, VAEConfig
    from lavie_tpu.pipelines.t2v import TextToVideoPipeline

    log("base: initializing full-size pipeline (jitted init)...")
    t0 = time.time()
    if TINY:
        pipe = TextToVideoPipeline.init_random(
            jax.random.PRNGKey(0),
            unet_config=UNetConfig.base_t2v().tiny(),
            vae_config=VAEConfig.sd().tiny(),
            text_config=CLIPTextConfig.vit_l().tiny(),
        )
        frames, height, width, steps = 2, 64, 64, 2
    else:
        pipe = TextToVideoPipeline.init_random(jax.random.PRNGKey(0))
        frames, height, width, steps = FRAMES, HEIGHT, WIDTH, STEPS
    # inference weights are bf16 (what a converted checkpoint serves); fp32
    # init params would add a per-op convert + 2x weight bandwidth
    pipe.params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), pipe.params)
    n_params = sum(x.size for x in jax.tree.leaves(pipe.params["unet"]))
    log(f"base: init {time.time()-t0:.1f}s; UNet params: {n_params/1e6:.0f}M")

    def run(seed):
        t0 = time.time()
        out = pipe(
            "a teddy bear walking on the street, 4k, high resolution",
            video_length=frames, height=height, width=width,
            num_inference_steps=steps, guidance_scale=7.5,
            sample_method="ddpm", seed=seed,
        )
        _ = np.asarray(out.video)
        return time.time() - t0

    log("base: compiling + warmup...")
    t0 = time.time()
    run(0)
    log(f"base: compile+first-run {time.time()-t0:.1f}s")

    times = [run(100 + i) for i in range(3)]
    best = min(times)
    fps = frames / best
    log(f"base: runs {[f'{t:.2f}s' for t in times]}; best {best:.2f}s → {fps:.3f} frames/s")
    return fps, best, times


def bench_tsr():
    from lavie_tpu.core.config import CLIPTextConfig, UNetConfig, VAEConfig
    from lavie_tpu.pipelines.interpolate import VideoInterpolationPipeline

    if TINY:
        pipe = VideoInterpolationPipeline.init_random(
            jax.random.PRNGKey(0),
            unet_config=UNetConfig.interpolation().tiny(),
            vae_config=VAEConfig.sd().tiny(),
            text_config=CLIPTextConfig.vit_l().tiny(),
        )
        frames_in, h, w, out_frames, steps = 4, 64, 64, 5, 2
    else:
        log("tsr: initializing full-size pipeline (jitted init)...")
        pipe = VideoInterpolationPipeline.init_random(jax.random.PRNGKey(0))
        frames_in, h, w, out_frames, steps = 16, 320, 512, 61, STEPS
    pipe.params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), pipe.params)

    rng = np.random.RandomState(0)

    def run(seed):
        video = (rng.rand(frames_in, h, w, 3) * 255).astype(np.uint8)
        t0 = time.time()
        out = pipe(video, prompt="a cat, 4k.", num_inference_steps=steps,
                   out_frames=out_frames, seed=seed)
        _ = np.asarray(out.video)
        return time.time() - t0

    log("tsr: compile + warmup sample...")
    t0 = time.time()
    run(0)
    log(f"tsr: compile+first-run {time.time()-t0:.1f}s")
    # 3 timed runs (was 2 through r4): two samples cannot distinguish a bad
    # tunnel day from a real slowdown — the r4 TSR record (62.3/67.4 s vs the
    # same round's 53.9 s cascade) went unnoticed for exactly that reason
    times = adaptive_runs(run, "tsr", 1)
    best = min(times)
    log(f"tsr: runs {[f'{t:.1f}s' for t in times]}; best {best:.1f}s/sample")
    return best, times


def bench_vsr():
    from lavie_tpu.core.config import CLIPTextConfig, UNetConfig, VAEConfig
    from lavie_tpu.pipelines.vsr import VideoSuperResolutionPipeline

    if TINY:
        pipe = VideoSuperResolutionPipeline.init_random(
            jax.random.PRNGKey(0),
            unet_config=UNetConfig.vsr().tiny(),
            vae_config=VAEConfig.vsr().tiny(),
            text_config=CLIPTextConfig.open_clip_h().tiny(),
            window=4,
        )
        frames, h, w, steps = 4, 32, 32, 2
    else:
        log("vsr: initializing full-size pipeline (jitted init)...")
        pipe = VideoSuperResolutionPipeline.init_random(jax.random.PRNGKey(0))
        frames, h, w, steps = 8, 320, 512, STEPS
    pipe.params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), pipe.params)

    rng = np.random.RandomState(0)

    def run(seed, nframes):
        video = (rng.rand(nframes, h, w, 3) * 255).astype(np.uint8)
        t0 = time.time()
        out = pipe(video, prompt="a cat, 4k.", num_inference_steps=steps,
                   seed=seed)
        _ = np.asarray(out.video)
        return time.time() - t0

    log("vsr: compile + warmup window...")
    t0 = time.time()
    run(0, frames)
    log(f"vsr: compile+first-run {time.time()-t0:.1f}s")
    # 3 timed runs (was 2) — see bench_tsr's comment
    times = adaptive_runs(lambda seed: run(seed, frames), "vsr", 1)
    best = min(times)
    log(f"vsr: runs {[f'{t:.1f}s' for t in times]}; best {best:.1f}s/window")

    # the 61-frame option-4 video splits into 7 full windows + a 5-frame
    # tail, which the pipeline now runs at its NATURAL size (no padding) —
    # measure it so the option-4 total stops charging 3 phantom frames
    tail = 5 if not TINY else max(frames - 1, 1)
    log("vsr: compile + warmup tail window...")
    t0 = time.time()
    run(50, tail)
    log(f"vsr: tail compile+first-run {time.time()-t0:.1f}s")
    tail_times = [run(51 + i, tail) for i in range(2)]
    tail_best = min(tail_times)
    log(f"vsr: tail runs {[f'{t:.1f}s' for t in tail_times]}; best {tail_best:.1f}s/{tail}f-tail")

    # opt-in int8 turbo window (nn/quant.py): same params (the quant path
    # reads the exact param tree), int8 MXU convs. NOT the parity path —
    # reported as its own line AFTER the headline; the option-4 headline
    # stays bf16. Returned as a thunk so main() can run it only once the
    # headline is already on stdout (BENCH_r03 lesson).
    def run_turbo():
        import dataclasses

        pipe_t = VideoSuperResolutionPipeline(
            dataclasses.replace(pipe.unet_config, conv_quant="int8"),
            dataclasses.replace(pipe.vae_config, conv_quant="int8"),
            pipe.text_config, pipe.params,
        )

        def run_t(seed, nframes):
            video = (rng.rand(nframes, h, w, 3) * 255).astype(np.uint8)
            t0 = time.time()
            out = pipe_t(video, prompt="a cat, 4k.",
                         num_inference_steps=steps, seed=seed)
            _ = np.asarray(out.video)
            return time.time() - t0

        log("vsr: compile + warmup int8 turbo window...")
        t0 = time.time()
        run_t(70, frames)
        log(f"vsr: turbo compile+first-run {time.time()-t0:.1f}s")
        turbo_times = [run_t(71 + i, frames) for i in range(2)]
        turbo_best = min(turbo_times)
        log(f"vsr: turbo runs {[f'{t:.1f}s' for t in turbo_times]}; best {turbo_best:.1f}s/window")
        return turbo_best

    return best, tail_best, run_turbo, times, tail_times


def emit(line):
    """Print a metric line IMMEDIATELY (streamed — see module docstring)."""
    print(json.dumps(line), flush=True)
    return line


def main():
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    last = None
    base_s = tsr_s = vsr_s = vsr_tail_s = None
    vsr_turbo_fn = None

    def spread(times):
        return round((max(times) / min(times) - 1.0) * 100, 1)

    def stage_fields(stage, value, times=None, smaller_is_better=True):
        extra = {}
        if times is not None:
            sp = spread(times)
            extra["spread_pct"] = sp
            if sp > REGRESSION_WARN_PCT:
                log(f"*** SPREAD WARNING: {stage} runs spread {sp:.1f}% "
                    f"(> {REGRESSION_WARN_PCT}%) — tunnel/host noise; "
                    "treat the best as an upper bound on true stage time ***")
        reg, prev_desc = check_regression(stage, value, smaller_is_better)
        if reg is not None:
            extra["regression_vs_last_round"] = reg
            extra["last_round"] = prev_desc
        return extra

    if "base" in STAGES:
        base_fps, base_s, base_times = bench_base()
        last = emit({
            "metric": f"frames/sec/chip base T2V {FRAMES}x{HEIGHT}x{WIDTH} {STEPS}-step DDPM+CFG (full pipeline incl. text encode + VAE decode)",
            "value": round(base_fps, 4), "unit": "frames/s",
            "vs_baseline": round(base_fps / ROUND1_BASELINE_FPS, 4),
            **stage_fields("base", base_fps, base_times, smaller_is_better=False),
        })
    if "tsr" in STAGES:
        tsr_s, tsr_times = bench_tsr()
        last = emit({
            "metric": "TSR 16->61f @320x512 50-step sample (incl. VAE enc+dec)",
            "value": round(tsr_s, 2), "unit": "s/sample",
            "vs_baseline": round(ROUND1_TSR_S / tsr_s, 4),
            **stage_fields("tsr", tsr_s, tsr_times),
        })
    if "vsr" in STAGES:
        vsr_s, vsr_tail_s, vsr_turbo_fn, vsr_times, tail_times = bench_vsr()
        emit({
            "metric": "VSR 8f window 320x512->1280x2048 50-step (incl. decode)",
            "value": round(vsr_s, 2), "unit": "s/window",
            "vs_baseline": round(ROUND1_VSR_WINDOW_S / vsr_s, 4),
            **stage_fields("vsr", vsr_s, vsr_times),
        })
        last = emit({
            "metric": "VSR 5f tail window 320x512->1280x2048 50-step (natural size, no padding)",
            "value": round(vsr_tail_s, 2), "unit": "s/window",
            "vs_baseline": round(ROUND1_VSR_WINDOW_S / vsr_tail_s, 4),
            **stage_fields("vsr_tail", vsr_tail_s, tail_times),
        })

    # headline the moment all three stages are known — BEFORE any extras
    headline = None
    if base_s is not None and tsr_s is not None and vsr_s is not None:
        # 61 frames = 7 full 8-frame windows + the natural-size 5-frame tail
        opt4 = base_s + tsr_s + 7 * vsr_s + vsr_tail_s
        headline = emit({
            "metric": "option-4 single-chip total: base + TSR + 7 VSR windows + 5f tail (61f @ 1280x2048, 50 steps)",
            "value": round(opt4, 1), "unit": "s",
            "vs_baseline": round(ROUND1_OPTION4_S / opt4, 4),
            **stage_fields("option4", opt4),
        })

    # opt-in extras AFTER the headline; if they emit, re-print the headline
    # so the final stdout line is always the driver's metric
    if (os.environ.get("BENCH_TURBO", "0") == "1" and not TINY
            and vsr_turbo_fn is not None):
        vsr_turbo_s = vsr_turbo_fn()
        emit({
            "metric": "VSR 8f window, int8 turbo convs (opt-in, non-parity path)",
            "value": round(vsr_turbo_s, 2), "unit": "s/window",
            "vs_baseline": round(ROUND1_VSR_WINDOW_S / vsr_turbo_s, 4),
        })
        if headline is not None:
            emit(headline)
    elif headline is None and last is not None:
        pass  # the last stage line already on stdout IS the headline


if __name__ == "__main__":
    main()
