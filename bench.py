"""Benchmark: the full cascade on one chip, one JSON line per stage.

Stages (select with BENCH_STAGES=base,tsr,vsr — default all):
  - base: T2V 50-step DDPM+CFG denoise + VAE decode at 16f @ 320×512
    (reference hot path, SURVEY §3.1) → frames/s
  - tsr: full 16→61-frame interpolation sample, DDIM 50 steps incl. VAE
    encode/decode (SURVEY §3.2) → s/sample
  - vsr: one full 8-frame VSR window 320×512 → 1280×2048, 50 v-pred DDIM
    steps + fp32-interface decode (SURVEY §3.3) → s/window

The FINAL stdout line is the headline metric the driver records:
  - all three stages → single-chip option-4 total (base + tsr + 8·vsr),
    vs_baseline = round-1 measured 953 s / value (≥1 = faster than r1);
  - base only → frames/s vs the round-1 pin (back-compatible).

Timing hygiene (DESIGN.md): fresh inputs per run (the axon tunnel dedupes
identical dispatches) and np.asarray host materialization (block_until_ready
can defer through the tunnel).
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


def bench_base():
    from lavie_tpu.core.config import UNetConfig, VAEConfig
    from lavie_tpu.diffusion import NoiseSchedule
    from lavie_tpu.diffusion.samplers import (
        classifier_free_guidance,
        ddpm_step,
        ddpm_timesteps,
        prev_timesteps,
    )
    from lavie_tpu.nn.unet import UNet3D
    from lavie_tpu.nn.vae import AutoencoderKL

    unet_cfg = UNetConfig.base_t2v().tiny() if TINY else UNetConfig.base_t2v()
    vae_cfg = VAEConfig.sd().tiny() if TINY else VAEConfig.sd()
    height, width = (64, 64) if TINY else (HEIGHT, WIDTH)
    frames = 2 if TINY else FRAMES

    dtype = jnp.bfloat16
    unet = UNet3D(config=unet_cfg, dtype=dtype)
    vae = AutoencoderKL(config=vae_cfg, dtype=dtype)
    schedule = NoiseSchedule.create()

    lat_h, lat_w = height // 8, width // 8
    lat = jnp.zeros((1, frames, lat_h, lat_w, 4), dtype)
    ctx = jnp.zeros((2, 77, unet_cfg.cross_attention_dim), dtype)

    log("base: initializing params (jitted)...")
    t0 = time.time()
    unet_params = jax.jit(unet.init)(
        jax.random.PRNGKey(0), jnp.concatenate([lat, lat]), jnp.array([0, 0]), ctx
    )["params"]
    vae_params = jax.jit(vae.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, height, width, 3))
    )["params"]
    unet_params = jax.tree.map(lambda x: x.astype(dtype), unet_params)
    vae_params = jax.tree.map(lambda x: x.astype(dtype), vae_params)
    n_params = sum(x.size for x in jax.tree.leaves(unet_params))
    log(f"base: init {time.time()-t0:.1f}s; UNet params: {n_params/1e6:.0f}M")

    ts = jnp.asarray(ddpm_timesteps(STEPS))
    pts = jnp.asarray(prev_timesteps(np.asarray(ts)))

    def _denoise_step(params, x, text_states, t, pt, key):
        xin = jnp.concatenate([x, x], axis=0).astype(dtype)
        pred = unet.apply(
            {"params": params}, xin, jnp.broadcast_to(t, (2,)), text_states
        ).astype(jnp.float32)
        eps = classifier_free_guidance(pred, 7.5)
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, dtype=jnp.float32)
        x = ddpm_step(schedule, x, eps, t, pt, noise)
        return x, key

    # chunked hybrid loop (same shape as the pipelines'): K-step scanned
    # programs, timestep tables as traced args so one executable serves all
    # chunks; same step math as denoise_step → same output.
    scan_chunk = int(os.environ.get("LAVIE_SCAN_CHUNK", "10"))

    @jax.jit
    def denoise_scan(params, x, text_states, key, ts_c, pts_c):
        def body(carry, tp):
            x, key = carry
            x, key = _denoise_step(params, x, text_states, tp[0], tp[1], key)
            return (x, key), None

        (x, key), _ = jax.lax.scan(body, (x, key), (ts_c, pts_c))
        return x, key

    def denoise(params, x, text_states, key):
        x = x.astype(jnp.float32)
        k = scan_chunk if scan_chunk > 0 else STEPS
        for i in range(0, STEPS, k):
            x, key = denoise_scan(params, x, text_states, key,
                                  ts[i : i + k], pts[i : i + k])
        return x

    @jax.jit
    def decode(params, z):
        z2d = (z / 0.18215).astype(dtype).reshape(frames, lat_h, lat_w, 4)
        rgb = vae.apply({"params": params}, z2d, method=AutoencoderKL.decode)
        return jnp.clip(rgb.astype(jnp.float32) / 2 + 0.5, 0, 1)

    x0 = jax.random.normal(jax.random.PRNGKey(2), lat.shape, dtype=jnp.float32)

    log("base: compiling + warmup...")
    t0 = time.time()
    out = denoise(unet_params, x0, ctx, jax.random.PRNGKey(3))
    rgb = decode(vae_params, out)
    _ = np.asarray(rgb)
    log(f"base: compile+first-run {time.time()-t0:.1f}s")

    times = []
    for i in range(3):
        xi = jax.random.normal(jax.random.PRNGKey(100 + i), lat.shape, dtype=jnp.float32)
        t0 = time.time()
        out = denoise(unet_params, xi, ctx, jax.random.PRNGKey(i))
        rgb = decode(vae_params, out)
        _ = np.asarray(rgb)
        times.append(time.time() - t0)
    best = min(times)
    fps = frames / best
    log(f"base: runs {[f'{t:.2f}s' for t in times]}; best {best:.2f}s → {fps:.3f} frames/s")
    return fps, best


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
    times = [run(1 + i) for i in range(2)]
    best = min(times)
    log(f"tsr: runs {[f'{t:.1f}s' for t in times]}; best {best:.1f}s/sample")
    return best


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

    rng = np.random.RandomState(0)

    def run(seed):
        video = (rng.rand(frames, h, w, 3) * 255).astype(np.uint8)
        t0 = time.time()
        out = pipe(video, prompt="a cat, 4k.", num_inference_steps=steps,
                   seed=seed)
        _ = np.asarray(out.video)
        return time.time() - t0

    log("vsr: compile + warmup window...")
    t0 = time.time()
    run(0)
    log(f"vsr: compile+first-run {time.time()-t0:.1f}s")
    times = [run(1 + i) for i in range(2)]
    best = min(times)
    log(f"vsr: runs {[f'{t:.1f}s' for t in times]}; best {best:.1f}s/window")
    return best


def main():
    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    results = []
    base_fps = base_s = tsr_s = vsr_s = None

    if "base" in STAGES:
        base_fps, base_s = bench_base()
        results.append({
            "metric": f"frames/sec/chip base T2V {FRAMES}x{HEIGHT}x{WIDTH} {STEPS}-step DDPM+CFG (incl. VAE decode)",
            "value": round(base_fps, 4), "unit": "frames/s",
            "vs_baseline": round(base_fps / ROUND1_BASELINE_FPS, 4),
        })
    if "tsr" in STAGES:
        tsr_s = bench_tsr()
        results.append({
            "metric": "TSR 16->61f @320x512 50-step sample (incl. VAE enc+dec)",
            "value": round(tsr_s, 2), "unit": "s/sample",
            "vs_baseline": round(ROUND1_TSR_S / tsr_s, 4),
        })
    if "vsr" in STAGES:
        vsr_s = bench_vsr()
        results.append({
            "metric": "VSR 8f window 320x512->1280x2048 50-step (incl. decode)",
            "value": round(vsr_s, 2), "unit": "s/window",
            "vs_baseline": round(ROUND1_VSR_WINDOW_S / vsr_s, 4),
        })

    # per-stage lines first, headline LAST (drivers that keep only one line
    # get the headline; drivers that keep all get the full breakdown)
    headline = None
    if base_s is not None and tsr_s is not None and vsr_s is not None:
        opt4 = base_s + tsr_s + 8 * vsr_s
        headline = {
            "metric": "option-4 single-chip total: base + TSR + 8 VSR windows (61f @ 1280x2048, 50 steps)",
            "value": round(opt4, 1), "unit": "s",
            "vs_baseline": round(ROUND1_OPTION4_S / opt4, 4),
        }
    elif results:
        headline = results.pop()

    for r in results:
        print(json.dumps(r))
    if headline is not None:
        print(json.dumps(headline))


if __name__ == "__main__":
    main()
